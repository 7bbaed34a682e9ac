package graft.crmls

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.LatestVersion

/** The reference's CRMLS data model on Spark: six change-capture entity
  * streams sharing a common envelope, each reduced to its latest version
  * per key, then left-joined 11 ways around listings.
  *
  * Envelope (reference CRMLSJoiner.scala:97-106): `data` (nested JSON
  * string), `uc_pk`, `uc_update_ts`, `uc_version`, `uc_created_ts`
  * (long), `uc_row_type`, `uc_type`, `uc_valid_day` (long),
  * `uc_valid_ts` (long). Entity-specific join keys are extracted from
  * the nested `data` JSON (null when absent — reference
  * CRMLSJoiner.scala:122-130); envelope strings default to "" (reference
  * CRMLSJoiner.scala:136-142); the three *_ts/_day fields are
  * string-to-long casts (reference CRMLSJoiner.scala:132-134).
  *
  * Where the reference hand-writes six `ObjectNode => Row` mappers, we
  * declare one [[EntitySpec]] per entity and derive the projection as
  * pure column expressions (`from_json` + `get_json_object` + casts) —
  * fully codegen'd, no UDFs, and the parquet/Kafka scan only reads the
  * `value` column.
  */
object Crmls {

  /** One source entity: column prefix, join keys pulled from `data`,
    * and the dedup key (already prefixed).
    */
  final case class EntitySpec(
      name: String,
      prefix: String,
      extraKeys: Seq[(String, String)], // (json field in data, column name)
      dedupKeyCol: String)

  val listings: EntitySpec = EntitySpec("listings", "l_", Seq(
    "ListingKeyNumeric" -> "listing_key",
    "ListAgentKeyNumeric" -> "list_agent_key",
    "BuyerAgentKeyNumeric" -> "buyer_agent_key",
    "CoListAgentKeyNumeric" -> "co_list_agent_key",
    "CoBuyerAgentKeyNumeric" -> "co_buyer_agent_key",
    "ListOfficeKeyNumeric" -> "list_office_key",
    "BuyerOfficeKeyNumeric" -> "buyer_office_key",
    "CoListOfficeKeyNumeric" -> "co_list_office_key",
    "CoBuyerOfficeKeyNumeric" -> "co_buyer_office_key"),
    dedupKeyCol = "l_uc_pk")

  val agents: EntitySpec =
    EntitySpec("agents", "a_", Nil, dedupKeyCol = "a_uc_pk")

  val openHouses: EntitySpec = EntitySpec("openhouses", "o_",
    Seq("ListingKeyNumeric" -> "listing_key"), dedupKeyCol = "o_listing_key")

  val offices: EntitySpec =
    EntitySpec("offices", "ofc_", Nil, dedupKeyCol = "ofc_uc_pk")

  val media: EntitySpec = EntitySpec("media", "m_",
    Seq("ResourceRecordKeyNumeric" -> "resource_record_key"),
    dedupKeyCol = "m_resource_record_key")

  val history: EntitySpec = EntitySpec("history", "h_",
    Seq("ResourceRecordKeyNumeric" -> "resource_record_key"),
    dedupKeyCol = "h_resource_record_key")

  val allEntities: Seq[EntitySpec] =
    Seq(listings, agents, openHouses, offices, media, history)

  /** Envelope fields as they arrive (everything string-typed; casts
    * happen in the projection, mirroring the reference's
    * schema-on-read stance).
    */
  val envelopeSchema: StructType = StructType(Seq(
    "data", "uc_pk", "uc_update_ts", "uc_version", "uc_created_ts",
    "uc_row_type", "uc_type", "uc_valid_day", "uc_valid_ts")
    .map(StructField(_, StringType, nullable = true)))

  private val envelopeStringCols =
    Seq("uc_pk", "uc_update_ts", "uc_version", "uc_row_type", "uc_type")
  private val envelopeLongCols =
    Seq("uc_created_ts", "uc_valid_day", "uc_valid_ts")

  /** The exact output schema of [[project]] for an entity, statically.
    * Lets state readers pass an explicit schema (no parquet footer
    * inference job per micro-batch) — CrmlsSpec pins it equal to
    * `project(...).schema` so the two can never drift.
    */
  def projectionSchema(spec: EntitySpec): StructType = StructType(
    // the coalesce-to-"" string columns analyze as non-nullable; the
    // long casts and get_json_object extras stay nullable
    StructField(spec.prefix + "data", StringType, nullable = false) +:
      (envelopeStringCols.map(c =>
        StructField(spec.prefix + c, StringType, nullable = false)) ++
        envelopeLongCols.map(c => StructField(spec.prefix + c, LongType)) ++
        spec.extraKeys.map { case (_, name) =>
          StructField(spec.prefix + name, StringType) }))

  /** One synthetic CRMLS envelope as a codegen'd JSON column — the
    * inverse of [[project]] for harnesses/benches that need to PRODUCE
    * envelopes (nested `to_json`: the inner call renders the `data`
    * payload, the outer escapes it into the envelope; fields in
    * [[envelopeSchema]] order, no whitespace). The single builder every
    * producer-side tool shares, so the wire shape cannot fork.
    */
  def envelopeCol(pk: Column, ts: Column, data: Column): Column =
    to_json(struct(
      data.as("data"),
      pk.as("uc_pk"),
      concat(lit("u"), ts.cast("string")).as("uc_update_ts"),
      lit("1").as("uc_version"),
      ts.cast("string").as("uc_created_ts"),
      lit("r").as("uc_row_type"),
      lit("t").as("uc_type"),
      lit("1").as("uc_valid_day"),
      ts.cast("string").as("uc_valid_ts")))

  /** Project a raw frame with a JSON `value` column (Kafka value /
    * file line) into the entity's typed, prefixed columns. Works
    * identically on batch and streaming frames.
    */
  def project(raw: DataFrame, spec: EntitySpec,
              valueCol: String = "value"): DataFrame = {
    val env = from_json(col(valueCol), envelopeSchema).as("__env")
    val p = spec.prefix
    val dataCol = coalesce(col("__env.data"), lit("")).as(p + "data")
    val strings = envelopeStringCols.map(c =>
      coalesce(col(s"__env.$c"), lit("")).as(p + c))
    val longs = envelopeLongCols.map(c =>
      col(s"__env.$c").cast(LongType).as(p + c))
    if (spec.extraKeys.isEmpty)
      raw.select(env).select(dataCol +: (strings ++ longs): _*)
    else {
      // ONE parse of the nested `data` payload for every extracted key
      // (held in its own Project so CollapseProject cannot duplicate the
      // JsonToStructs per field — the per-field get_json_object form
      // re-parsed `data` once per key, N parses per row for listings).
      // from_json with a StringType field yields the field's raw JSON
      // text exactly like get_json_object's path extraction: unquoted
      // strings, literal numerals, null when absent or malformed.
      val dataSchema = StructType(spec.extraKeys.map { case (field, _) =>
        StructField(field, StringType) })
      // the re-select aliases __env (never a bare attribute: a bare
      // AttributeReference binds to an unnamed BoundReference, which
      // ColumnBridge.rowProjector's NamedExpression projection rejects)
      val parsed = raw.select(env)
        .select(col("__env").as("__env"),
          from_json(col("__env.data"), dataSchema).as("__d"))
      val extras = spec.extraKeys.map { case (field, name) =>
        col(s"__d.$field").as(p + name) }
      parsed.select(dataCol +: (strings ++ longs ++ extras): _*)
    }
  }

  /** Latest-version view of a projected entity (the reference's
    * `(pk, ts) IN (SELECT pk, MAX(ts) ...)` dedup — tie-keeping
    * semantics, single shuffle; reference CRMLSJoiner.scala:182 etc.).
    */
  def dedupLatest(projected: DataFrame, spec: EntitySpec): DataFrame =
    LatestVersion.latestAll(projected, spec.dedupKeyCol,
      spec.prefix + "uc_created_ts")

  /** Re-prefix an entity frame for a join role (the reference joins
    * agents 4x and offices 4x under SQL aliases `aa..ad` / `oa..od`;
    * Spark needs distinct column names instead — reference
    * CRMLSJoiner.scala:475-483).
    */
  def rePrefix(df: DataFrame, from: String, to: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(
      if (c.startsWith(from)) to + c.stripPrefix(from) else c)): _*)

  /** The production query: 11-way LEFT OUTER join of deduped listings
    * against agents x4 roles, open-houses, offices x4 roles, media and
    * history (reference CRMLSJoiner.scala:471-487).
    *
    * Dimension sides are marked broadcast: each deduped dim is a
    * latest-state table, orders of magnitude smaller than the listing
    * fact history, and one broadcast per PHYSICAL table is reused
    * across its four role joins. At cluster scale, if a dim outgrows
    * the broadcast threshold, drop the hint and Catalyst/AQE falls
    * back to shuffled joins — the query shape is unchanged.
    */
  def joinAll(listingsTs: DataFrame, agentsTs: DataFrame,
              openHousesTs: DataFrame, officesTs: DataFrame,
              mediaTs: DataFrame, historyTs: DataFrame,
              hintBroadcast: Boolean = true): DataFrame = {
    def b(df: DataFrame) = if (hintBroadcast) broadcast(df) else df
    val agentRoles = Seq(
      ("aa_", "l_list_agent_key"), ("ab_", "l_buyer_agent_key"),
      ("ac_", "l_co_list_agent_key"), ("ad_", "l_co_buyer_agent_key"))
    val officeRoles = Seq(
      ("oa_", "l_list_office_key"), ("ob_", "l_buyer_office_key"),
      ("oc_", "l_co_list_office_key"), ("od_", "l_co_buyer_office_key"))
    val withAgents = agentRoles.foldLeft(listingsTs) { case (acc, (role, key)) =>
      acc.join(b(rePrefix(agentsTs, "a_", role)),
        col(key) === col(role + "uc_pk"), "left_outer")
    }
    val withOh = withAgents.join(b(openHousesTs),
      col("l_listing_key") === col("o_listing_key"), "left_outer")
    val withOffices = officeRoles.foldLeft(withOh) { case (acc, (role, key)) =>
      acc.join(b(rePrefix(officesTs, "ofc_", role)),
        col(key) === col(role + "uc_pk"), "left_outer")
    }
    withOffices
      .join(b(mediaTs), col("l_uc_pk") === col("m_resource_record_key"), "left_outer")
      .join(b(historyTs), col("l_uc_pk") === col("h_resource_record_key"), "left_outer")
  }

  /** Full batch pipeline: raw JSON frames in, joined latest-state table
    * out (projection -> dedup -> 11-way join).
    */
  def pipeline(raw: Map[String, DataFrame]): DataFrame = {
    def view(spec: EntitySpec) =
      dedupLatest(project(raw(spec.name), spec), spec)
    joinAll(view(listings), view(agents), view(openHouses),
      view(offices), view(media), view(history))
  }
}
