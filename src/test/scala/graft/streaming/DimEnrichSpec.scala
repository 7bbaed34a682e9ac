package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.crmls.Crmls

/** Pins [[DimEnrich.enrich]] row-identical (schema names/types/order
  * AND content) to [[Crmls.joinAll]] — the drift guard that lets the
  * streaming path substitute map lookups for the 11-way broadcast
  * join. Covers: hit/miss per role, null and empty-string join keys,
  * dims with no rows, and shared dim rows probed by several roles.
  */
class DimEnrichSpec extends SparkTestBase {
  import spark.implicits._

  private def env(pk: String, ts: Long, data: String): String = {
    val d = data.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"data":"$d","uc_pk":"$pk","uc_update_ts":"u$ts","uc_version":"1",""" +
      s""""uc_created_ts":"$ts","uc_row_type":"r","uc_type":"t",""" +
      s""""uc_valid_day":"1","uc_valid_ts":"$ts"}"""
  }

  private def proj(spec: Crmls.EntitySpec, rows: Seq[String]): DataFrame =
    Crmls.project(rows.toDF("value"), spec)

  // listings exercising: all roles hit (L1), partial hits + self-key
  // media/history (L2), all misses (L3), null extra keys (L4 — data
  // payload missing every key field), empty-string key matching an
  // empty-string dim pk (dims never produce "" uc_pk here, so "" keys
  // miss — same in both forms)
  private val listingRows = Seq(
    env("L1", 100, """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1","BuyerAgentKeyNumeric":"A2","CoListAgentKeyNumeric":"A1","CoBuyerAgentKeyNumeric":"A3","ListOfficeKeyNumeric":"O1","BuyerOfficeKeyNumeric":"O2","CoListOfficeKeyNumeric":"O1","CoBuyerOfficeKeyNumeric":"O9"}"""),
    env("L2", 90, """{"ListingKeyNumeric":"LK2","ListAgentKeyNumeric":"A2"}"""),
    env("L3", 80, """{"ListingKeyNumeric":"LKX","ListAgentKeyNumeric":"AX","ListOfficeKeyNumeric":"OX"}"""),
    env("L4", 70, """{}"""))

  private val agentRows = Seq(
    env("A1", 10, """{"n":"a1"}"""), env("A2", 11, """{"n":"a2"}"""),
    env("A3", 12, """{"n":"a3"}"""))
  private val officeRows = Seq(
    env("O1", 7, """{"n":"o1"}"""), env("O2", 8, """{"n":"o2"}"""))
  private val ohRows = Seq(
    env("OH1", 5, """{"ListingKeyNumeric":"LK1"}"""),
    env("OH2", 6, """{"ListingKeyNumeric":"LK2"}"""))
  private val mediaRows = Seq(env("M1", 3, """{"ResourceRecordKeyNumeric":"L1"}"""))
  private val historyRows = Seq(env("H1", 4, """{"ResourceRecordKeyNumeric":"L2"}"""))

  private def lookupOf(spec: Crmls.EntitySpec, df: DataFrame) =
    spark.sparkContext.broadcast(DimEnrich.buildLookup(
      df.collect().iterator, Crmls.projectionSchema(spec), spec.dedupKeyCol))

  test("enrich is row-identical to joinAll (schema and content)") {
    val l = proj(Crmls.listings, listingRows)
    val a = proj(Crmls.agents, agentRows)
    val o = proj(Crmls.openHouses, ohRows)
    val ofc = proj(Crmls.offices, officeRows)
    val m = proj(Crmls.media, mediaRows)
    val h = proj(Crmls.history, historyRows)

    val joined = Crmls.joinAll(l, a, o, ofc, m, h)
    val maps = Map(
      "agents" -> lookupOf(Crmls.agents, a),
      "openhouses" -> lookupOf(Crmls.openHouses, o),
      "offices" -> lookupOf(Crmls.offices, ofc),
      "media" -> lookupOf(Crmls.media, m),
      "history" -> lookupOf(Crmls.history, h))
    val enriched = DimEnrich.enrich(l, maps)

    // identical column names, order, and types
    assert(enriched.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      joined.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    // identical rows (multiset)
    val je = joined.collect().map(_.toSeq).sortBy(_.toString)
    val ee = enriched.collect().map(_.toSeq).sortBy(_.toString)
    assert(ee === je)
    assert(ee.length === 4)
  }

  test("empty dims behave as left join against nothing") {
    val l = proj(Crmls.listings, listingRows)
    def empty(spec: Crmls.EntitySpec) = proj(spec, Nil)
    val joined = Crmls.joinAll(l, empty(Crmls.agents), empty(Crmls.openHouses),
      empty(Crmls.offices), empty(Crmls.media), empty(Crmls.history))
    val emptyBc = spark.sparkContext.broadcast(Map.empty[String, Array[Any]])
    val maps = DimEnrich.dimEntities.map(_.name -> emptyBc).toMap
    val enriched = DimEnrich.enrich(l, maps)
    assert(enriched.collect().map(_.toSeq).sortBy(_.toString) ===
      joined.collect().map(_.toSeq).sortBy(_.toString))
  }

  test("enrichPartial equals the same columns of the full enrich") {
    val l = proj(Crmls.listings, listingRows)
    val a = proj(Crmls.agents, agentRows)
    val o = proj(Crmls.openHouses, ohRows)
    val ofc = proj(Crmls.offices, officeRows)
    val m = proj(Crmls.media, mediaRows)
    val h = proj(Crmls.history, historyRows)
    val maps = Map(
      "agents" -> lookupOf(Crmls.agents, a),
      "openhouses" -> lookupOf(Crmls.openHouses, o),
      "offices" -> lookupOf(Crmls.offices, ofc),
      "media" -> lookupOf(Crmls.media, m),
      "history" -> lookupOf(Crmls.history, h))
    val full = DimEnrich.enrich(l, maps)
    // every nonempty dim subset must match the full join's columns —
    // covering multi-role dims (agents x4), the self-keyed media/
    // history pair, and mixed subsets
    for (sub <- Seq(Set("agents"), Set("media"), Set("history"),
        Set("openhouses", "offices"), Set("agents", "media"),
        DimEnrich.dimEntities.map(_.name).toSet)) {
      val cols = "l_uc_pk" +: DimEnrich.roleColumns(sub)
      val part = DimEnrich.enrichPartial(l, maps, sub, "l_uc_pk")
      assert(part.schema.fieldNames.toSeq === cols, s"schema for $sub")
      assert(part.collect().map(_.toSeq).sortBy(_.toString) ===
        full.select(cols.map(col): _*).collect().map(_.toSeq)
          .sortBy(_.toString), s"content for $sub")
    }
  }

  test("joinedSchema matches the analyzed joinAll schema") {
    val l = proj(Crmls.listings, Nil)
    val joined = Crmls.joinAll(l, proj(Crmls.agents, Nil),
      proj(Crmls.openHouses, Nil), proj(Crmls.offices, Nil),
      proj(Crmls.media, Nil), proj(Crmls.history, Nil))
    assert(DimEnrich.joinedSchema(l.schema).fields
      .map(f => (f.name, f.dataType)).toSeq ===
      joined.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
