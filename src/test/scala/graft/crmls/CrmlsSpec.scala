package graft.crmls

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Batch CRMLS pipeline on hand-built envelope fixtures: projection
  * null-defaults, per-entity argmax dedup, and the 11-way join's role
  * aliasing + left-join nulls.
  */
class CrmlsSpec extends SparkTestBase {
  import spark.implicits._

  private def env(pk: String, ts: Long, data: String): String =
    s"""{"data":${jsonStr(data)},"uc_pk":"$pk","uc_update_ts":"u$ts",
        "uc_version":"1","uc_created_ts":"$ts","uc_row_type":"r",
        "uc_type":"t","uc_valid_day":"1","uc_valid_ts":"$ts"}"""
      .replaceAll("\n\\s*", "")

  private def jsonStr(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def raw(rows: Seq[String]): DataFrame = rows.toDF("value")

  // listing L1 has two versions; v2 wins. L2 has no agent/media links.
  private lazy val listingsRaw = raw(Seq(
    env("L1", 100, """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1","BuyerAgentKeyNumeric":"A2","ListOfficeKeyNumeric":"O1"}"""),
    env("L1", 200, """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1","ListOfficeKeyNumeric":"O1"}"""),
    env("L2", 150, """{"ListingKeyNumeric":"LK2"}""")))

  private lazy val agentsRaw = raw(Seq(
    env("A1", 10, """{"name":"agent one v1"}"""),
    env("A1", 20, """{"name":"agent one v2"}"""),
    env("A2", 10, """{"name":"agent two"}""")))

  private lazy val ohRaw = raw(Seq(
    env("OH1", 5, """{"ListingKeyNumeric":"LK1"}""")))

  private lazy val officesRaw = raw(Seq(
    env("O1", 7, """{"name":"office"}""")))

  private lazy val mediaRaw = raw(Seq(
    env("M1", 3, """{"ResourceRecordKeyNumeric":"L1"}""")))

  private lazy val historyRaw = raw(Seq(
    env("H1", 4, """{"ResourceRecordKeyNumeric":"L2"}""")))

  test("projection extracts envelope + nested keys with null defaults") {
    val p = Crmls.project(listingsRaw, Crmls.listings)
    val row = p.filter(col("l_uc_pk") === "L2").head()
    assert(row.getAs[String]("l_listing_key") === "LK2")
    assert(row.getAs[String]("l_list_agent_key") === null) // absent -> null
    assert(row.getAs[Long]("l_uc_created_ts") === 150L)
    assert(row.getAs[String]("l_uc_row_type") === "r")
  }

  test("dedupLatest keeps only the newest version per pk") {
    val d = Crmls.dedupLatest(Crmls.project(listingsRaw, Crmls.listings), Crmls.listings)
    assert(d.count() === 2)
    val l1 = d.filter(col("l_uc_pk") === "L1").head()
    assert(l1.getAs[Long]("l_uc_created_ts") === 200L)
    // v2 dropped BuyerAgentKeyNumeric -> the deduped row must reflect v2
    assert(l1.getAs[String]("l_buyer_agent_key") === null)
  }

  test("11-way join: role aliases resolve independently, unmatched sides null") {
    val joined = Crmls.pipeline(Map(
      "listings" -> listingsRaw, "agents" -> agentsRaw,
      "openhouses" -> ohRaw, "offices" -> officesRaw,
      "media" -> mediaRaw, "history" -> historyRaw))
    assert(joined.count() === 2)

    val l1 = joined.filter(col("l_uc_pk") === "L1").head()
    assert(l1.getAs[String]("aa_uc_pk") === "A1")       // list agent role
    assert(l1.getAs[Long]("aa_uc_created_ts") === 20L)  // latest agent version
    assert(l1.getAs[String]("ab_uc_pk") === null)       // buyer agent dropped in v2
    assert(l1.getAs[String]("oa_uc_pk") === "O1")       // list office role
    assert(l1.getAs[String]("o_listing_key") === "LK1") // open house matched
    assert(l1.getAs[String]("m_resource_record_key") === "L1")
    assert(l1.getAs[String]("h_resource_record_key") === null)

    val l2 = joined.filter(col("l_uc_pk") === "L2").head()
    assert(l2.getAs[String]("aa_uc_pk") === null)
    assert(l2.getAs[String]("h_resource_record_key") === "L2")
  }

  test("malformed data json yields null keys, not a crash") {
    val bad = raw(Seq(env("LX", 1, "not valid json {")))
    val p = Crmls.project(bad, Crmls.listings)
    assert(p.head().getAs[String]("l_listing_key") === null)
  }

  test("projectionSchema equals the analyzed schema of project() for every entity") {
    // state readers pass projectionSchema as an explicit parquet read
    // schema (no inference job per micro-batch) — the two must not drift
    val empty = raw(Nil)
    Crmls.allEntities.foreach { spec =>
      assert(Crmls.project(empty, spec).schema === Crmls.projectionSchema(spec),
        s"schema drift for entity ${spec.name}")
    }
  }

  test("projection parses each row's JSON at most twice — never per key") {
    // one from_json for the envelope + one for the nested data payload;
    // the per-field get_json_object form re-parsed `data` once per
    // extracted key (9x for listings) on every row of the hot streaming
    // J1 leg. Optimizer included: CollapseProject must not inline the
    // data parse back into per-field copies.
    import org.apache.spark.sql.catalyst.expressions.{GetJsonObject, JsonToStructs}
    // a non-foldable, non-local source: a LocalRelation (or a literal)
    // would let ConvertToLocalRelation/ConstantFolding evaluate the
    // projection away and the count would trivially read 0
    val src = spark.range(1)
      .select(org.apache.spark.sql.functions.col("id")
        .cast("string").as("value"))
    Crmls.allEntities.foreach { spec =>
      val optimized = Crmls.project(src, spec)
        .queryExecution.optimizedPlan
      def countExpr(pf: PartialFunction[
          org.apache.spark.sql.catalyst.expressions.Expression, Unit]): Int =
        optimized.collect { case p =>
          p.expressions.map(_.collect(pf).size).sum
        }.sum
      val parses = countExpr { case _: JsonToStructs => () }
      val perField = countExpr { case _: GetJsonObject => () }
      val expected = if (spec.extraKeys.isEmpty) 1 else 2
      assert(parses === expected,
        s"${spec.name}: expected $expected JSON parses, got $parses")
      assert(perField === 0,
        s"${spec.name}: per-field get_json_object crept back in")
    }
  }
}
