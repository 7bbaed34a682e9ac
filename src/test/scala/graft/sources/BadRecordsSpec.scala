package graft.sources

import graft.SparkTestBase
import graft.crmls.Crmls

class BadRecordsSpec extends SparkTestBase {
  import spark.implicits._

  test("malformed and wrong-shape rows are quarantined, valid rows parse") {
    val raw = Seq(
      """{"data":"{}","uc_pk":"P1","uc_update_ts":"u","uc_version":"1","uc_created_ts":"5","uc_row_type":"r","uc_type":"t","uc_valid_day":"1","uc_valid_ts":"5"}""",
      """not json at all {{{""",
      """[1,2,3]""",
      """{"some":"other","shape":"entirely"}"""
    ).toDF("value")
    val (good, bad) = BadRecords.parseWithQuarantine(
      raw, "value", Crmls.envelopeSchema)
    assert(good.count() === 1)
    assert(good.select("parsed.uc_pk").as[String].head() === "P1")
    val badVals = bad.select("value").as[String].collect()
    assert(badVals.length === 3)
    assert(badVals.exists(_.startsWith("not json")),
      "raw text preserved for replay")
  }
}
