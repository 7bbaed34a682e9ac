package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The reference's retract semantics, streamed: a dimension update must
  * re-emit the joined rows of every listing referencing it (reverse
  * lookup), and listing updates supersede prior joined state by pk.
  */
class CrmlsStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def env(pk: String, ts: Long, data: String): String = {
    val d = data.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"data":"$d","uc_pk":"$pk","uc_update_ts":"u$ts","uc_version":"1",""" +
      s""""uc_created_ts":"$ts","uc_row_type":"r","uc_type":"t",""" +
      s""""uc_valid_day":"1","uc_valid_ts":"$ts"}"""
  }

  test("dimension updates propagate to affected joined rows across batches") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-crmls").toString
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = UpsertJoin.newInMemorySink()
    val input = MemoryStream[(String, String)]
    val tagged = input.toDF().toDF("entity", "value")

    // batch 1: listing L1 -> agent A1 v1; listing L2 with no agent
    input.addData(
      ("listings", env("L1", 100,
        """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1"}""")),
      ("listings", env("L2", 100, """{"ListingKeyNumeric":"LK2"}""")),
      ("agents", env("A1", 10, """{"name":"v1"}""")))
    CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt").awaitTermination()

    val snap1 = sink.snapshot(spark)
      .select("l_uc_pk", "aa_uc_pk", "aa_uc_created_ts")
      .as[(String, Option[String], Option[Long])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(snap1("L1") === ((Some("A1"), Some(10L))))
    assert(snap1("L2") === ((None, None)))

    // batch 2: ONLY an agent update -> L1 must be re-emitted with v2
    input.addData(("agents", env("A1", 20, """{"name":"v2"}""")))
    CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt").awaitTermination()

    val snap2 = sink.snapshot(spark)
      .select("l_uc_pk", "aa_uc_created_ts")
      .as[(String, Option[Long])].collect().toMap
    assert(snap2("L1") === Some(20L), "agent update must re-emit L1")

    // batch 3: media attaches to L2; stale agent version must NOT regress L1
    input.addData(
      ("media", env("M1", 5, """{"ResourceRecordKeyNumeric":"L2"}""")),
      ("agents", env("A1", 15, """{"name":"stale"}""")))
    CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt").awaitTermination()

    val snap3 = sink.snapshot(spark)
      .select("l_uc_pk", "aa_uc_created_ts", "m_resource_record_key")
      .as[(String, Option[Long], Option[String])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(snap3("L2")._2 === Some("L2"), "media must attach to L2")
    assert(snap3("L1")._1 === Some(20L), "stale agent version must not regress")
  }
}
