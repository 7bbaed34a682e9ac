package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The streaming CRMLS job against the DURABLE parquet upsert sink:
  * state and output both survive a fresh reader, closing the loop on
  * the production shape (parquet state store + parquet sink).
  */
class DurableCrmlsSpec extends SparkTestBase {
  import spark.implicits._

  private def env(pk: String, ts: Long, data: String): String = {
    val d = data.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"data":"$d","uc_pk":"$pk","uc_update_ts":"u$ts","uc_version":"1",""" +
      s""""uc_created_ts":"$ts","uc_row_type":"r","uc_type":"t",""" +
      s""""uc_valid_day":"1","uc_valid_ts":"$ts"}"""
  }

  test("dimension update propagates into the durable parquet sink") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-durable").toString
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out")
    val input = MemoryStream[(String, String)]
    val tagged = input.toDF().toDF("entity", "value")

    input.addData(
      ("listings", env("L1", 100,
        """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1"}""")),
      ("agents", env("A1", 10, """{"n":"v1"}""")))
    CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt").awaitTermination()

    input.addData(("agents", env("A1", 20, """{"n":"v2"}""")))
    CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt").awaitTermination()

    // a completely fresh reader over the sink's bucket dirs (plain
    // parquet files — no sink code involved)
    val persisted = spark.read.parquet(s"$tmp/out/bucket_*")
      .select("l_uc_pk", "aa_uc_created_ts")
      .as[(String, Option[Long])].collect().toMap
    assert(persisted === Map("L1" -> Some(20L)))
  }
}
