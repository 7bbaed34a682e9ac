package graft.streaming

import graft.SparkTestBase

class ParquetUpsertSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("parquet upsert sink merges by key, batch wins, survives reread") {
    val dir = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"
    val sink = new UpsertJoin.ParquetUpsertSink(spark, dir)

    sink.upsert("k", Seq(("a", 1), ("b", 1)).toDF("k", "v"))
    sink.upsert("k", Seq(("a", 2), ("c", 1)).toDF("k", "v"))

    val got = sink.snapshot(spark).as[(String, Int)].collect().toSet
    assert(got === Set(("a", 2), ("b", 1), ("c", 1)))

    // a fresh sink over the same dir sees durable state
    val again = new UpsertJoin.ParquetUpsertSink(spark, dir)
    again.upsert("k", Seq(("b", 9)).toDF("k", "v"))
    assert(again.snapshot(spark).as[(String, Int)].collect().toSet ===
      Set(("a", 2), ("b", 9), ("c", 1)))
  }
}
