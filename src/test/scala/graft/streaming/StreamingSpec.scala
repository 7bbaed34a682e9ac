package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.streaming.LatestState.Versioned

/** Streaming semantics on the reference's out-of-order fixture pattern
  * (FlinkJoiner.scala:280-297): re-updates per key arriving across
  * batches, including a LATE older version that must not regress the
  * state.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  test("latestByKey emits upserts and absorbs late older versions") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Versioned]
    val q = LatestState.latestByKey(input.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode("update").start()

    // batch 1: two keys
    input.addData(Versioned("k1", 10, "v1.0"), Versioned("k2", 5, "v2.0"))
    q.processAllAvailable()
    // batch 2: newer k1, LATE older k1, duplicate k2
    input.addData(Versioned("k1", 30, "v1.2"), Versioned("k1", 20, "v1.1"),
      Versioned("k2", 5, "v2.0"))
    q.processAllAvailable()
    // batch 3: late-only arrivals -> no emission
    input.addData(Versioned("k1", 25, "stale"))
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("latest_out").as[Versioned].collect()
    // per-batch champions: (k1,10), (k2,5), then (k1,30); batch 3 silent
    assert(emitted.toSet === Set(
      Versioned("k1", 10, "v1.0"), Versioned("k2", 5, "v2.0"),
      Versioned("k1", 30, "v1.2")))
  }

  test("foreachBatch upsert join converges to the latest joined state") {
    implicit val sqlCtx = spark.sqlContext
    val dims = Seq(("u1", "dim one"), ("u2", "dim two")).toDF("k", "dim_name")

    val input = MemoryStream[(String, Long, Double)]
    val fact = input.toDF().toDF("k", "ver", "amount")

    val sink = UpsertJoin.newInMemorySink()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString

    input.addData(("u1", 1L, 10.0), ("u2", 1L, 20.0))
    val q1 = UpsertJoin.run(fact,
      b => b.join(broadcast(dims), Seq("k"), "left_outer"), "k", sink, ckpt)
    q1.awaitTermination()

    input.addData(("u1", 2L, 99.0), ("u3", 1L, 7.0)) // update + new unmatched key
    val q2 = UpsertJoin.run(fact,
      b => b.join(broadcast(dims), Seq("k"), "left_outer"), "k", sink, ckpt)
    q2.awaitTermination()

    val snap = sink.snapshot(spark)
      .select("k", "amount", "dim_name")
      .as[(String, Double, Option[String])].collect().toSet
    assert(snap === Set(
      ("u1", 99.0, Some("dim one")),   // upserted to v2
      ("u2", 20.0, Some("dim two")),
      ("u3", 7.0, None)))              // left-join null preserved
  }
}
