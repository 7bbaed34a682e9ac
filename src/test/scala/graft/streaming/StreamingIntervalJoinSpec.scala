package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.RangeJoin

/** Stream-stream interval join: correctness of the time-bound matches,
  * boundary inclusivity, and agreement with the batch RangeJoin over
  * the same history (stream/batch duality, SURVEY §7.1).
  */
class StreamingIntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("streamed pairs equal the batch interval join over the same history") {
    implicit val sqlCtx = spark.sqlContext
    val probeIn = MemoryStream[(Long, Long, Timestamp)]
    val buildIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingIntervalJoin.joinWithin(
      probeIn.toDF().toDF("id", "k", "t"),
      buildIn.toDF().toDF("id", "k", "t"),
      key = "k", probeTs = "t", buildTs = "t", lookbackSec = 30)
    val q = joined.select(col("id"), col("b_id"))
      .writeStream.format("memory").queryName("ssij_out")
      .outputMode("append").start()

    // probe 1@60s window [30,60]; probe 2@100s window [70,100]; key 9 isolated
    val probes = Seq((1L, 7L, ts(60)), (2L, 7L, ts(100)), (3L, 9L, ts(60)))
    val builds = Seq(
      (11L, 7L, ts(30)),  // on the lower boundary of probe 1 — included
      (12L, 7L, ts(29)),  // just outside — excluded
      (13L, 7L, ts(60)),  // upper boundary of probe 1 — included
      (14L, 7L, ts(95)),  // inside probe 2 only
      (15L, 9L, ts(45)))  // other key, inside probe 3's window
    probeIn.addData(probes: _*)
    buildIn.addData(builds: _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ssij_out")
      .as[(Long, Long)].collect().toSet
    val expected = Set((1L, 11L), (1L, 13L), (2L, 14L), (3L, 15L))
    assert(streamed === expected)

    // batch RangeJoin over the identical history produces the same pairs
    val batch = RangeJoin.intervalJoin(
        probes.toDF("id", "k", "t"), builds.toDF("id", "k", "t"),
        key = "k", probeTs = "t", buildTs = "t", lookbackMs = 30000)
      .select("id", "b_id").as[(Long, Long)].collect().toSet
    assert(batch === expected)
  }

  test("the plan is a streaming symmetric hash join with state eviction bounds") {
    implicit val sqlCtx = spark.sqlContext
    val probeIn = MemoryStream[(Long, Long, Timestamp)]
    val buildIn = MemoryStream[(Long, Long, Timestamp)]
    val joined = StreamingIntervalJoin.joinWithin(
      probeIn.toDF().toDF("id", "k", "t"),
      buildIn.toDF().toDF("id", "k", "t"),
      key = "k", probeTs = "t", buildTs = "t", lookbackSec = 30)
    val q = joined.writeStream.format("memory").queryName("ssij_plan")
      .outputMode("append").start()
    probeIn.addData((1L, 1L, ts(0)))
    buildIn.addData((2L, 1L, ts(0)))
    q.processAllAvailable()
    val baos = new java.io.ByteArrayOutputStream()
    Console.withOut(baos)(q.explain())
    q.stop()
    val planStr = baos.toString
    assert(planStr.contains("StreamingSymmetricHashJoin"),
      s"expected a symmetric hash join plan:\n$planStr")
  }
}
