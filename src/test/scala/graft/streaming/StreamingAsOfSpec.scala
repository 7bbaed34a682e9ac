package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.streaming.StreamingAsOf.{AsOfMatch, Tagged}

/** Event-time as-of join under out-of-order arrival: a probe must NOT
  * emit until the watermark passes it, so a build version arriving late
  * (but within the bound) is still matched — the property that
  * distinguishes a temporal join from "latest seen so far".
  */
class StreamingAsOfSpec extends SparkTestBase {
  import spark.implicits._

  private val base = 1700000040000L
  private def ts(sec: Int) = new Timestamp(base + sec * 1000L)

  test("watermark boundary contract: rows at ts == wm are late-dropped, so inclusive ripening is exact") {
    // The inclusive `pts <= wm` ripening rule is only safe because
    // Spark's FlatMapGroupsWithState late filter drops incoming rows
    // with ts <= wm — i.e. after wm reaches a probe's ts, no build at
    // or before that ts can ever arrive. This test pins that boundary:
    // if a future Spark version switched to a strict `<` late filter,
    // the first assertion would see probe2/build@40 survive and fail —
    // the signal to flip the ripening rule to strict.
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Boolean, String)]
    val tagged = input.toDF().toDF("key", "event_ts", "isProbe", "payload")
      .withWatermark("event_ts", "30 seconds")
      .select(col("key"), col("event_ts").as("ts"),
        col("isProbe"), col("payload"))
      .as[Tagged]
    val q = StreamingAsOf.asOfStream(tagged)
      .writeStream.format("memory").queryName("asof_eq")
      .outputMode("append").start()

    input.addData(("k", ts(40), true, "probe@40"), ("k", ts(10), false, "build@10"))
    q.processAllAvailable() // wm -> 10
    input.addData(("z", ts(70), false, "advance"))
    q.processAllAvailable() // wm -> 40
    // both arrive AT the watermark (ts == wm == 40): Spark drops them
    // as late before they reach the operator
    input.addData(("k", ts(40), true, "probe2@40"),
      ("k", ts(40), false, "build@40"))
    q.processAllAvailable()
    // advance past 40 so the buffered probe@40 ripens via timeout
    input.addData(("z", ts(100), false, "advance2"))
    q.processAllAvailable()
    input.addData(("z", ts(101), false, "noop"))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("asof_eq").as[AsOfMatch].collect()
      .filter(_.key == "k").map(m => m.probePayload -> m.buildPayload).toMap
    // probe@40 (buffered while on time) matches the only surviving
    // build; the equal-ts latecomers left no trace
    assert(got === Map("probe@40" -> Some("build@10")))
  }

  test("probe waits for watermark; late build within bound is matched") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Boolean, String)]
    val tagged = input.toDF().toDF("key", "event_ts", "isProbe", "payload")
      .withWatermark("event_ts", "30 seconds")
      .select(col("key"), col("event_ts").as("ts"),
        col("isProbe"), col("payload"))
      .as[Tagged]
    val q = StreamingAsOf.asOfStream(tagged)
      .writeStream.format("memory").queryName("asof_out")
      .outputMode("append").start()

    // batch 1: probe @40s and build @10s arrive; watermark still 0 ->
    // nothing emits yet
    input.addData(
      ("k", ts(40), true, "probe@40"),
      ("k", ts(10), false, "build@10"))
    q.processAllAvailable()
    assert(spark.table("asof_out").isEmpty,
      "probe must not emit before the watermark passes it")

    // batch 2: the LATE build @35s (still within the 30s bound) plus an
    // event-time advancer @90s -> watermark reaches 60s, probe ripens
    // and must match build@35, not build@10
    input.addData(
      ("k", ts(35), false, "build@35"),
      ("k", ts(90), false, "advance"))
    q.processAllAvailable()
    // one more batch so the new watermark (60s) is applied to the group
    input.addData(("z", ts(95), false, "noop"))
    q.processAllAvailable()

    val out1 = spark.table("asof_out").as[AsOfMatch].collect()
    assert(out1.length === 1)
    assert(out1.head.buildPayload === Some("build@35"),
      s"late-but-in-bound build must win, got ${out1.head}")

    // batch 3: probe with no prior build -> null match after ripening
    input.addData(("m", ts(100), true, "probe-nobuild"))
    q.processAllAvailable()
    input.addData(("k", ts(160), false, "advance2"))
    q.processAllAvailable()
    input.addData(("z", ts(165), false, "noop2"))
    q.processAllAvailable()
    q.stop()

    val out2 = spark.table("asof_out").as[AsOfMatch].collect()
      .filter(_.key == "m")
    assert(out2.length === 1)
    assert(out2.head.buildPayload === None)
  }
}
