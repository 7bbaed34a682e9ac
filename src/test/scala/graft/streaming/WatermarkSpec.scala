package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.Streams

/** T2/T3 streaming semantics: tumbling-window aggregation under the
  * reference's bounded-out-of-orderness watermark (100 s,
  * FlinkJoiner.scala:342-349). In append mode a window only emits once
  * the watermark passes its end; data later than the bound is dropped.
  */
class WatermarkSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1700000040000L + sec * 1000L)

  test("tumbling agg emits closed windows; too-late rows are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val agg = Streams.withLateness(
        input.toDF().toDF("ts", "value"), "ts", "100 seconds")
      .groupBy(window(col("ts"), "60 seconds"))
      .agg(count(lit(1)).as("n"), sum("value").as("v"))
      .select(col("window.start").as("w"), col("n"), col("v"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()

    // window [0,60) gets 2 rows; then advance event time far enough
    // that the watermark (max_ts - 100s) passes 60 -> window emits
    input.addData((ts(10), 1.0), (ts(20), 2.0))
    q.processAllAvailable()
    input.addData((ts(170), 5.0)) // watermark -> 70s, closes [0,60)
    q.processAllAvailable()
    // this row is 100s+ older than the watermark: dropped, not merged
    input.addData((ts(30), 100.0))
    q.processAllAvailable()
    input.addData((ts(400), 7.0)) // closes [120,180)
    q.processAllAvailable()
    q.stop()

    val out = spark.table("wm_out")
      .as[(Timestamp, Long, Double)].collect()
      .map { case (w, n, v) => (w.getTime - 1700000040000L) / 1000 -> ((n, v)) }
      .toMap
    assert(out(0L) === ((2L, 3.0)), "late row must NOT appear in closed window")
    assert(out(120L) === ((1L, 5.0)))
  }

  test("session window (streaming): gap splits sessions, watermark closes them") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp, Double)]
    val agg = Streams.withLateness(
        input.toDF().toDF("user", "ts", "value"), "ts", "10 seconds")
      .groupBy(session_window(col("ts"), "30 seconds"), col("user"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("s"), col("user"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    // u1: events at 0s,20s (one session), then 100s (new session: gap > 30s)
    input.addData(("u1", ts(0), 1.0), ("u1", ts(20), 1.0), ("u1", ts(100), 1.0))
    q.processAllAvailable()
    input.addData(("u2", ts(300), 1.0)) // advance watermark, close sessions
    q.processAllAvailable()
    input.addData(("u2", ts(500), 1.0))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sess_out")
      .as[(Timestamp, String, Long)].collect()
      .filter(_._2 == "u1")
      .map { case (s, _, n) => (s.getTime - 1700000040000L) / 1000 -> n }
      .toMap
    assert(out === Map(0L -> 2L, 100L -> 1L),
      s"u1 must have two sessions (0s x2 events, 100s x1), got $out")
  }
}
