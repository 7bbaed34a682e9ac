package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.EventAnalytics

/** The streaming funnel state machine must (1) replicate the batch
  * funnel's strict-ordered semantics across micro-batches when events
  * arrive in event-time order, (2) emit each advancement exactly once,
  * and (3) keep state at two fields per user regardless of volume.
  */
class StreamingFunnelSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val stages = Seq("view", "click", "purchase")

  private def runStream(batches: Seq[Seq[(Long, Timestamp, String)]],
                        name: String): Seq[(Long, Int, String, Timestamp)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sfn").toString
    val q = StreamingFunnel.funnelStream(
        input.toDF().toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select("user", "stage", "stage_name", "reach_ts")
      .as[(Long, Int, String, Timestamp)].collect().toSeq
  }

  // the EventAnalyticsSpec scenario, split across two micro-batches
  private val evRows = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (2L, ts("2024-01-02 09:00:00"), "purchase"), // early purchase: no count
    (2L, ts("2024-01-02 09:30:00"), "view"),
    (1L, ts("2024-01-02 10:10:00"), "purchase"),
    (2L, ts("2024-01-02 19:45:00"), "click"),
    (3L, ts("2024-01-03 08:00:00"), "view"),
    (4L, ts("2024-01-04 07:00:00"), "click") // no view: never enters
  ).sortBy(_._2.getTime)

  test("stream == batch funnel counts on the same ts-ordered event log") {
    val (b1, b2) = evRows.splitAt(4)
    val got = runStream(Seq(b1, b2), "sfn_eq")
    // batch reference
    val batchCounts = EventAnalytics
      .funnel(evRows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages)
      .select("stage", "n_users").as[(Long, Long)].collect().toMap
    val streamCounts = got.groupBy(_._2).view
      .mapValues(_.map(_._1).distinct.size.toLong).toMap
    assert(batchCounts === Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
    assert(streamCounts === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
    // reach times are the batch min-after-reach times
    assert(got.toSet.contains((1L, 3, "purchase", ts("2024-01-02 10:10:00"))))
    assert(got.toSet.contains((2L, 2, "click", ts("2024-01-02 19:45:00"))))
    assert(!got.exists { case (u, st, _, _) => u == 2L && st == 3 },
      "user 2's pre-view purchase must not convert")
  }

  test("each advancement emitted exactly once, across batch boundaries") {
    val perBatch = evRows.map(Seq(_)) // one event per micro-batch
    val got = runStream(perBatch, "sfn_once")
    val byUserStage = got.groupBy(r => (r._1, r._2))
    byUserStage.foreach { case (k, rs) =>
      assert(rs.size === 1, s"duplicate advancement for $k: $rs") }
    assert(got.map(r => (r._1, r._2)).toSet ===
      Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2), (3L, 1)))
  }

  test("within-batch disorder is sorted; ties fail the strict >") {
    val batch = Seq(
      (9L, ts("2024-01-01 10:05:00"), "click"),  // arrives first, later ts
      (9L, ts("2024-01-01 10:00:00"), "view"),
      (9L, ts("2024-01-01 10:05:00"), "purchase") // ties click's ts: no
    )
    val got = runStream(Seq(batch), "sfn_sort")
    assert(got.map(r => (r._2, r._3)).sorted ===
      Seq((1, "view"), (2, "click")),
      "click must convert despite arrival order; tied purchase must not")
  }

  test("static-frame parity: the same Dataset API runs in batch mode") {
    val got = StreamingFunnel.funnelStream(
        evRows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", stages)
      .collect().map(a => (a.user, a.stage)).toSet
    assert(got === Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2), (3L, 1)))
  }
}
