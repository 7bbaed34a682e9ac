package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Spark-native stream-stream joins (the built-in complement to the
  * incremental CrmlsStream join): two watermarked streams joined on a
  * key plus an event-time interval, exactly the ad-impression/click
  * attribution shape. The contract under test:
  *  - inner results equal the batch join of the same history
  *    (stream-batch equivalence, the same bar CrmlsStream is held to);
  *  - the time bound + watermark make state finite — Spark evicts
  *    buffered rows once the watermark passes the interval, which is
  *    what lets this run forever at 100 TB/day ingest;
  *  - left-outer emits the null-padded row for an unmatched left rows
  *    only AFTER the watermark proves no match can arrive.
  */
class StreamStreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext =
    spark.sqlContext

  private def impDf(s: MemoryStream[(Long, Long)]): DataFrame =
    s.toDF().toDF("ad_id", "imp_sec")
      .withColumn("imp_ts", timestamp_seconds(col("imp_sec")))
      .withWatermark("imp_ts", "5 seconds")

  private def clickDf(s: MemoryStream[(Long, Long)]): DataFrame =
    s.toDF().toDF("click_ad", "click_sec")
      .withColumn("click_ts", timestamp_seconds(col("click_sec")))
      .withWatermark("click_ts", "5 seconds")

  private val joinCond =
    col("ad_id") === col("click_ad") &&
      col("click_ts") >= col("imp_ts") &&
      col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 SECONDS")

  test("inner stream-stream join equals the batch join of the same history") {
    val imps = MemoryStream[(Long, Long)]
    val clicks = MemoryStream[(Long, Long)]
    val q = impDf(imps).join(clickDf(clicks), joinCond)
      .select("ad_id", "imp_sec", "click_sec")
      .writeStream.format("memory").queryName("ssj_inner")
      .outputMode("append").start()
    try {
      // ad1/ad3 click inside the 10 s window, ad2 clicks too late,
      // ad4 never clicks; split across batches with in-bound disorder
      imps.addData((1L, 10L), (2L, 12L))
      clicks.addData((1L, 15L))
      q.processAllAvailable()
      imps.addData((3L, 50L), (4L, 52L))
      clicks.addData((2L, 30L), (3L, 55L))
      q.processAllAvailable()
      val got = spark.table("ssj_inner")
        .as[(Long, Long, Long)].collect().toSet
      val batch = Seq((1L, 10L), (2L, 12L), (3L, 50L), (4L, 52L))
        .toDF("ad_id", "imp_sec")
        .withColumn("imp_ts", timestamp_seconds(col("imp_sec")))
        .join(Seq((1L, 15L), (2L, 30L), (3L, 55L))
          .toDF("click_ad", "click_sec")
          .withColumn("click_ts", timestamp_seconds(col("click_sec"))),
          joinCond)
        .select("ad_id", "imp_sec", "click_sec")
        .as[(Long, Long, Long)].collect().toSet
      assert(got === batch)
      assert(got === Set((1L, 10L, 15L), (3L, 50L, 55L)))
    } finally q.stop()
  }

  test("left-outer emits the null row only after the watermark closes the window") {
    val imps = MemoryStream[(Long, Long)]
    val clicks = MemoryStream[(Long, Long)]
    val q = impDf(imps).join(clickDf(clicks), joinCond, "left_outer")
      .select(col("ad_id"), col("imp_sec"), col("click_sec"))
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()
    try {
      imps.addData((1L, 10L), (2L, 12L))
      clicks.addData((1L, 15L))
      q.processAllAvailable()
      // nothing proves ad2 unmatched yet: only the matched row is out
      val early = spark.table("ssj_outer")
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(early === Set((1L, 10L, Some(15L))))
      // advance BOTH watermarks far past imp_ts(ad2) + 10 s + delay;
      // the outer result surfaces on a subsequent trigger
      imps.addData((99L, 1000L))
      clicks.addData((99L, 1001L))
      q.processAllAvailable()
      imps.addData((98L, 1002L))
      clicks.addData((98L, 1003L))
      q.processAllAvailable()
      val late = spark.table("ssj_outer")
        .as[(Long, Long, Option[Long])].collect().toSet
      assert(late.contains((2L, 12L, None)),
        s"unmatched impression must emit a null-padded row, got $late")
      assert(late.contains((99L, 1000L, Some(1001L))))
    } finally q.stop()
  }

  test("watermark evicts join state (state rows stay bounded)") {
    val imps = MemoryStream[(Long, Long)]
    val clicks = MemoryStream[(Long, Long)]
    val q = impDf(imps).join(clickDf(clicks), joinCond)
      .select("ad_id", "imp_sec", "click_sec")
      .writeStream.format("memory").queryName("ssj_state")
      .outputMode("append").start()
    try {
      // 50 impressions at t=0..49, no clicks; then jump time forward
      imps.addData((0L until 50L).map(i => (i, i)): _*)
      clicks.addData((12345L, 1L))
      q.processAllAvailable()
      val before = q.lastProgress.stateOperators.head.numRowsTotal
      assert(before >= 50L, s"expected buffered impressions, got $before")
      imps.addData((777L, 5000L))
      clicks.addData((778L, 5001L))
      q.processAllAvailable()
      imps.addData((779L, 5002L))
      clicks.addData((780L, 5003L))
      q.processAllAvailable()
      val after = q.lastProgress.stateOperators.head.numRowsTotal
      assert(after < 10L,
        s"watermark must evict closed-window impressions, got $after")
    } finally q.stop()
  }
}
