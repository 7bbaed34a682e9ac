package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The Spark-side plumbing under test: schemas, batch shape,
  * determinism, partition spread. The codec itself is a declared stub.
  */
class MultimodalSpec extends SparkTestBase {

  private def mkMedia(n: Int) = {
    val rows = (1 to n).map { i =>
      Row(i.toLong, if (i % 3 == 0) "video" else "image", "application/octet-stream",
        s"media-bytes-$i".getBytes("UTF-8"),
        Row(640, 480, null, if (i % 3 == 0) 3500L else null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("extractImageFeatures appends a deterministic float vector") {
    val df = mkMedia(10)
    val a = Multimodal.extractImageFeatures(df, dims = 8)
    assert(a.schema.fieldNames.last === "features")
    val feats = a.select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).length === 8)
    // deterministic: same input -> same features
    val b = Multimodal.extractImageFeatures(df, dims = 8)
      .select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats === b)
    // content-sensitive: different media differ
    assert(feats(1L) !== feats(2L))
  }

  test("batch shape: small batchSize still processes every row once") {
    val got = Multimodal.extractImageFeatures(mkMedia(257), dims = 4, batchSize = 16)
    assert(got.count() === 257)
    assert(got.select("media_id").distinct().count() === 257)
  }

  test("resizeImages replaces content and stamps meta dimensions") {
    val got = Multimodal.resizeImages(mkMedia(5), 32, 32)
    val r = got.filter(col("media_id") === 1).head()
    val meta = r.getAs[Row]("meta")
    assert(meta.getInt(0) === 32 && meta.getInt(1) === 32)
    assert(r.getAs[Array[Byte]]("content").length === 32 * 32 / 64)
    assert(got.schema === Multimodal.mediaSchema) // schema preserved
  }

  test("sampleVideoFrames explodes one row per sampled frame") {
    val got = Multimodal.sampleVideoFrames(mkMedia(9), everyMs = 1000)
    // only videos (ids 3,6,9) have duration 3500ms -> 4 frames each
    assert(got.count() === 3 * 4)
    val frames = got.filter(col("media_id") === 3)
      .select("frame_ts_ms").collect().map(_.getLong(0)).sorted
    assert(frames === Array(0L, 1000L, 2000L, 3000L))
  }

  test("extractAudioFeatures is deterministic and batch-complete") {
    val a = Multimodal.extractAudioFeatures(mkMedia(20), dims = 8, batchSize = 4)
    assert(a.count() === 20)
    val f1 = a.filter(col("media_id") === 1).select("audio_features")
      .head().getSeq[Float](0)
    assert(f1.length === 8)
    val f1b = Multimodal.extractAudioFeatures(mkMedia(20), dims = 8)
      .filter(col("media_id") === 1).select("audio_features")
      .head().getSeq[Float](0)
    assert(f1 === f1b)
  }

  test("repartitionForDecode spreads rows across partitions") {
    val parts = Multimodal.repartitionForDecode(mkMedia(100), 8)
      .rdd.glom().map(_.length).collect()
    assert(parts.length === 8)
    assert(parts.max <= 40, s"skewed decode partitions: ${parts.toSeq}")
  }
}
