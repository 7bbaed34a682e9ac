package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The Spark-side plumbing under test: schemas, batch shape,
  * determinism, partition spread — plus the REAL JDK decode tier
  * (javax.imageio / javax.sound.sampled) over genuine PNG and WAV
  * bytes, with the stub fallback pinned for undecodable blobs.
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

  /** A real PNG: left half black, right half white. */
  private def halfPng(w: Int = 16, h: Int = 16): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A real 16-bit mono WAV: silence then a loud square wave. */
  private def halfWav(n: Int = 8000): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](n * 2)
    for (i <- n / 2 until n) {
      val s: Short = if (i % 2 == 0) 16384 else -16384
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("JdkCodec really decodes a PNG: grid luminance reflects pixels") {
    val f = Multimodal.JdkCodec.imageFeatures(halfPng(), dims = 4)
    // 2x2 grid over a left-black/right-white image: the left cells are
    // ~0 luminance, the right cells ~1 — stub hash features could never
    // satisfy this structurally
    assert(f.length === 4)
    assert(f(0) < 0.05f && f(2) < 0.05f, s"left cells must be dark: ${f.toSeq}")
    assert(f(1) > 0.95f && f(3) > 0.95f, s"right cells must be light: ${f.toSeq}")
  }

  test("JdkCodec resize yields a real PNG of the target dimensions") {
    val out = Multimodal.JdkCodec.resize(halfPng(16, 16), 4, 4)
    val round = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out))
    assert(round != null, "resized output must itself be decodable")
    assert(round.getWidth === 4 && round.getHeight === 4)
    // pixel content survives the rescale: left dark, right light
    assert((round.getRGB(0, 0) & 0xff) < 64)
    assert((round.getRGB(3, 0) & 0xff) > 192)
  }

  test("JdkCodec really decodes a WAV: RMS energy localizes the tone") {
    val f = Multimodal.JdkCodec.audioFeatures(halfWav(), dims = 4)
    assert(f.length === 4)
    assert(f(0) < 0.01f && f(1) < 0.01f, s"first half must be silent: ${f.toSeq}")
    assert(f(2) > 0.4f && f(3) > 0.4f, s"second half must carry energy: ${f.toSeq}")
  }

  test("undecodable bytes fall back to the deterministic stub tier") {
    val junk = "definitely not a png".getBytes("UTF-8")
    assert(Multimodal.JdkCodec.imageFeatures(junk, 8).toSeq ===
      Multimodal.StubCodec.imageFeatures(junk, 8).toSeq)
    assert(Multimodal.JdkCodec.audioFeatures(junk, 8).toSeq ===
      Multimodal.StubCodec.audioFeatures(junk, 8).toSeq)
    assert(Multimodal.JdkCodec.resize(junk, 8, 8).toSeq ===
      Multimodal.StubCodec.resize(junk, 8, 8).toSeq)
  }

  test("real PNGs flow through the batched extractor next to junk bytes") {
    val rows = Seq(
      Row(1L, "image", "image/png", halfPng(), Row(16, 16, null, null)),
      Row(2L, "image", "application/octet-stream",
        "junk-bytes".getBytes("UTF-8"), Row(null, null, null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
    val feats = Multimodal.extractImageFeatures(df, dims = 4)
      .select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L)(1) > 0.95f, "real decode must see the white half")
    assert(feats(2L).toSeq ===
      Multimodal.StubCodec.imageFeatures("junk-bytes".getBytes("UTF-8"), 4).toSeq)
  }

  test("repartitionForDecode spreads rows across partitions") {
    val parts = Multimodal.repartitionForDecode(mkMedia(100), 8)
      .rdd.glom().map(_.length).collect()
    assert(parts.length === 8)
    assert(parts.max <= 40, s"skewed decode partitions: ${parts.toSeq}")
  }
}
