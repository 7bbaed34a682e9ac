package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for a training-data pipeline
  * (SURVEY §2.10): media travels as an opaque `binary` column plus a
  * typed metadata struct; decode / feature-extraction / resize /
  * frame-sampling run as batched partition-local transforms.
  *
  * Spark-side plumbing is real and tested: schemas, the batched
  * `mapPartitions` execution shape (the Scala analogue of
  * `mapInPandas` — an iterator of fixed-size batches per partition, so
  * a vectorized decoder amortizes setup across a batch), and
  * partitioning by content hash so a 100 TB media corpus spreads decode
  * work evenly regardless of how files landed.
  *
  * Decode is TIERED: [[JdkCodec]] really decodes what the JDK can
  * parse with zero extra dependencies — PNG/JPEG/GIF/BMP via
  * `javax.imageio`, WAV/AIFF/AU PCM via `javax.sound.sampled` — and
  * anything unparseable falls back to [[StubCodec]]'s deterministic
  * byte-hash fakes, so non-media bytes still flow and fixture oracles
  * stay reproducible. Video containers get a REAL demux tier too:
  * [[Mp4Demux]] walks the ISO-BMFF sample tables and
  * [[demuxVideoFrames]] emits per-sample container timing, keyframe
  * flags, and undecoded codec payloads. Exotic pixel codecs (HEIC,
  * H.264 decode, opus) would slot in the same fallback chain via an
  * external library.
  */
object Multimodal {

  /** Canonical media table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("mime", StringType, nullable = true),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** STUB tier: deterministic fake codec for bytes no real decoder
    * accepts (and the pre-round-4 behavior for every input). Keeping it
    * deterministic means a corpus of undecodable blobs still produces
    * stable, content-sensitive features instead of nulls.
    */
  object StubCodec {
    /** Fake embedding: `dims` floats derived from a rolling hash of the
      * bytes — deterministic, content-sensitive, cheap.
      */
    def imageFeatures(bytes: Array[Byte], dims: Int): Array[Float] = {
      if (bytes == null) return null
      var h = 1125899906842597L
      val out = new Array[Float](dims)
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      var d = 0
      while (d < dims) {
        h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
        out(d) = (h.toDouble / Long.MaxValue).toFloat
        d += 1
      }
      out
    }

    /** Fake resize: returns a content-derived byte stub of the target
      * "resolution" (real impl: decode, scale, re-encode).
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
      if (bytes == null) return null
      val out = new Array[Byte]((w * h / 64).max(16))
      var i = 0
      while (i < out.length) {
        out(i) = bytes(i % bytes.length); i += 1
      }
      out
    }

    /** Fake frame extraction: one pseudo-frame every `everyMs` of the
      * declared duration (real impl: demux + decode keyframes).
      */
    def sampleFrames(bytes: Array[Byte], durationMs: Long,
                     everyMs: Long): Seq[(Long, Array[Byte])] = {
      if (bytes == null || durationMs <= 0) return Seq.empty
      (0L until durationMs by everyMs).map { t =>
        t -> resize(bytes :+ (t & 0xff).toByte, 16, 16)
      }
    }

    /** Fake audio features: windowed byte-energy profile. */
    def audioFeatures(bytes: Array[Byte], dims: Int): Array[Float] = {
      if (bytes == null) return null
      val out = new Array[Float](dims)
      val win = math.max(bytes.length / dims, 1)
      var d = 0
      while (d < dims) {
        var acc = 0L
        var i = d * win
        while (i < math.min((d + 1) * win, bytes.length)) {
          acc += (bytes(i) & 0xff); i += 1
        }
        out(d) = acc.toFloat / win
        d += 1
      }
      out
    }
  }

  /** REAL tier: JDK-only decode, no new dependencies.
    *
    *  - images: `javax.imageio.ImageIO` (PNG, JPEG, GIF, BMP, WBMP) —
    *    features are mean-luminance grid pooling over the decoded
    *    pixels; resize is a true rescale re-encoded as PNG.
    *  - audio: `javax.sound.sampled.AudioSystem` (WAV/AIFF/AU PCM) —
    *    features are per-window RMS energy over decoded samples.
    *
    * Bytes neither stack can parse fall back to [[StubCodec]] — decode
    * never throws on a corrupt blob, it degrades (at 100 TB some
    * fraction of any crawl IS corrupt; a pipeline that dies on blob
    * 10^9 of 10^10 is not an operator).
    */
  object JdkCodec {

    def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (bytes == null) None
      else try {
        // ImageIO returns null (not an exception) for unknown formats
        Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Mean-luminance grid pooling: the image is divided into a
      * ceil(sqrt(dims))-sided grid scanned row-major; each feature is
      * the mean luma (Rec. 601) of its cell in [0,1]. Deterministic,
      * resolution-independent, and content-sensitive — the classic
      * cheap baseline embedding before a learned encoder.
      */
    def imageFeatures(bytes: Array[Byte], dims: Int): Array[Float] =
      decodeImage(bytes) match {
        case None => StubCodec.imageFeatures(bytes, dims)
        case Some(img) =>
          val g = math.ceil(math.sqrt(dims.toDouble)).toInt
          val out = new Array[Float](dims)
          val w = img.getWidth
          val h = img.getHeight
          var d = 0
          while (d < dims) {
            val (cy, cx) = (d / g, d % g)
            val x0 = cx * w / g; val x1 = math.max((cx + 1) * w / g, x0 + 1)
            val y0 = cy * h / g; val y1 = math.max((cy + 1) * h / g, y0 + 1)
            var acc = 0.0
            var n = 0
            var y = y0
            while (y < h && y < y1) {
              var x = x0
              while (x < w && x < x1) {
                val rgb = img.getRGB(x, y)
                acc += 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
                n += 1; x += 1
              }
              y += 1
            }
            out(d) = if (n == 0) 0f else (acc / n / 255.0).toFloat
            d += 1
          }
          out
      }

    /** True rescale (bilinear) re-encoded as PNG; undecodable bytes
      * fall back to the stub resize.
      */
    def resize(bytes: Array[Byte], w: Int, h: Int): Array[Byte] =
      decodeImage(bytes) match {
        case None => StubCodec.resize(bytes, w, h)
        case Some(img) =>
          val scaled = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val gfx = scaled.createGraphics()
          gfx.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          gfx.drawImage(img, 0, 0, w, h, null)
          gfx.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(scaled, "png", bos)
          bos.toByteArray
      }

    private def decodePcm(bytes: Array[Byte]): Option[Array[Float]] =
      if (bytes == null) None
      else try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          // normalize to signed 16-bit PCM mono-ish: average channels
          val pcmFmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            fmt.getSampleRate, 16, fmt.getChannels,
            2 * fmt.getChannels, fmt.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, in)
          val raw = pcm.readAllBytes()
          val ch = fmt.getChannels
          val nFrames = raw.length / (2 * ch)
          val out = new Array[Float](nFrames)
          var f = 0
          while (f < nFrames) {
            var acc = 0.0
            var c = 0
            while (c < ch) {
              val o = (f * ch + c) * 2
              val s = ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
              acc += s / 32768.0
              c += 1
            }
            out(f) = (acc / ch).toFloat
            f += 1
          }
          Some(out)
        } finally in.close()
      } catch { case scala.util.control.NonFatal(_) => None }

    /** Per-window RMS energy over decoded PCM samples (real decode for
      * WAV/AIFF/AU; stub energy profile otherwise).
      */
    def audioFeatures(bytes: Array[Byte], dims: Int): Array[Float] =
      decodePcm(bytes) match {
        case None => StubCodec.audioFeatures(bytes, dims)
        case Some(samples) =>
          val out = new Array[Float](dims)
          if (samples.isEmpty) return out
          val win = math.max(samples.length / dims, 1)
          var d = 0
          while (d < dims) {
            var acc = 0.0
            var n = 0
            var i = d * win
            while (i < math.min((d + 1) * win, samples.length)) {
              acc += samples(i) * samples(i); n += 1; i += 1
            }
            out(d) = if (n == 0) 0f else math.sqrt(acc / n).toFloat
            d += 1
          }
          out
      }
  }

  /** Spread decode work evenly: partition by a hash of the id, not by
    * arrival order (media files cluster pathologically — one dir of 4K
    * video next to thumbnails).
    */
  def repartitionForDecode(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions, xxhash64(col("media_id")))

  /** Batched feature extraction over the binary column — the
    * `mapInPandas` shape: per partition, rows are processed in
    * `batchSize` groups so a real vectorized decoder amortizes model /
    * codec setup per batch, not per row. Appends `features
    * array<float>`.
    */
  def extractImageFeatures(df: DataFrame, dims: Int = 64,
                           batchSize: Int = 128): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "codec session" per batch (ImageIO readers are cheap;
        // a learned encoder would load its weights here, once)
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val f = JdkCodec.imageFeatures(bytes, dims)
          Row.fromSeq(r.toSeq :+ (if (f == null) null else f.toSeq))
        }
      }
    }
  }

  /** Batched audio feature extraction (same mapInPandas batch shape as
    * images): real per-window RMS over decoded PCM for WAV/AIFF/AU,
    * deterministic byte-energy profile otherwise.
    */
  def extractAudioFeatures(df: DataFrame, dims: Int = 32,
                           batchSize: Int = 128): DataFrame = {
    val outSchema = df.schema.add("audio_features", ArrayType(FloatType))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val contentIdx = df.schema.fieldIndex("content")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val f = JdkCodec.audioFeatures(bytes, dims)
          Row.fromSeq(r.toSeq :+ (if (f == null) null else f.toSeq))
        }
      }
    }
  }

  /** Batched resize; replaces `content` and stamps meta.width/height. */
  def resizeImages(df: DataFrame, w: Int, h: Int,
                   batchSize: Int = 128): DataFrame = {
    val outSchema = df.schema
    implicit val enc: org.apache.spark.sql.Encoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val resized = JdkCodec.resize(r.getAs[Array[Byte]](contentIdx), w, h)
          val meta = r.getAs[Row](metaIdx)
          val newMeta =
            if (meta == null) Row(w, h, null, null)
            else Row(w, h, meta.get(2), meta.get(3))
          val vals = r.toSeq.toArray
          vals(contentIdx) = resized
          vals(metaIdx) = newMeta
          Row.fromSeq(vals.toSeq)
        }
      }
    }
  }

  /** REAL container tier for video: parse the MP4 sample tables
    * ([[Mp4Demux]]) and emit one row per video sample with its
    * CONTAINER timing, keyframe flag, and undecoded codec payload —
    * optionally keyframes only, the usual sampling policy (sync
    * samples decode standalone). Bytes that are not a parseable MP4
    * degrade to the stub's duration grid (is_sync = true), so a crawl
    * partition mixing real videos and mislabeled blobs still flows.
    */
  def demuxVideoFrames(df: DataFrame, keyframesOnly: Boolean = true,
                       featureDims: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_ts_ms", LongType),
      StructField("is_sync", BooleanType),
      StructField("frame", BinaryType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex("media_id")
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        Mp4Demux.demux(bytes) match {
          case Some(track) =>
            track.samples.iterator
              .filter(s => !keyframesOnly || s.isSync)
              .flatMap { s =>
                Mp4Demux.samplePayload(bytes, s).map { payload =>
                  Row(r.getLong(idIdx), s.tsMs, s.isSync, payload,
                    JdkCodec.imageFeatures(payload, featureDims).toSeq)
                }
              }
          case None =>
            val meta = r.getAs[Row](metaIdx)
            val dur = if (meta == null || meta.isNullAt(3)) 0L else meta.getLong(3)
            StubCodec.sampleFrames(bytes, dur, everyMs = 500L)
              .iterator.map { case (ts, frame) =>
                Row(r.getLong(idIdx), ts, true, frame,
                  JdkCodec.imageFeatures(frame, featureDims).toSeq)
              }
        }
      }
    }
  }

  /** Frame sampling: one output row per sampled frame (media_id,
    * frame_ts_ms, frame binary, features).
    */
  def sampleVideoFrames(df: DataFrame, everyMs: Long = 1000L,
                        featureDims: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("frame_ts_ms", LongType),
      StructField("frame", BinaryType),
      StructField("features", ArrayType(FloatType))))
    implicit val enc: org.apache.spark.sql.Encoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex("media_id")
    val contentIdx = df.schema.fieldIndex("content")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val meta = r.getAs[Row](metaIdx)
        val dur = if (meta == null || meta.isNullAt(3)) 0L else meta.getLong(3)
        // video demux stays stubbed (no JDK demuxer); the per-frame
        // feature pass uses the tiered codec like any other image
        StubCodec.sampleFrames(r.getAs[Array[Byte]](contentIdx), dur, everyMs)
          .map { case (ts, frame) =>
            Row(r.getLong(idIdx), ts, frame,
              JdkCodec.imageFeatures(frame, featureDims).toSeq)
          }
      }
    }
  }
}
