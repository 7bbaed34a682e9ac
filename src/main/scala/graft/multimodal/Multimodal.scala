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
  * The actual codec calls are STUBBED with deterministic fakes (this
  * container ships no image/audio libraries): `StubCodec` derives
  * "features" from the bytes hash. Swapping in a real decoder means
  * replacing StubCodec's body — every signature, schema and batch shape
  * stays the same.
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

  /** STUB: deterministic fake codec. A real implementation would call
    * an image/audio library here (e.g. JavaCV / TwelveMonkeys /
    * libsndfile bindings); everything outside this object is
    * production-shaped.
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
        // one "codec session" per batch (stub: nothing to set up)
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](contentIdx)
          val f = StubCodec.imageFeatures(bytes, dims)
          Row.fromSeq(r.toSeq :+ (if (f == null) null else f.toSeq))
        }
      }
    }
  }

  /** Batched audio feature extraction (same mapInPandas batch shape as
    * images; stub derives "spectral" features from byte windows — a
    * real impl decodes PCM and computes e.g. mel bins per frame).
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
          val feats =
            if (bytes == null) null
            else {
              // stub: windowed byte-energy profile, deterministic
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
              out.toSeq
            }
          Row.fromSeq(r.toSeq :+ feats)
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
          val resized = StubCodec.resize(r.getAs[Array[Byte]](contentIdx), w, h)
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
        StubCodec.sampleFrames(r.getAs[Array[Byte]](contentIdx), dur, everyMs)
          .map { case (ts, frame) =>
            Row(r.getLong(idIdx), ts, frame,
              StubCodec.imageFeatures(frame, featureDims).toSeq)
          }
      }
    }
  }
}
