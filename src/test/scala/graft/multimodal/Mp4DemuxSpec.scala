package graft.multimodal

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** The demuxer is exercised against a hand-assembled ISO-BMFF file
  * with a KNOWN sample layout (5 samples across 3 chunks, mixed chunk
  * sizes, explicit sync table), so every offset, timestamp, size, and
  * keyframe flag is asserted exactly — plus the degrade paths
  * (non-MP4 bytes, truncated mdat).
  */
class Mp4DemuxSpec extends SparkTestBase {

  // ---------------------------------------------------- box assembly
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(name: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    val out = new ByteArrayOutputStream()
    out.write(be32(8 + body.length))
    out.write(name.getBytes("ISO-8859-1"))
    out.write(body)
    out.toByteArray
  }

  private def full(name: String, version: Int, body: Array[Byte]*): Array[Byte] =
    box(name, Array(version.toByte, 0, 0, 0), body.flatten.toArray)

  // 5 samples: contents "AAAA", "BB", "CCCCCC", "DD", "E" — chunks of
  // (2, 2, 1) samples. stts: first 3 samples at delta 100 (timescale
  // 1000 -> 100 ms), last 2 at delta 250. stss: samples 1 and 4 sync.
  private val samples = Seq("AAAA", "BB", "CCCCCC", "DD", "E")
    .map(_.getBytes("ISO-8859-1"))

  private def buildMp4(): (Array[Byte], Array[Long]) = {
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(0))
    val mdatBody = samples.flatten.toArray
    val mdat = box("mdat", mdatBody)
    val mdatPayloadStart = ftyp.length + 8L
    // chunk layout: chunk1 = s1,s2; chunk2 = s3,s4; chunk3 = s5
    val sampleOffsets = samples.scanLeft(mdatPayloadStart)(_ + _.length)
    val chunkOffsets = Array(sampleOffsets(0), sampleOffsets(2), sampleOffsets(4))

    val mdhd = full("mdhd", 0, be32(0), be32(0), be32(1000) /* timescale */,
      be32(700) /* duration */)
    val hdlr = full("hdlr", 0, be32(0), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](12))
    val stts = full("stts", 0, be32(2), be32(3), be32(100), be32(2), be32(250))
    val stsz = full("stsz", 0, be32(0) /* non-uniform */, be32(5),
      samples.map(s => be32(s.length)).flatten.toArray)
    val stsc = full("stsc", 0, be32(2),
      be32(1), be32(2), be32(1), // chunks 1.. : 2 samples each
      be32(3), be32(1), be32(1)) // chunk 3: 1 sample
    val stco = full("stco", 0, be32(3), chunkOffsets.map(be32).flatten.toArray)
    val stss = full("stss", 0, be32(2), be32(1), be32(4))
    val stbl = box("stbl", stts, stsz, stsc, stco, stss)
    val minf = box("minf", stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", mdia)
    val moov = box("moov", trak)
    (ftyp ++ mdat ++ moov, sampleOffsets.init.toArray)
  }

  test("demux recovers every sample's offset, size, timestamp, and sync flag") {
    val (mp4, offsets) = buildMp4()
    val track = Mp4Demux.demux(mp4).getOrElse(fail("demux returned None"))
    assert(track.timescale === 1000L)
    assert(track.durationMs === 700L)
    assert(track.samples.map(_.size) === Vector(4, 2, 6, 2, 1))
    assert(track.samples.map(_.offset) === offsets.toVector)
    assert(track.samples.map(_.tsMs) === Vector(0L, 100L, 200L, 300L, 550L))
    assert(track.samples.map(_.isSync) === Vector(true, false, false, true, false))
    // payloads round-trip byte-for-byte
    val payloads = track.samples.map(s =>
      new String(Mp4Demux.samplePayload(mp4, s).get, "ISO-8859-1"))
    assert(payloads === Vector("AAAA", "BB", "CCCCCC", "DD", "E"))
  }

  test("non-MP4 bytes and truncated containers degrade to None, never throw") {
    assert(Mp4Demux.demux(null).isEmpty)
    assert(Mp4Demux.demux("not a video at all".getBytes).isEmpty)
    val (mp4, _) = buildMp4()
    // moov chopped off
    assert(Mp4Demux.demux(java.util.Arrays.copyOf(mp4, 40)).isEmpty)
    // truncated mdat: sample table parses, payload extraction refuses
    val track = Mp4Demux.demux(mp4).get
    assert(Mp4Demux.samplePayload(
      java.util.Arrays.copyOf(mp4, 30), track.samples.last).isEmpty)
  }

  test("corrupt stsz claiming 10^9 uniform samples yields None, not an allocation") {
    // uniform-size stsz has no table entries to bound the count — the
    // demuxer must refuse counts that cannot fit the blob BEFORE
    // allocating (an OOM Error would sail past the NonFatal catch)
    val mdhd = full("mdhd", 0, be32(0), be32(0), be32(1000), be32(700))
    val hdlr = full("hdlr", 0, be32(0), "vide".getBytes("ISO-8859-1"),
      new Array[Byte](12))
    val stts = full("stts", 0, be32(1), be32(1000000000), be32(1))
    val stszBomb = full("stsz", 0, be32(1) /* uniform 1 byte */,
      be32(1000000000L) /* 1e9 samples */)
    val stsc = full("stsc", 0, be32(1), be32(1), be32(1), be32(1))
    val stco = full("stco", 0, be32(1), be32(16))
    val stbl = box("stbl", stts, stszBomb, stsc, stco)
    val moov = box("moov", box("trak", box("mdia", mdhd, hdlr,
      box("minf", stbl))))
    val blob = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(0)) ++ moov
    assert(Mp4Demux.demux(blob).isEmpty)
  }

  test("demuxVideoFrames: real MP4 rows use container timing; junk falls back to the grid") {
    import scala.jdk.CollectionConverters._
    val (mp4, _) = buildMp4()
    val rows = Seq(
      Row(1L, "video", "video/mp4", mp4,
        Row(null, null, null, 700L)),
      Row(2L, "video", "video/mp4", "junk-bytes-not-an-mp4".getBytes,
        Row(null, null, null, 1000L))) // stub grid: 0 and 500 ms
    val df = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)

    val all = Multimodal.demuxVideoFrames(df, keyframesOnly = false)
      .collect().groupBy(_.getLong(0))
    assert(all(1L).map(r => (r.getLong(1), r.getBoolean(2))).toSeq.sorted ===
      Seq((0L, true), (100L, false), (200L, false), (300L, true), (550L, false)))
    assert(new String(all(1L).map(r => r.getAs[Array[Byte]](3)).minBy(_.length)) === "E")
    assert(all(2L).map(_.getLong(1)).toSeq.sorted === Seq(0L, 500L),
      "unparseable bytes must fall back to the 500 ms stub grid")
    assert(all(2L).forall(_.getBoolean(2)))

    val keyOnly = Multimodal.demuxVideoFrames(df, keyframesOnly = true)
      .collect().groupBy(_.getLong(0))
    assert(keyOnly(1L).map(_.getLong(1)).toSeq.sorted === Seq(0L, 300L),
      "keyframesOnly must keep exactly the stss samples")
  }
}
