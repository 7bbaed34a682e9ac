package graft.multimodal

import scala.collection.mutable.ListBuffer

/** Minimal ISO BMFF (MP4/MOV) demuxer — pure JVM, zero dependencies.
  *
  * This is the CONTAINER half of video handling: it parses the `moov`
  * sample tables (`stts` timing, `stsz` sizes, `stsc`/`stco`/`co64`
  * chunk layout, `stss` sync samples) and enumerates every video
  * sample's byte range, timestamp, and keyframe flag — the real
  * demultiplex step a frame-sampling pipeline needs. The samples'
  * payloads are UNDECODED codec bitstream (H.264/HEVC/AV1 NAL units);
  * pixel decode remains external-library territory and falls to the
  * tiered codec chain like any other blob.
  *
  * Parsing is defensive end to end: any structural violation (box
  * overruns, missing tables, counts that disagree) yields None rather
  * than throwing — at crawl scale a "video/mp4" blob frequently is not
  * one, and [[Multimodal.demuxVideoFrames]] degrades to the
  * deterministic stub grid in that case.
  *
  * Reference tie: the reference pipeline has no media path at all;
  * this exists for the training-data brief's multimodal column story
  * (SURVEY §2.10), replacing the round-3 "video demux stubbed" gap
  * with a real container walk.
  */
object Mp4Demux {

  /** One video sample (frame) as laid out in the container. */
  final case class Sample(index: Int, tsMs: Long, offset: Long,
                          size: Int, isSync: Boolean)

  final case class VideoTrack(timescale: Long, durationMs: Long,
                              samples: Vector[Sample])

  // ------------------------------------------------------ byte readers
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def u64(b: Array[Byte], o: Int): Long =
    (u32(b, o) << 32) | u32(b, o + 4)

  private def typ(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** (name, payloadStart, payloadEnd) triples of the boxes in
    * [from, to); stops at the first malformed header.
    */
  private final case class Box(name: String, start: Int, end: Int)

  private def boxes(b: Array[Byte], from: Int, to: Int): List[Box] = {
    val out = ListBuffer.empty[Box]
    var o = from
    while (o + 8 <= to) {
      var size = u32(b, o)
      var hdr = 8
      val name = typ(b, o + 4)
      if (size == 1) {
        if (o + 16 > to) return out.toList
        size = u64(b, o + 8)
        hdr = 16
      } else if (size == 0) size = to - o // box extends to the end
      if (size < hdr || o + size > to) return out.toList
      out += Box(name, o + hdr, (o + size).toInt)
      o = (o + size).toInt
    }
    out.toList
  }

  private def child(b: Array[Byte], parent: Box, name: String): Option[Box] =
    boxes(b, parent.start, parent.end).find(_.name == name)

  // ------------------------------------------------------------- demux

  /** First video track of an ISO-BMFF blob, or None if the bytes are
    * not a parseable MP4 with a complete video sample table.
    */
  def demux(bytes: Array[Byte]): Option[VideoTrack] =
    if (bytes == null || bytes.length < 16) None
    else try {
      val top = boxes(bytes, 0, bytes.length)
      top.find(_.name == "moov").flatMap { moov =>
        boxes(bytes, moov.start, moov.end)
          .filter(_.name == "trak")
          .flatMap(parseVideoTrack(bytes, _))
          .headOption
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  private def parseVideoTrack(b: Array[Byte], trak: Box): Option[VideoTrack] =
    for {
      mdia <- child(b, trak, "mdia")
      hdlr <- child(b, mdia, "hdlr")
      // handler type sits after version/flags(4) + predefined(4)
      if hdlr.end - hdlr.start >= 12 && typ(b, hdlr.start + 8) == "vide"
      mdhd <- child(b, mdia, "mdhd")
      (timescale, duration) <- parseMdhd(b, mdhd)
      if timescale > 0
      minf <- child(b, mdia, "minf")
      stbl <- child(b, minf, "stbl")
      samples <- buildSamples(b, stbl, timescale)
    } yield VideoTrack(timescale, duration * 1000 / timescale, samples)

  private def parseMdhd(b: Array[Byte], mdhd: Box): Option[(Long, Long)] = {
    val o = mdhd.start
    val version = b(o) & 0xff
    if (version == 1 && mdhd.end - o >= 28) Some((u32(b, o + 20), u64(b, o + 24)))
    else if (version == 0 && mdhd.end - o >= 20) Some((u32(b, o + 12), u32(b, o + 16)))
    else None
  }

  private def buildSamples(b: Array[Byte], stbl: Box,
                           timescale: Long): Option[Vector[Sample]] = {
    // ---- stsz: per-sample byte sizes. The uniform-size branch has no
    // table entries to bound the declared count, so a corrupt 200-byte
    // blob can claim 10^9 samples — every sample must occupy >= 1 byte
    // of THIS blob, so count and uniform*count are both bounded by the
    // blob length before any allocation (the contract is None, never
    // an OOM the NonFatal catch can't see).
    val sizes = child(b, stbl, "stsz").flatMap { x =>
      val o = x.start
      if (x.end - o < 12) None
      else {
        val uniform = u32(b, o + 4)
        val n = u32(b, o + 8)
        if (n < 0 || n > b.length) None
        else if (uniform != 0) {
          if (uniform * n > b.length) None
          else Some(Array.fill(n.toInt)(uniform.toInt))
        } else if (x.end - o - 12 >= 4L * n)
          Some(Array.tabulate(n.toInt)(i => u32(b, o + 12 + 4 * i).toInt))
        else None
      }
    }
    // ---- stco / co64: chunk byte offsets
    val chunkOffsets = child(b, stbl, "stco").flatMap { x =>
      val o = x.start
      val n = u32(b, o + 4).toInt
      if (x.end - o - 8 >= 4L * n)
        Some(Array.tabulate(n)(i => u32(b, o + 8 + 4 * i)))
      else None
    }.orElse(child(b, stbl, "co64").flatMap { x =>
      val o = x.start
      val n = u32(b, o + 4).toInt
      if (x.end - o - 8 >= 8L * n)
        Some(Array.tabulate(n)(i => u64(b, o + 8 + 8 * i)))
      else None
    })
    // ---- stsc: (firstChunk, samplesPerChunk) runs
    val sampleToChunk = child(b, stbl, "stsc").flatMap { x =>
      val o = x.start
      val n = u32(b, o + 4).toInt
      if (x.end - o - 8 >= 12L * n)
        Some(Array.tabulate(n)(i =>
          (u32(b, o + 8 + 12 * i).toInt, u32(b, o + 12 + 12 * i).toInt)))
      else None
    }
    // ---- stts: (count, delta) timing runs
    val timing = child(b, stbl, "stts").flatMap { x =>
      val o = x.start
      val n = u32(b, o + 4).toInt
      if (x.end - o - 8 >= 8L * n)
        Some(Array.tabulate(n)(i =>
          (u32(b, o + 8 + 8 * i).toInt, u32(b, o + 12 + 8 * i))))
      else None
    }
    // ---- stss: 1-based sync sample numbers; absent => every sample
    val sync = child(b, stbl, "stss").map { x =>
      val o = x.start
      val n = u32(b, o + 4).toInt
      (0 until math.min(n, (x.end - o - 8) / 4)).map(i => u32(b, o + 8 + 4 * i).toInt).toSet
    }

    (sizes, chunkOffsets, sampleToChunk, timing) match {
      case (Some(sz), Some(chunks), Some(stsc), Some(stts)) if stsc.nonEmpty =>
        val n = sz.length
        // expand stts to per-sample timestamps
        val ts = new Array[Long](n)
        var si = 0
        var acc = 0L
        var ti = 0
        while (ti < stts.length && si < n) {
          val (count, delta) = stts(ti)
          var c = 0
          while (c < count && si < n) {
            ts(si) = acc * 1000 / timescale
            acc += delta
            si += 1
            c += 1
          }
          ti += 1
        }
        if (si < n) return None // timing table shorter than sample count
        // expand stsc across chunks to per-sample offsets
        val offsets = new Array[Long](n)
        var sample = 0
        var chunk = 0
        while (chunk < chunks.length && sample < n) {
          // samples-per-chunk of the last run whose firstChunk <= chunk+1
          var spc = stsc(0)._2
          var e = 0
          while (e < stsc.length && stsc(e)._1 <= chunk + 1) {
            spc = stsc(e)._2
            e += 1
          }
          var within = 0L
          var k = 0
          while (k < spc && sample < n) {
            offsets(sample) = chunks(chunk) + within
            within += sz(sample)
            sample += 1
            k += 1
          }
          chunk += 1
        }
        if (sample < n) return None // chunk layout shorter than samples
        val syncSet = sync.getOrElse((1 to n).toSet)
        Some(Vector.tabulate(n)(i =>
          Sample(i, ts(i), offsets(i), sz(i), syncSet.contains(i + 1))))
      case _ => None
    }
  }

  /** Copy a sample's payload out of the container (None if the sample's
    * byte range falls outside the blob — truncated download).
    */
  def samplePayload(bytes: Array[Byte], s: Sample): Option[Array[Byte]] =
    if (s.offset < 0 || s.offset + s.size > bytes.length) None
    else Some(java.util.Arrays.copyOfRange(
      bytes, s.offset.toInt, (s.offset + s.size).toInt))
}
