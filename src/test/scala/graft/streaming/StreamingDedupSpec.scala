package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.operators.DedupOps

/** Streaming dedup must catch duplicates ACROSS micro-batches (the
  * whole point of the state), agree with the batch banding on what
  * collides, and emit each candidate exactly once.
  */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
  private val unrelated = (100 to 160).map(i => s"zzz$i").mkString(" ")

  test("exactDedupStream keeps the first arrival per distinct text across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.exactDedupStream(docs, "text")
      .writeStream.format("memory").queryName("exact_dedup_out")
      .outputMode("append").start()
    input.addData((1L, base), (2L, unrelated))
    q.processAllAvailable()
    input.addData((3L, base)) // exact copy, later batch: must be dropped
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("exact_dedup_out")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L))
  }

  test("exactDedupStreamWithinWatermark suppresses dups inside the window, evicts after") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, String)]
    val docs = input.toDF().toDF("doc_id", "ts", "text")
    val q = StreamingDedup.exactDedupStreamWithinWatermark(
        docs, "text", "ts", "10 seconds")
      .writeStream.format("memory").queryName("wm_dedup_out")
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    input.addData((1L, ts(100), base), (2L, ts(101), base)) // dup inside window
    q.processAllAvailable()
    // advance the watermark far past the first arrival, then replay the
    // same text: state was evicted, so the doc is emitted again
    input.addData((3L, ts(500), unrelated))
    q.processAllAvailable()
    input.addData((4L, ts(501), base))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("wm_dedup_out").select("doc_id")
      .as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L),
      s"in-window dup dropped, post-eviction replay re-emitted; got $kept")
  }

  test("minhashDedupStream flags near-dups across batches, exactly once, batch-consistent") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.nearDupPairsStream(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("near_dedup_out")
      .outputMode("append").start()

    input.addData((1L, base), (3L, unrelated))
    q.processAllAvailable()
    input.addData((2L, nearDup), (4L, base)) // near-dup + exact copy, later batch
    q.processAllAvailable()
    input.addData((4L, base)) // replayed doc: champion unchanged, same bucket
    q.processAllAvailable()
    q.stop()

    val emitted = spark.table("near_dedup_out")
      .select("id_a", "id_b").as[(Long, Long)].collect()
    val pairs = emitted.toSet
    assert(pairs.contains((1L, 4L)), "exact copy must collide with the champion")
    assert(pairs.contains((1L, 2L)), s"near-dup must collide, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc must not pair, got $pairs")

    // exactly-once per (band, newcomer): no duplicate emissions even
    // though doc 4 was replayed in a later batch
    val perBand = spark.table("near_dedup_out")
      .select("id_a", "id_b", "band").as[(Long, Long, Int)].collect()
    assert(perBand.distinct.length === perBand.length,
      s"replays must not re-emit, got ${perBand.toSeq}")

    // stream candidates (champion-normalized) must be a subset of the
    // batch operator's full pair graph over the same corpus
    val batchPairs = DedupOps.minhashCandidatePairs(
      Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
        .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.subsetOf(batchPairs),
      s"stream pairs $pairs must be a subset of batch pairs $batchPairs")
  }

  test("streaming contamination probe flags stream == batch on the same history") {
    implicit val sqlCtx = spark.sqlContext
    // eval corpus: two benchmark docs; arrivals: one verbatim leak, one
    // partial-overlap leak (shares a 3-gram window), one clean doc, one
    // NULL-text doc (must emit nothing)
    val evalDocs = Seq(
      (900L, "the quick brown fox jumps over the lazy dog"),
      (901L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val idx = StreamingContamination.buildEvalIndex(evalDocs, "text", n = 3)
    assert(idx.nGrams === 7 + 6)

    val arrivals = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // verbatim
      (2L, "he said pack my box with care"), // shares "pack my box" + "my box with"
      (3L, "completely unrelated clean text here"),
      (4L, null.asInstanceOf[String]))

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingContamination
      .flagContaminated(docs, "doc_id", "text", idx)
      .writeStream.format("memory").queryName("contam_stream_out")
      .outputMode("append").start()
    input.addData(arrivals.take(2): _*)
    q.processAllAvailable()
    input.addData(arrivals.drop(2): _*)
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("contam_stream_out")
      .as[(Long, Long)].collect().toMap
    // verbatim leak: all 7 distinct grams; partial: its two shared
    // 3-gram windows; clean + null: absent
    assert(streamed === Map(1L -> 7L, 2L -> 2L))

    // batch replay of the SAME history through the same operator — the
    // probe is map-only, so the batch form must be row-identical
    val batch = StreamingContamination
      .flagContaminated(arrivals.toDF("doc_id", "text"), "doc_id", "text", idx)
      .as[(Long, Long)].collect().toMap
    assert(batch === streamed)
  }

  test("bloom contamination tier flags a superset of the exact tier") {
    val evalDocs = Seq(
      (900L, "the quick brown fox jumps over the lazy dog"),
      (901L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val idx = StreamingContamination.buildEvalIndex(evalDocs, "text", n = 3)
    val bf = StreamingContamination.buildEvalBloom(evalDocs, "text", n = 3)
    val arrivals = ((1L, "the quick brown fox jumps over the lazy dog") +:
      (2L, "he said pack my box with care") +:
      (3 to 200).map(i => (i.toLong, s"clean filler doc number $i with words w${i}a w${i}b")))
      .toDF("doc_id", "text")
    val exact = StreamingContamination
      .flagContaminated(arrivals, "doc_id", "text", idx)
      .as[(Long, Long)].collect().toMap
    val bloom = StreamingContamination
      .flagContaminatedBloom(arrivals, "doc_id", "text", 3, bf)
      .as[(Long, Long)].collect().toMap
    // no false negatives: every exact flag present with count >= exact
    assert(exact.keySet.subsetOf(bloom.keySet))
    assert(exact.forall { case (id, c) => bloom(id) >= c })
    assert(exact === Map(1L -> 7L, 2L -> 2L))
  }

  test("in-batch arrival order does not change champions (docId order wins)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    val q = StreamingDedup.nearDupPairsStream(docs, "doc_id", "text")
      .writeStream.format("memory").queryName("order_dedup_out")
      .outputMode("append").start()
    // higher id listed first within the batch — champion must still be 5
    input.addData((9L, base), (5L, base), (7L, base))
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("order_dedup_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((5L, 7L), (5L, 9L)),
      s"lowest id must be champion regardless of arrival order, got $pairs")
  }

  test("vecNearDupPairsStream pairs identical vectors across batches, skips unrelated") {
    implicit val sqlCtx = spark.sqlContext
    // direction twins (identical vectors -> identical SRP sign pattern
    // in EVERY band) planted among well-separated unrelated directions
    def v(seed: Int): Seq[Float] =
      (0 until 8).map(j => (((seed * 31 + j * 17) % 19) - 9).toFloat)
    val input = MemoryStream[(Long, Seq[Float])]
    val vecs = input.toDF().toDF("vec_id", "embedding")
    val q = StreamingDedup.vecNearDupPairsStream(
        vecs, "vec_id", "embedding", bands = 4, bitsPerBand = 12,
        maxDim = 8)
      .writeStream.format("memory").queryName("vec_dedup_out")
      .outputMode("append").start()
    input.addData((1L, v(3)), (2L, v(5)))
    q.processAllAvailable()
    input.addData((3L, v(3)), (4L, v(7))) // 3 is 1's twin, later batch
    q.processAllAvailable()
    input.addData((3L, v(3))) // replay: must emit nothing new
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("vec_dedup_out")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 3L)),
      s"only the planted twin pair, exactly once, got $pairs")
  }

  test("streamed SRP buckets equal the batch operator's banding") {
    // a candidate pair in either mode means equal (band, bucket) —
    // the stream uses the identical expression, pinned here by
    // comparing the exploded bucket rows on a static frame
    def v(seed: Int): Seq[Float] =
      (0 until 8).map(j => (((seed * 37 + j * 13) % 23) - 11).toFloat)
    val vecs = (1L to 6L).map(i => (i, v(i.toInt))).toDF("vec_id", "embedding")
    val streamed = StreamingDedup.srpBandedStream(
        vecs, "vec_id", "embedding", bands = 4, bitsPerBand = 12, maxDim = 8)
      .collect().map(b => (b.docId, b.band, b.bucket)).toSet
    val batch = vecs.select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.posexplode(
          graft.functions.NativeExpressions.srpBucketArray(
            org.apache.spark.sql.functions.col("embedding"), 4, 12, 8)))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }
}
