package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.{NativeExpressions, TextFunctions}

/** Streaming corpus deduplication — the incremental form of
  * [[graft.operators.DedupOps]] for an always-on ingest pipeline (the
  * shape a crawl feed arrives in): every document is checked against
  * everything already ingested, in one pass, with state bounded by
  * corpus keys rather than by event count.
  *
  * Two tiers, mirroring the batch operators:
  *
  *  - [[exactDedupStream]]: content-hash exact dedup, declarative —
  *    Spark's `dropDuplicates` on the md5 key keeps the first arrival
  *    per distinct text FOREVER (state = one 32-char key row per
  *    distinct document; a watermark does NOT bound it, because the
  *    dedup subset carries no event-time column). For a bounded
  *    time-windowed policy use [[exactDedupStreamWithinWatermark]],
  *    which goes through `dropDuplicatesWithinWatermark` so state
  *    older than the watermark delay is actually evicted.
  *
  *  - [[minhashDedupStream]]: MinHash-LSH NEAR-dup detection as a
  *    `flatMapGroupsWithState` over (band, bucket) groups. Each bucket
  *    remembers its member ids, champion (= first-seen) first; a doc
  *    landing in a non-empty bucket emits a candidate pair (champion,
  *    newcomer) — exactly once per (bucket, doc), replays included,
  *    because membership is checked against the state. Bucket state is
  *    8 bytes per member — bounded by bucket size, which the LSH band
  *    sizing keeps tiny by design (the same premise that bounds the
  *    batch operator's in-bucket quadratic; a hot bucket is a
  *    bitsPerBand sizing problem in both).
  *
  * Champion-pairing is the deliberate streaming trade-off: the batch
  * operator pairs ALL bucket members (it can see them at once); the
  * stream pairs newcomers with the bucket's first member. For
  * dedup-drop decisions ("is this doc a near-copy of ANYTHING already
  * kept?") champion matching is sufficient — a newcomer colliding with
  * any prior member collides with the champion's bucket by definition
  * of the band hash. What it does NOT give is the full pair graph for
  * transitive clustering — that remains a batch job
  * ([[graft.operators.DedupOps.duplicateClusters]]) over the
  * accumulated pair log.
  */
object StreamingDedup {

  /** First arrival per distinct text wins. Works on a static frame the
    * same way (dropDuplicates is semantics-preserving across modes), so
    * batch-stream equivalence is testable directly.
    */
  def exactDedupStream(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .dropDuplicates("content_hash")

  /** Time-bounded exact dedup: duplicates are only suppressed within
    * the watermark delay of the first arrival, and state for hashes
    * older than the watermark is evicted — the policy for unbounded
    * streams where an occasional re-emission after `delay` is
    * acceptable but unbounded state is not.
    */
  def exactDedupStreamWithinWatermark(docs: DataFrame, textCol: String,
                                      tsCol: String,
                                      delay: String): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")

  /** A doc exploded to one row per LSH band bucket. */
  final case class BandedDoc(docId: Long, band: Int, bucket: Long)

  /** Candidate near-dup pair: `keptId` was in the bucket first. */
  final case class CandidatePair(keptId: Long, newId: Long,
                                 band: Int, bucket: Long)

  implicit private val bandedEnc: Encoder[BandedDoc] =
    Encoders.product[BandedDoc]
  implicit private val pairEnc: Encoder[CandidatePair] =
    Encoders.product[CandidatePair]
  implicit private val keyEnc: Encoder[(Int, Long)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)

  /** Bucket membership, champion (first-seen doc id) at the head. */
  final case class BucketState(members: Seq[Long])

  implicit private val stateEnc: Encoder[BucketState] =
    Encoders.product[BucketState]

  /** Explode a (possibly streaming) document frame into band-bucket
    * rows with the SAME native banding as the batch operator
    * (NativeExpressions.minhashBands), so a doc collides with the same
    * buckets whether it arrives in a batch scan or on the stream.
    */
  def bandedStream(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 32, bands: Int = 8,
                   shingleSize: Int = 3): Dataset[BandedDoc] = {
    // fail at plan time, not hours into the stream: a silent
    // cast("long") of a string id yields null on the first non-numeric
    // value and kills the query at encoding (non-nullable docId)
    val idType = docs.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
      .contains(idType.typeName),
      s"$idCol must be an integral id column, got $idType " +
        "(hash or dictionary-encode string ids upstream)")
    val tokenHashes =
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
    docs.select(col(idCol).cast("long").as("docId"),
        posexplode(NativeExpressions.minhashBands(
          tokenHashes, numHashes, shingleSize, bands)))
      .select(col("docId"), col("pos").as("band"), col("col").as("bucket"))
      .as[BandedDoc]
  }

  /** Champion-per-bucket LSH state: emits `CandidatePair` rows as docs
    * stream in. Within one micro-batch, rows are processed in docId
    * order so the champion (and therefore the emitted pairs) does not
    * depend on arrival interleaving inside the batch — replaying the
    * same stream in different batch splits yields the same champions,
    * and a replayed doc emits nothing (membership is in the state).
    */
  def minhashDedupStream(banded: Dataset[BandedDoc]): Dataset[CandidatePair] =
    banded.groupByKey(b => (b.band, b.bucket))
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), rows: Iterator[BandedDoc], state: GroupState[BucketState]) =>
          val ids = rows.map(_.docId).toArray.sorted.distinct
          val prev = state.getOption.map(_.members).getOrElse(Seq.empty)
          val seen = prev.toSet
          val fresh = ids.filterNot(seen)
          if (fresh.isEmpty) Iterator.empty
          else {
            state.update(BucketState(prev ++ fresh))
            val champion = prev.headOption.getOrElse(fresh.head)
            fresh.iterator.filter(_ != champion)
              .map(id => CandidatePair(champion, id, key._1, key._2))
          }
      }

  /** End-to-end: documents in, near-dup candidate pairs out (id_a <
    * id_b normalized, like the batch pair set). Downstream `distinct`
    * over (id_a, id_b) collapses multi-band collisions.
    */
  def nearDupPairsStream(docs: DataFrame, idCol: String, textCol: String,
                         numHashes: Int = 32, bands: Int = 8,
                         shingleSize: Int = 3): DataFrame =
    minhashDedupStream(bandedStream(docs, idCol, textCol,
      numHashes, bands, shingleSize))
      .select(
        least(col("keptId"), col("newId")).as("id_a"),
        greatest(col("keptId"), col("newId")).as("id_b"),
        col("band"), col("bucket"))

  /** EMBEDDING near-dup over an ingest stream: arriving vectors are
    * bucketed by the SAME deterministic SRP hyperplanes as the batch
    * operator ([[graft.operators.SimilaritySearch.cosineDupePairsLsh]]
    * via `NativeExpressions.srpBucketArray` — seed-derived literals, so
    * a vector collides with identical buckets in either mode), then
    * fed through the IDENTICAL champion-per-bucket state machine as
    * the text tier. A candidate pair means "same sign pattern on every
    * hyperplane of some band"; exact cosine confirmation is a batch
    * job over the pair log + vector store, exactly as the batch
    * operator verifies in-bucket. State stays 8 bytes per member per
    * band — bounded by SRP bucket occupancy, which bitsPerBand sizes
    * (~log2(corpus) keeps buckets near-singleton for random vectors,
    * so the state per bucket is the near-dup GROUPS, not the corpus).
    */
  def srpBandedStream(vecs: DataFrame, idCol: String, vecCol: String,
                      bands: Int = 8, bitsPerBand: Int = 16,
                      maxDim: Int = 64): Dataset[BandedDoc] = {
    val idType = vecs.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
      .contains(idType.typeName),
      s"$idCol must be an integral id column, got $idType " +
        "(hash or dictionary-encode string ids upstream)")
    vecs.select(col(idCol).cast("long").as("docId"),
        posexplode(NativeExpressions.srpBucketArray(
          col(vecCol), bands, bitsPerBand, maxDim)))
      .select(col("docId"), col("pos").as("band"), col("col").as("bucket"))
      .as[BandedDoc]
  }

  /** End-to-end embedding tier: vectors in, candidate near-dup pairs
    * out (id_a < id_b normalized, matching the batch operator's
    * candidate set restricted to champion pairings).
    */
  def vecNearDupPairsStream(vecs: DataFrame, idCol: String, vecCol: String,
                            bands: Int = 8, bitsPerBand: Int = 16,
                            maxDim: Int = 64): DataFrame =
    minhashDedupStream(srpBandedStream(vecs, idCol, vecCol,
      bands, bitsPerBand, maxDim))
      .select(
        least(col("keptId"), col("newId")).as("id_a"),
        greatest(col("keptId"), col("newId")).as("id_b"),
        col("band"), col("bucket"))
}
