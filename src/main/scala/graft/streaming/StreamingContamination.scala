package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions, TextFunctions}

/** Streaming benchmark-contamination probe — the always-on form of
  * [[graft.operators.TrainingOps.crossSplitContamination]] for an
  * ingest pipeline: every ARRIVING training document is checked against
  * a FIXED evaluation corpus's n-gram set, row-locally, inside the same
  * micro-batch that ingests it (the posture of
  * [[StreamingDedup]] — flag at the door, audit in batch).
  *
  * Shape: the eval corpus collapses ONCE to a sorted array of
  * `xxhash64(ngram)` hashes (driver-built, broadcast as a codegen
  * reference — eval sets are benchmark-sized by definition, and the
  * build guards the bound). The probe is then a pure map + filter over
  * the arriving stream: per doc, one native pass over its n-grams
  * counting distinct hits ([[NativeExpressions.GramHitCount]]) — no
  * join, no shuffle, no streaming state, so it composes with any
  * output mode and costs O(grams x log |eval|) per document at ANY
  * corpus scale.
  *
  * The gram identity (whitespace tokens -> n-gram string -> seed-42
  * xxhash64) is byte-identical to the batch operator's `splitGrams`
  * first hash, so the stream's flags on a history equal the batch
  * report computed over that same history with the eval side as the
  * non-train split and no df cap (the df cap is a batch-side audit
  * refinement: it needs global train-side document frequencies, which
  * an arrival-time probe by definition does not have — a capped batch
  * report is therefore a SUBSET of the stream's flags).
  */
object StreamingContamination {

  /** Sorted distinct `xxhash64(ngram)` table of an eval corpus. */
  final case class EvalGramIndex(n: Int, hashes: Array[Long]) {
    def nGrams: Int = hashes.length
  }

  /** Collapse the eval corpus to its gram-hash index. Driver-bounded by
    * `maxGrams` (same stance as the IVF centroid / DSIR collects): an
    * eval set past the guard is not a streaming-probe candidate — split
    * it, or keep that pairing in the batch operator.
    */
  def buildEvalIndex(evalDocs: DataFrame, textCol: String, n: Int = 3,
                     maxGrams: Int = 10000000): EvalGramIndex = {
    require(n >= 1, s"ngrams needs n >= 1, got $n")
    val rows = evalDocs
      .select(explode(TextFunctions.ngrams(col(textCol), n)).as("__g"))
      .select(xxhash64(col("__g")).as("__h")).distinct()
      .limit(maxGrams + 1).collect()
    require(rows.length <= maxGrams,
      s"eval corpus exceeds $maxGrams distinct $n-grams — past the " +
        "row-local probe tier; use the batch contamination operator")
    val hs = rows.map(_.getLong(0))
    java.util.Arrays.sort(hs)
    EvalGramIndex(n, hs)
  }

  /** Documents sharing at least one n-gram with the eval index:
    * (idCol, n_contaminated = distinct shared grams). Map-only —
    * identical semantics on a batch frame and on a stream (append
    * mode), which is what the batch-equivalence spec and the oracled
    * catalog row pin. NULL-text docs emit no row (null grams array →
    * null count → filtered), the corpus-scoring family's contract.
    */
  def flagContaminated(docs: DataFrame, idCol: String, textCol: String,
                       idx: EvalGramIndex): DataFrame =
    docs.select(col(idCol),
        NativeExpressions.gramHitCount(
          TextFunctions.ngrams(col(textCol), idx.n), idx.hashes)
          .cast("long").as("n_contaminated"))
      .filter(col("n_contaminated") >= 1L)

  /** Bloom form of the eval index: bits-per-gram instead of 8 bytes,
    * for eval corpora past the exact tier's driver guard. Distributed
    * build (`bloom_filter_agg` over the gram hashes), sized from the
    * observed distinct count unless overridden — the same sizing stance
    * as the batch Bloom contamination operator.
    */
  def buildEvalBloom(evalDocs: DataFrame, textCol: String, n: Int = 3,
                     expectedGrams: Long = 0L, fpp: Double = 0.01)
      : org.apache.spark.util.sketch.BloomFilter = {
    require(n >= 1, s"ngrams needs n >= 1, got $n")
    // cached across the sizing count and the filter build — without it
    // the explode + distinct (the expensive pass, at exactly the scale
    // this tier exists for) runs twice
    val hashes = evalDocs
      .select(explode(TextFunctions.ngrams(col(textCol), n)).as("__g"))
      .select(xxhash64(col("__g")).as("__h")).distinct()
      .persist()
    try {
      val nGrams =
        if (expectedGrams > 0L) expectedGrams
        else math.max(hashes.count(), 1L)
      // few build partitions: bloom_filter_agg ships one filter buffer
      // per partition through a single-partition exchange (the batch
      // operator's documented trade)
      hashes.coalesce(8).stat.bloomFilter("__h", nGrams, fpp)
    } finally hashes.unpersist()
  }

  /** [[flagContaminated]] with the Bloom index: flags are a SUPERSET
    * of the exact tier's (no false negatives, ~fpp false positives per
    * gram) and `n_contaminated` is an upper bound — the right polarity
    * for an at-the-door probe whose positives get exact confirmation
    * from the batch audit ([[graft.operators.TrainingOps
    * .crossSplitContamination]]) downstream.
    */
  def flagContaminatedBloom(docs: DataFrame, idCol: String,
                            textCol: String, n: Int,
                            bf: org.apache.spark.util.sketch.BloomFilter)
      : DataFrame =
    docs.select(col(idCol),
        NativeExpressions.gramBloomHitCount(
          TextFunctions.ngrams(col(textCol), n), bf)
          .cast("long").as("n_contaminated"))
      .filter(col("n_contaminated") >= 1L)
}
