package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact duplicated-SPAN detection — the substring-level dedup mode of
  * training-data pipelines (suffix-array "exact substring" dedup, as in
  * Lee et al. 2022, *Deduplicating Training Data Makes Language Models
  * Better*), distinct from the document-level near-dup family in
  * [[DedupOps]]: MinHash/SimHash flag whole documents that look alike,
  * while this flags the REGIONS inside otherwise-distinct documents that
  * repeat verbatim anywhere in the corpus (boilerplate, licenses,
  * templated headers).
  *
  * A corpus-wide suffix array is not a Spark-shaped structure; the
  * standard distributed realization is fixed-width gram matching, which
  * this implements:
  *
  *   1. token position `p` of a document is *duplicated* iff the
  *      `width`-token gram starting at `p` occurs more than once in the
  *      corpus (so any verbatim repeat of at least `width` tokens is
  *      found — a span of length L >= width yields L - width + 1
  *      duplicated positions in each copy);
  *   2. maximal runs of duplicated positions merge into spans
  *      (gaps-and-islands per document).
  *
  * Scale design: token strings are hashed ONCE per token
  * (`xxhash64`), gram identity is the hash of the `width` consecutive
  * token hashes, and every exchange carries fixed-width rows
  * `(gram_hash, doc_id, pos)` — never gram text, never document bodies.
  * Total shuffled rows are O(corpus tokens): the same asymptotics as a
  * wordcount over the corpus, with the frequency test done by a
  * window over the gram-hash partition (one shuffle) and the island
  * merge by a window over the document partition (second shuffle).
  * No self-join, no all-pairs stage, no driver state.
  */
object SpanDedup {

  /** One row per (doc, 1-based token position) whose `width`-gram
    * repeats anywhere in the corpus (including elsewhere in the same
    * document). Internal building block — columns (doc_id, pos).
    */
  private def duplicatedPositions(docs: DataFrame, idCol: String,
                                  textCol: String, width: Int): DataFrame = {
    val tokenHashes = transform(TextFunctions.tokens(col(textCol)),
      t => xxhash64(t))
    // Each token string hashed once, then ONE native pass produces the
    // rolling width-gram hashes (NativeExpressions.GramHashes) —
    // documents shorter than `width` tokens emit nothing.
    val grams = graft.functions.NativeExpressions.gramHashes(
      tokenHashes, width)
    val positioned = docs
      .select(col(idCol).as("doc_id"), posexplode(grams))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gram_hash"))
    // Corpus frequency per gram via an unordered window over the
    // gram-hash partition: one exchange keyed on the 8-byte hash, and
    // partition sizes are gram frequencies (tiny except for the exact
    // repeats we are hunting).
    positioned
      .withColumn("n_occ", count(lit(1)).over(Window.partitionBy("gram_hash")))
      .filter(col("n_occ") > 1)
      .select("doc_id", "pos")
  }

  /** Maximal duplicated spans per document: `(doc_id, span_start,
    * span_end, span_tokens)` with 1-based inclusive token offsets. A
    * span covers `span_end - span_start + 1 = span_tokens` tokens, each
    * of which sits inside at least one corpus-repeated `width`-gram.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      width: Int = 8): DataFrame = {
    val dup = duplicatedPositions(docs, idCol, textCol, width)
    // Interval merge, not start-run merge: a duplicated start at p
    // covers tokens [p, p+width-1], so starts p and q (p < q) belong to
    // the same maximal span iff q <= p + width — even when the start
    // positions themselves are not consecutive (two repeats of "A B"
    // inside "A B x A B" duplicate starts 1 and 4 but every token in
    // between is covered). Grouping consecutive STARTS instead would
    // emit overlapping spans and double-count their tokens (dup
    // fractions above 1.0).
    val w = Window.partitionBy("doc_id").orderBy("pos")
    dup
      .withColumn("__brk",
        when(col("pos") - lag("pos", 1).over(w) > width, 1L).otherwise(0L))
      .withColumn("__grp", sum("__brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min("pos").as("span_start"),
        (max("pos") + (width - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_tokens"))
  }

  /** Rewrite the corpus with repeated spans REMOVED, keeping one
    * canonical copy — the actual dedup step of Lee et al. 2022 (their
    * "ExactSubstr" variant deletes all but one occurrence of every
    * repeated substring), where [[duplicatedSpans]]/[[spanStats]] only
    * report.
    *
    * Contract: the FIRST corpus occurrence of each duplicated
    * `width`-gram — ordered by (doc_id, pos) — is canonical and kept;
    * every other occurrence marks its `width` tokens for removal.
    * Removal regions merge into maximal spans exactly as in
    * [[duplicatedSpans]], and the document is re-emitted with the
    * covered tokens dropped (remaining tokens joined by single
    * spaces — tokenizer-canonical whitespace). A document whose spans
    * are all canonical (or that has none) passes through with only the
    * whitespace normalization.
    *
    * Shape at scale: document TEXT never rides an exchange. The
    * duplicated-start pass shuffles fixed-width `(gram_hash, doc_id,
    * pos)` rows (O(corpus tokens), same as [[duplicatedSpans]] — the
    * canonicity test is a `row_number` in the same gram-hash window
    * that already computes the frequency); removal spans collapse to
    * one small `(start, end)` list per affected document; and the
    * rewrite is one equi-join of that list back to the docs on the id
    * plus a row-local array filter over the token positions — no
    * token-level join, no per-token shuffle of strings.
    *
    * Output: (doc_id, clean_text, n_tokens, kept_tokens) for EVERY
    * input document (null text stays null with null counts).
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                            width: Int = 8): DataFrame = {
    Seq("__spans", "__rm_id").foreach(r =>
      require(!docs.columns.contains(r),
        s"column name $r is reserved by removeDuplicatedSpans"))
    val tokenHashes = transform(TextFunctions.tokens(col(textCol)),
      t => xxhash64(t))
    val grams = graft.functions.NativeExpressions.gramHashes(
      tokenHashes, width)
    val positioned = docs
      .select(col(idCol).as("doc_id"), posexplode(grams))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("gram_hash"))
    // row_number over the gram-hash partition: rank 1 = the canonical
    // (first by doc, pos) occurrence; any rank above 1 is by definition
    // a repeat of a duplicated gram — one window does both the
    // frequency test and the canonicity test
    val gw = Window.partitionBy("gram_hash").orderBy("doc_id", "pos")
    val starts = positioned
      .withColumn("__rn", row_number().over(gw))
      .filter(col("__rn") > 1)
      .select("doc_id", "pos")
    // same interval-merge as duplicatedSpans: starts p < q share a
    // maximal removal span iff q <= p + width
    val dw = Window.partitionBy("doc_id").orderBy("pos")
    val spans = starts
      .withColumn("__brk",
        when(col("pos") - lag("pos", 1).over(dw) > width, 1L).otherwise(0L))
      .withColumn("__grp", sum("__brk").over(
        dw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("__grp"))
      .agg(min("pos").as("s"), (max("pos") + (width - 1)).as("e"))
    val perDoc = spans.groupBy("doc_id")
      .agg(collect_list(struct(col("s"), col("e"))).as("__spans"))
      .withColumnRenamed("doc_id", "__rm_id")
    val toks = TextFunctions.tokens(col(textCol))
    // row-local rewrite: keep token i (1-based) iff no removal span
    // covers it; span order in the collected list is irrelevant (the
    // probe is an order-insensitive exists)
    val kept = filter(toks, (_, i) =>
      col("__spans").isNull ||
        !exists(col("__spans"), sp =>
          (i.cast("long") + 1) >= sp("s") && (i.cast("long") + 1) <= sp("e")))
    docs
      .join(perDoc, col(idCol) === col("__rm_id"), "left")
      .select(col(idCol).as("doc_id"),
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ", kept)).as("clean_text"),
        size(toks).cast("long").as("n_tokens"),
        size(kept).cast("long").as("kept_tokens"))
  }

  /** Per-document duplication profile: token count, tokens covered by
    * duplicated spans, and the duplicated fraction — the filter signal a
    * pipeline thresholds on (e.g. drop documents that are mostly
    * boilerplate). Documents with no duplicated span report 0/0.0.
    */
  def spanStats(docs: DataFrame, idCol: String, textCol: String,
                width: Int = 8): DataFrame = {
    val perDoc = duplicatedSpans(docs, idCol, textCol, width)
      .groupBy("doc_id")
      .agg(sum("span_tokens").as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    val sized = docs.select(col(idCol).as("doc_id"),
      size(TextFunctions.tokens(col(textCol))).cast("long").as("n_tokens"))
    sized.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        when(col("n_tokens") > 0,
          coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .otherwise(lit(0.0)).as("dup_fraction"))
  }
}
