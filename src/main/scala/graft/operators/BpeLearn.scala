package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** BPE merge learning (tokenizer vocabulary induction) — the training
  * side of the pipeline's token-counting surface (SURVEY §2.10): learn
  * the merge table a byte-pair-encoding tokenizer would use, from the
  * corpus itself.
  *
  * Shape at scale — the standard two-tier split every real tokenizer
  * trainer uses (word-type table, then local merge loop):
  *
  *  1. ONE distributed aggregation collapses the corpus to its word-
  *     type frequency table (whitespace tokens, exact counts; the
  *     shuffle carries word types, not occurrences, after map-side
  *     partials), capped to the `maxWords` most frequent types with a
  *     deterministic (count desc, word asc) order — the driver
  *     collect is bounded by construction, same stance as the IVF
  *     centroid / DSIR collects.
  *  2. The merge loop runs driver-local over that bounded table:
  *     count adjacent symbol pairs weighted by word frequency, take
  *     the argmax pair (ties: lexicographically smallest (left,
  *     right)), merge greedily left-to-right, repeat. O(types x
  *     avgLen) per merge — millions of types x tens of merges is
  *     seconds, and nothing else ever leaves the executors.
  *
  * Deterministic end to end: exact counts, total tie order, greedy
  * left-to-right application — re-runs and permuted corpora learn the
  * identical merge table. The first stage (initial character-pair
  * counts) is SQL-replayable and oracled (q_bpe_pairs); the iterative
  * argmax loop is not SQL-expressible, so it is pinned by
  * hand-computable specs instead (BpeLearnSpec).
  */
object BpeLearn {

  /** Adjacent character-pair counts over word types, weighted by word
    * frequency — iteration 0 of the merge loop, exposed as a frame
    * because it is the SQL-replayable (oracled) stage. Output:
    * (sym_left, sym_right, pair_count).
    */
  def initialPairCounts(docs: DataFrame, textCol: String): DataFrame = {
    val words = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
    // (left, right) = characters at 0-based positions (i, i+1);
    // substring is 1-based, so the right neighbor sits at i + 2
    words
      .select(col("w"), col("n"),
        posexplode(split(col("w"), "")).as(Seq("i", "l")))
      .filter(length(col("l")) > 0)
      .withColumn("r", expr("substring(w, i + 2, 1)"))
      .filter(length(col("r")) > 0)
      .groupBy(col("l").as("sym_left"), col("r").as("sym_right"))
      .agg(sum(col("n")).as("pair_count"))
  }

  /** Learn `nMerges` merges. Returns (rank, left, right), rank from 1,
    * possibly fewer than `nMerges` rows if the table runs out of
    * adjacent pairs.
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  maxWords: Int = 1000000): Seq[(Int, String, String)] = {
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    require(maxWords >= 1, s"maxWords must be >= 1, got $maxWords")
    val words = docs
      .select(explode(TF.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w")).limit(maxWords)
      .collect() // bounded by maxWords
    var seqs: Array[(Array[String], Long)] = words.map { r =>
      (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1))
    }
    val merges = Seq.newBuilder[(Int, String, String)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      seqs.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // argmax by count, ties to the lexicographically smallest pair
        // — a TOTAL order, so the learned table is unique
        val best = counts.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += ((rank, best._1, best._2))
        seqs = seqs.map { case (syms, n) =>
          if (syms.length < 2) (syms, n)
          else {
            val out = Array.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 &&
                  syms(i) == best._1 && syms(i + 1) == best._2) {
                out += syms(i) + syms(i + 1) // greedy left-to-right
                i += 2
              } else {
                out += syms(i)
                i += 1
              }
            }
            (out.result(), n)
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** [[learnMerges]] as a frame: (merge_rank, left, right). */
  def learnMergesDf(docs: DataFrame, textCol: String, nMerges: Int,
                    maxWords: Int = 1000000): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    learnMerges(docs, textCol, nMerges, maxWords)
      .toDF("merge_rank", "left", "right")
  }

  /** ENCODE with a (learned or fixed) merge table — the inference half
    * of the tokenizer surface: per document, whitespace words split to
    * characters, the merges applied in rank order greedily
    * left-to-right (the exact training update rule, via the native
    * [[graft.functions.NativeExpressions.BpeEncode]] expression).
    * Output (idCol, tokens: array<string>). Map-only: the merge table
    * rides inside the expression (plan reference object, broadcast
    * with the task binary), so the encode is a zero-shuffle scan at
    * any corpus size — token-count aggregation afterwards is the
    * caller's one shuffle.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame =
    docs.select(col(idCol),
      graft.functions.NativeExpressions.bpeEncode(
        TF.tokens(col(textCol)), merges).as("tokens"))

  /** Per-document encode statistics (idCol, n_words, n_tokens) — the
    * token-budget accounting shape (how many subword tokens does this
    * corpus cost under this vocabulary). Docs with no non-empty tokens
    * (NULL or blank text) emit no row — the UnigramLm convention, and
    * the oracle's GROUP-BY-over-words behavior.
    */
  def encodeStats(docs: DataFrame, idCol: String, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    val toks = TF.tokens(col(textCol))
    docs.select(col(idCol),
      size(filter(toks, w => length(w) > 0)).cast("long").as("n_words"),
      size(graft.functions.NativeExpressions.bpeEncode(toks, merges))
        .cast("long").as("n_tokens"))
      .filter(col("n_words") > 0)
  }
}
