package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{NativeExpressions, TextFunctions}

/** Corpus-mix divergence diagnostics (SURVEY §2.10): how far does each
  * source's unigram distribution sit from the corpus-wide one? The
  * KL(source || corpus) table is the first thing a data-mixing run
  * checks — a source with high divergence dominates or fights the mix.
  *
  * Scale design: one shuffle on (source, term) for the base counts,
  * then per-term corpus counts and per-source totals as count windows
  * OVER that aggregated table (keyed on term / source — vocabulary-
  * bounded, never corpus-bounded), and the corpus total as a single-row
  * broadcast cross join. No exchange ever carries document text, and
  * nothing aggregates on an unbounded key.
  */
object CorpusDivergence {

  /** Per-source token volume and KL(source || corpus) over unigram
    * distributions, both rounded to 6 decimals. Smoothing-free by
    * construction: every source term IS a corpus term, so
    * p_corpus(t) > 0 wherever p_source(t) > 0.
    */
  def sourceKl(docs: DataFrame, sourceCol: String, textCol: String)
      : DataFrame = {
    val counts = docs
      .filter(col(textCol).isNotNull)
      .select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("source", "term").agg(count(lit(1)).as("n"))
    val enriched = counts
      .withColumn("n_term", sum("n").over(Window.partitionBy("term")))
      .withColumn("n_source", sum("n").over(Window.partitionBy("source")))
    val total = enriched
      .groupBy().agg(sum("n").as("n_total"))
    enriched.join(broadcast(total))
      .select(col("source"), col("n_source"),
        ((col("n") / col("n_source")) *
          log((col("n") / col("n_source")) /
            (col("n_term") / col("n_total")))).as("__kl_t"))
      .groupBy("source").agg(
        max("n_source").cast("long").as("n_tokens"),
        round(sum("__kl_t"), 6).as("kl"))
  }

  /** Per-document novelty: the fraction of a doc's distinct n-gram
    * shingles that occur NOWHERE else in the corpus (document frequency
    * exactly 1) — high novelty = original content, low = boilerplate /
    * near-dup / template mass. The memorization-risk complement of the
    * dedup tier: it scores every doc instead of dropping pairs.
    *
    * Scale design: gram identity is the one-pass native hash (the
    * banding/contamination identity — no string shingles on the wire);
    * document frequency is a count window OVER the exploded table's own
    * gram exchange (the q_lsh_recall cap pattern), then one re-keyed
    * aggregation on doc. Two bounded-key shuffles, zero joins.
    */
  def docNovelty(docs: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3): DataFrame = {
    val tokenHashes =
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
    val grams = array_distinct(
      NativeExpressions.gramHashes(tokenHashes, shingleSize))
    docs
      .select(col(idCol), explode(grams).as("__g"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy("__g")))
      .groupBy(idCol).agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__df") === 1, 1L).otherwise(0L)).as("n_unique"))
      .select(col(idCol), col("n_grams"), col("n_unique"),
        round(col("n_unique") / col("n_grams"), 6).as("novelty"))
  }
}
