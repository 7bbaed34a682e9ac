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
    * banding/contamination identity — no string shingles on the wire).
    * A doc-frequency-1 gram belongs to exactly ONE doc, so df and the
    * owner come out of a single (count, min) aggregation on the gram
    * key and the gram stream never has to flow BACK to documents — the
    * first version's count-window did that and WindowExec fully sorts
    * every exploded partition (56 GB memory spill at the 50 M-doc /
    * 500 M-gram stress tier); hash aggregation over the same exchange
    * holds only fixed-width (key, count, min) buffers. The df = 1
    * survivors re-aggregate on the owner doc (partial combine shrinks
    * them to ≤ one row per doc before the exchange), and the per-doc
    * gram counts come map-only from the un-exploded array, so the
    * three exchanges all carry skinny bounded rows.
    */
  def docNovelty(docs: DataFrame, idCol: String, textCol: String,
                 shingleSize: Int = 3): DataFrame = {
    val tokenHashes =
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
    val grams = array_distinct(
      NativeExpressions.gramHashes(tokenHashes, shingleSize))
    // one row per doc that HAS grams (explode used to drop gram-less
    // docs; the size filter keeps that contract, null-safely)
    val perDoc = docs.select(col(idCol), grams.as("__gs"))
      .filter(size(col("__gs")) > 0)
    val nGrams = perDoc
      .select(col(idCol), size(col("__gs")).cast("long").as("n_grams"))
    // exchange FIRST, aggregate after: n-grams are mostly unique, so a
    // pre-exchange partial aggregate combines ~nothing while its hash
    // map fills with (exploded rows / SCAN partitions) keys — at the
    // 50 M-doc tier that's ~15 M entries per task (the scan side is
    // core-count-partitioned however the reducer side is sized) and
    // the map's sort-fallback was the remaining 35 GB spill. Behind an
    // explicit gram repartition both aggregation passes run over
    // co-located grams with reducer-sized (rows / shuffle partitions)
    // maps, which the corpus-scaled partition sizing keeps in memory.
    val uniques = perDoc
      .select(col(idCol), explode(col("__gs")).as("__g"))
      .repartition(col("__g"))
      .groupBy("__g")
      .agg(count(lit(1)).as("__df"), min(col(idCol)).as("__owner"))
      .filter(col("__df") === 1) // df = 1 -> __owner IS the one holder
      .groupBy(col("__owner").as(idCol))
      .agg(count(lit(1)).as("n_unique"))
    nGrams.join(uniques, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .select(col(idCol), col("n_grams"), col("n_unique"),
        round(col("n_unique") / col("n_grams"), 6).as("novelty"))
  }
}
