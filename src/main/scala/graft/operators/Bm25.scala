package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** BM25 (Okapi) ranked retrieval over a document corpus — the standard
  * lexical scorer for query-driven corpus curation (e.g. pulling
  * topic-matched training subsets, or the lexical leg of a hybrid
  * lexical+embedding retrieval stack). SURVEY §2.10 text analysis; no
  * reference citation (the reference has no retrieval surface).
  *
  * Shape at scale: one explode of the tokenized corpus, one (doc)
  * aggregation for lengths, one (doc, term) aggregation restricted to
  * the query's terms, then joins whose build sides are all tiny by
  * construction — `df` has at most |query| rows and the corpus-level
  * (N, avgdl) statistics are a single-row aggregate, both broadcast.
  * The only full-corpus shuffles are the two aggregations; the final
  * top-k is a `TakeOrderedAndProject` (per-partition heaps, O(k)
  * driver rows), never a global sort.
  *
  * Determinism/parity: per-term contributions are summed per doc and
  * ROUNDED to `roundScoreTo` decimals before ranking (the q_lm_quality
  * sum-of-ln precedent); rank ties after rounding break on doc_id.
  */
object Bm25 {

  /** Top `k` documents by BM25 score for a bag-of-words query.
    *
    * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  (the Lucene form —
    * never negative, monotone in df), tf saturation with the classic
    * (k1, b) length normalization. Docs sharing no term with the query
    * score nothing and are never materialized (inner joins throughout).
    * N and avgdl count only docs with at least one token — identical
    * on both sides of the oracle by construction.
    *
    * Returns (doc_id, score).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               roundScoreTo: Int = 6): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    require(k > 0, s"k must be positive, got $k")
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TF.tokens(col(textCol))).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    // single-row corpus statistics ride along as a broadcast, not a
    // driver count() literal — same lineage for any input
    val stats = dl.agg(avg(col("dl")).as("__avgdl"),
      count(lit(1)).as("__n"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("__c",
        log(lit(1.0) +
            (col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + lit(b) * col("dl") / col("__avgdl"))))
    contrib.groupBy("doc_id")
      .agg(round(sum(col("__c")), roundScoreTo).as("score"))
      .orderBy(col("score").desc, col("doc_id")).limit(k)
  }
}
