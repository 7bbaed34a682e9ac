package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** TF-IDF term weighting over a document corpus (SURVEY §2.10 text
  * analysis — the feature-extraction step of classic quality filtering
  * and near-dup scoring pipelines).
  *
  * Shape at scale: one explode of the tokenized corpus, one shuffle to
  * (doc, term) for term frequencies, one shuffle to term for document
  * frequencies, then an equi-join tf ⋈ df on term. The corpus size N
  * rides along as a broadcast single-row aggregate — never a
  * driver-side `count()` baked into the plan as a literal, so the same
  * lineage works for any input without re-planning. Nothing here is
  * quadratic; the df table is vocabulary-sized and the tf⋈df join key
  * (term) is the only potentially skewed axis — `maxDocFreqRatio`
  * exists to drop stopword-grade terms, which is both the statistical
  * intent of IDF and the skew defusal.
  */
object TfIdf {

  /** Per-(document, term) TF-IDF: `tf` = raw term count in the doc,
    * `df` = number of docs containing the term, weight
    * `tfidf = tf * ln(N / df)`.
    *
    * @param maxDocFreqRatio drop terms appearing in more than this
    *   fraction of documents (stopword cap; also bounds join skew on
    *   hot terms). None = keep everything (exact, oracle-comparable).
    */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String,
            maxDocFreqRatio: Option[Double] = Some(0.5)): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TF.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("__n"))
    val joined = tf.join(df, "term").crossJoin(broadcast(n))
    val capped = maxDocFreqRatio match {
      case Some(r) => joined.filter(col("df") <= col("__n") * lit(r))
      case None    => joined
    }
    capped.select(col("doc_id"), col("term"), col("tf"), col("df"),
      (col("tf") * log(col("__n").cast("double") / col("df"))).as("tfidf"))
  }

  /** Top `k` terms per document by TF-IDF (deterministic tiebreak on
    * term), truncated map-side via the typed top-k aggregator — the
    * exchange carries O(docs × k) rows, not the full (doc, term)
    * matrix. Returns (doc_id, term, rank, score).
    *
    * Ranks on the score ROUNDED to `roundScoreTo` decimals by default:
    * raw `ln`-derived weights can differ in the last ulp across
    * engines/libm versions, which would make near-tie rankings
    * irreproducible; rounding first pushes ties onto the deterministic
    * term tiebreak. Pass None to rank on the raw weight.
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
               maxDocFreqRatio: Option[Double] = Some(0.5),
               roundScoreTo: Option[Int] = Some(6)): DataFrame = {
    val scoreExpr = roundScoreTo.fold(col("tfidf"))(round(col("tfidf"), _))
    val scored = tfIdf(docs, idCol, textCol, maxDocFreqRatio)
      .select(col("doc_id"), col("term"), scoreExpr.as("score"))
    graft.functions.TopKAggregator.groupedTopK(
      scored, groupCol = "doc_id", idCol = "term", scoreCol = "score", k = k)
  }
}
