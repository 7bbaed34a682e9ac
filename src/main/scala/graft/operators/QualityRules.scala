package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Rule-based document quality filtering in the style of the Gopher
  * rules (Rae et al. 2021, appendix A1) — the hard-threshold
  * structural filters web-scale corpus pipelines run BEFORE any
  * model-based scoring ([[CorpusScoring]], [[UnigramLm]]): word-count
  * window, mean-word-length window, symbol-to-word ratio, alphabetic-
  * word fraction, and a minimum count of distinct common stopwords
  * (the "closed-class word" signal that separates prose from tag soup
  * and lists).
  *
  * Unlike the scalar [[TF.qualityScore]] (a blended score for
  * ranking), this emits each rule's measured value plus the per-rule
  * verdict folded into a single `keep` flag — pipelines audit WHICH
  * rule rejected a document, so the intermediate columns are the
  * product, not debris.
  *
  * Shape at scale: strictly map-only — one tokenize + one native
  * TokenStats pass per row, plus O(#stopwords) array-membership
  * probes; no shuffle, no UDFs, fully codegen'd. At 100 TB this is an
  * I/O-bound scan, which is exactly what a first-pass filter must be.
  */
object QualityRules {

  /** Default thresholds (Gopher-flavored, tuned so synthetic test
    * corpora exercise both branches of every rule that can vary).
    */
  val minWords = 10L
  val maxWords = 5000L
  val minMeanWordLen = 3.0
  val maxMeanWordLen = 10.0
  val maxSymbolRatio = 0.1
  val minAlphaFrac = 0.8
  val minStopHits = 2L

  /** Per-document rule measurements and the conjunctive keep flag:
    * (idCol, n_words, mean_word_len, symbol_ratio, alpha_frac,
    * stop_hits, keep). `stop` is the closed-class probe list;
    * `stop_hits` counts how many DISTINCT entries occur in the
    * document (order-insensitive membership, not occurrences).
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String,
                  stop: Seq[String]): DataFrame = {
    require(stop.nonEmpty, "gopherRules needs a non-empty stopword list")
    val withToks = docs.select(col(idCol), col(textCol).as("__text"),
      TF.tokens(col(textCol)).as("__toks"))
    val n = size(col("__toks")).cast("long")
    val meanLen = TF.meanTokenLenOf(col("__toks"))
    // '#' occurrences + '...' occurrences, per the Gopher symbol rule;
    // counted by length difference so it stays a pure codegen'd
    // expression both here and in external SQL engines
    def occurrences(needle: String): Column =
      (length(col("__text")) -
        length(call_function("replace", col("__text"), lit(needle), lit("")))) /
        lit(needle.length)
    val symbolRatio = (occurrences("#") + occurrences("..."))
      .cast("double") / greatest(n, lit(1L)).cast("double")
    // letter-containing tokens counted as letter-containing \S+ runs
    // (identical set, since tokens ARE the \S+ runs): a codegen'd
    // regexp_extract_all size instead of an interpreted per-token
    // ArrayFilter+rlike lambda
    val alphaFrac = size(regexp_extract_all(col("__text"),
      lit("\\S*[A-Za-z]\\S*"), lit(0))).cast("double") /
      greatest(n, lit(1L)).cast("double")
    val stopHits = stop.distinct.sorted
      .map(w => when(array_contains(col("__toks"), w), 1L).otherwise(0L))
      .reduce(_ + _)
    withToks.select(
      col(idCol),
      n.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(alphaFrac, 6).as("alpha_frac"),
      stopHits.as("stop_hits"),
      (n.between(minWords, maxWords) &&
        meanLen.between(minMeanWordLen, maxMeanWordLen) &&
        symbolRatio <= maxSymbolRatio &&
        alphaFrac >= minAlphaFrac &&
        stopHits >= minStopHits).cast("long").as("keep"))
  }
}
