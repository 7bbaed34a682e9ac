package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Bigram language-model scoring (SURVEY §2.10 text analysis): the
  * next step up from [[UnigramLm]] toward the KenLM-style perplexity
  * filters corpus pipelines run — a conditional model p(w2 | w1) that
  * a unigram model cannot express: "the the the" scores as corpus-
  * typical under unigrams but collapses under bigram conditionals.
  *
  * Model: for each adjacent token pair (w1, w2),
  * p(w2 | w1) = n(w1 w2) / n(w1·), where n(w1·) is the count of
  * occurrences of w1 as a bigram START (i.e. excluding each document's
  * final token) — so the conditional distribution over observed
  * successors of w1 sums to exactly 1 and no smoothing mass is needed
  * when model corpus = scored corpus. Score = mean over a document's
  * bigram OCCURRENCES of ln p(w2 | w1); ppl = exp(-score).
  *
  * Contract (the [[UnigramLm]] stance): a document with fewer than two
  * tokens has no bigrams and emits NO row — "unscorable" is distinct
  * from "low quality". [[scoreAgainst]] exposes the two-corpus form
  * where unseen bigrams take a floor log-probability.
  *
  * Shape at scale: the bigram expansion is the native one-pass
  * [[graft.functions.NativeExpressions.NgramArray]] (no per-token
  * closure dispatch), the model is one (bigram) aggregation plus one
  * (w1) re-aggregation derived FROM the bigram counts (no second scan
  * of the corpus), and scoring is an equi-join of bigram occurrences
  * against the vocabulary²-bounded model — in practice the observed
  * bigram table, which Zipf keeps far under |V|². Nothing quadratic;
  * the model side is the smaller join input, broadcastable when the
  * observed-bigram table is.
  */
object BigramLm {

  /** (bigram, n, logp) conditional bigram model of a corpus. `bigram`
    * is the space-joined pair (tokens never contain whitespace, so the
    * join is unambiguous).
    */
  def model(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs
      .select(explode(TF.ngrams(col(textCol), 2)).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
    // context totals n(w1·) derived from the bigram counts themselves:
    // sum of n over bigrams starting with w1 == occurrences of w1 in
    // bigram-start position. One small re-aggregation, no corpus scan.
    val ctx = counts
      .select(substring_index(col("bigram"), " ", 1).as("w1"), col("n"))
      .groupBy("w1").agg(sum("n").as("ctx_n"))
    counts
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .join(ctx, Seq("w1"))
      .select(col("bigram"), col("n"),
        log(col("n").cast("double") / col("ctx_n")).as("logp"))
  }

  /** Score each document against the bigram model of the corpus
    * itself: (doc_id, n_bigrams, logprob = mean ln p(w2|w1)).
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreAgainst(docs, idCol, textCol, model(docs, textCol),
      unseenLogp = None)

  /** Score against an external bigram model. Bigrams absent from the
    * model take `unseenLogp` when given (None drops them from the mean
    * — only sound when the model covers the scored corpus).
    */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
                   lm: DataFrame, unseenLogp: Option[Double]): DataFrame = {
    val occurrences = docs.select(col(idCol).as("doc_id"),
      explode(TF.ngrams(col(textCol), 2)).as("bigram"))
    val joined = unseenLogp match {
      case Some(floor) => occurrences
        .join(lm.select("bigram", "logp"), Seq("bigram"), "left_outer")
        .withColumn("logp", coalesce(col("logp"), lit(floor)))
      case None => occurrences.join(lm.select("bigram", "logp"), Seq("bigram"))
    }
    joined.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      avg("logp").as("logprob"))
  }
}
