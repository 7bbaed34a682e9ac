package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Unigram language-model scoring (SURVEY §2.10 text analysis): the
  * cheap stand-in for the KenLM-perplexity quality filters corpus
  * pipelines run — a document whose tokens are all corpus-typical
  * scores high; gibberish and boilerplate-with-rare-symbols score low.
  *
  * Score = mean over token OCCURRENCES of ln p(token), with
  * p(token) = corpus_count(token) / corpus_total. (Mean log-prob is
  * monotone in perplexity: ppl = exp(-score).) Every token in a scored
  * doc exists in the corpus it was counted from, so no smoothing term
  * is needed when model corpus = scored corpus; `scoreAgainst` exposes
  * the two-corpus form where unseen tokens take a floor probability.
  *
  * Shape at scale: one explode, one (term) aggregation for the model,
  * a broadcast single-row total, an equi-join of token occurrences
  * against the vocabulary-sized model on `term`, one (doc) aggregation.
  * Nothing quadratic; the model side is the smaller join input and
  * broadcastable when the vocabulary is.
  */
object UnigramLm {

  /** (term, n, logp) unigram model of a corpus. */
  def model(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs.select(explode(TF.tokens(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__total"))
    counts.crossJoin(broadcast(total))
      .select(col("term"), col("n"),
        log(col("n").cast("double") / col("__total")).as("logp"))
  }

  /** Score each document against a unigram model built from the corpus
    * itself: (idCol, n_tokens, logprob = mean ln p(token)).
    *
    * Contract: a document that yields NO tokens (null or empty text)
    * emits NO row — "unscorable" is distinct from "low quality", and a
    * mean log-prob over zero tokens has no meaningful value. Pipelines
    * thresholding on logprob should left-join the scores back and
    * decide the no-row case explicitly (drop, keep, or route to a
    * separate queue) rather than receive a fabricated score.
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    scoreAgainst(docs, idCol, textCol, model(docs, textCol),
      unseenLogp = None)

  /** Score against an external model. Tokens absent from the model take
    * `unseenLogp` when given (None drops them from the mean — only
    * sound when the model covers the scored corpus, as in [[score]]).
    */
  def scoreAgainst(docs: DataFrame, idCol: String, textCol: String,
                   lm: DataFrame, unseenLogp: Option[Double]): DataFrame = {
    val occurrences = docs.select(col(idCol).as("doc_id"),
      explode(TF.tokens(col(textCol))).as("term"))
    val joined = unseenLogp match {
      case Some(floor) => occurrences
        .join(lm.select("term", "logp"), Seq("term"), "left_outer")
        .withColumn("logp", coalesce(col("logp"), lit(floor)))
      case None => occurrences.join(lm.select("term", "logp"), Seq("term"))
    }
    joined.groupBy("doc_id").agg(
      count(lit(1)).as("n_tokens"),
      avg("logp").as("logprob"))
  }
}
