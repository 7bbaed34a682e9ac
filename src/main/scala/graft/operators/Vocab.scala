package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Tokenizer-vocabulary coverage (SURVEY §2.10): how well does a fixed
  * vocabulary cover a corpus? The operational question behind "will
  * this tokenizer fragment my training data" — per-document OOV token
  * rates against a top-V document-frequency vocabulary.
  *
  * Scale design: the vocabulary is a bounded top-V (heap top-k through
  * `orderBy.limit`, so the exchange carries V rows per partition, never
  * the term space), collected once to the driver (V entries — the same
  * bounded-collect contract as the IVF centroid and DSIR bucket
  * tables) and baked into the scoring pass as an array literal. Scoring
  * is then MAP-ONLY: `filter(tokens, !array_contains(vocab, t))` — no
  * token explosion, no join, zero shuffle at any corpus size. The
  * O(n_tokens * V) membership probe is the right trade below a few
  * thousand vocab entries; above that, swap the literal for a
  * broadcast-joined explode.
  */
object Vocab {

  /** Top-`n` terms by document frequency (distinct docs containing the
    * term), ties broken by term ascending — fully deterministic, so an
    * external engine replays the same set.
    */
  def topTermsByDocFreq(docs: DataFrame, textCol: String, n: Int): DataFrame =
    docs.select(explode(array_distinct(TextFunctions.tokens(col(textCol))))
        .as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(n)

  /** Per-document OOV statistics against an explicit vocabulary:
    * token count, OOV occurrence count, and the OOV rate. Documents
    * with no tokens emit `oov_rate` NULL (0/0), preserved as-is.
    */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               vocabulary: Seq[String]): DataFrame = {
    require(vocabulary.nonEmpty, "vocabulary must not be empty")
    val vocab = lit(vocabulary.toArray)
    val ts = TextFunctions.tokens(col(textCol))
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol),
        size(ts).cast("long").as("n_tokens"),
        size(filter(ts, t => !array_contains(vocab, t))).cast("long")
          .as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov") / col("n_tokens"), 6))
  }

  /** The composed catalog shape: learn the top-`vocabSize` vocabulary
    * from the corpus itself, then score every document against it.
    * The driver collect is bounded at `vocabSize` rows by construction.
    */
  def oovAgainstTopTerms(spark: SparkSession, docs: DataFrame,
                         idCol: String, textCol: String,
                         vocabSize: Int): DataFrame = {
    val vocab = topTermsByDocFreq(docs, textCol, vocabSize)
      .collect().map(_.getString(0)).toSeq
    oovStats(docs, idCol, textCol, vocab)
  }
}
