package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TfIdfSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry durian cherry cherry")).toDF("doc_id", "text")

  test("tfIdf computes tf, df and ln-weighted score on a fixture") {
    val out = TfIdf.tfIdf(docs, "doc_id", "text", maxDocFreqRatio = None)
      .select("doc_id", "term", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4, t._5))).toMap
    // N = 3 docs; apple: df 1, tf 2 in doc 1
    val (tf, df, w) = out((1L, "apple"))
    assert(tf === 2L && df === 1L)
    assert(math.abs(w - 2.0 * math.log(3.0 / 1.0)) < 1e-12)
    // banana appears in docs 1 and 2 -> df 2
    assert(out((2L, "banana"))._2 === 2L)
    // cherry tf 3 in doc 3
    assert(out((3L, "cherry"))._1 === 3L)
    assert(out.size === 6)
  }

  test("maxDocFreqRatio drops terms above the document-frequency cap") {
    val hot = Seq((1L, "the x"), (2L, "the y"), (3L, "the z"), (4L, "the w"))
      .toDF("doc_id", "text")
    val terms = TfIdf.tfIdf(hot, "doc_id", "text", maxDocFreqRatio = Some(0.5))
      .select("term").as[String].collect().toSet
    assert(!terms.contains("the"), "df-capped term survived")
    assert(terms === Set("x", "y", "z", "w"))
  }

  test("topTerms equals window-ranked tf-idf") {
    val big = (1L to 50L).map(i =>
      (i, s"tok${i % 7} tok${i % 5} tok${i % 5} tok${i % 3} shared"))
      .toDF("doc_id", "text")
    val expected = {
      // topTerms ranks on round(tfidf, 6) — mirror that here
      val w = Window.partitionBy("doc_id")
        .orderBy(round(col("tfidf"), 6).desc, col("term"))
      TfIdf.tfIdf(big, "doc_id", "text", None)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 2)
        .select("doc_id", "term", "rank")
        .as[(Long, String, Long)].collect().toSet
    }
    val actual = TfIdf.topTerms(big, "doc_id", "text", k = 2, None)
      .select("doc_id", "term", "rank")
      .as[(Long, String, Long)].collect().toSet
    assert(actual === expected)
  }

  test("docSimilarity: a verbatim copy ranks first at cosine 1.0") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (0L, "spark shuffle join window"),
      (1L, "spark shuffle join window"),    // exact copy of the probe
      (2L, "spark shuffle sort merge"),     // partial overlap
      (3L, "entirely different words here")
    ).toDF("doc_id", "text")
    val got = TfIdf.docSimilarity(docs, "doc_id", "text",
        probeFilter = col("doc_id") === 0, k = 3, maxDocFreqRatio = None)
      .select("doc_a", "doc_b", "rank", "cosine")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._3 -> (r._2, r._4)).toMap
    assert(got(1L)._1 === 1L, s"the copy must rank first: $got")
    assert(got(1L)._2 === 1.0, "identical sparse vectors score exactly 1")
    // doc 3 shares no term with the probe -> no pair at all
    assert(!got.values.exists(_._1 == 3L), "disjoint docs never pair")
  }

  test("docSimilarity: probe filter bounds the pair stream") {
    import org.apache.spark.sql.functions.col
    val docs = (0L to 20L).map(i => (i, s"shared token plus t$i"))
      .toDF("doc_id", "text")
    val got = TfIdf.docSimilarity(docs, "doc_id", "text",
        probeFilter = col("doc_id") < 2, k = 50, maxDocFreqRatio = None)
      .select("doc_a").as[Long].collect()
    assert(got.toSet === Set(0L, 1L), "only probe rows emit")
  }
}
