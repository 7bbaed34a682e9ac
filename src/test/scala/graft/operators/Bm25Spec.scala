package graft.operators

import graft.SparkTestBase

class Bm25Spec extends SparkTestBase {
  import spark.implicits._

  // avgdl = 4; "cat" appears in 2 of 4 docs, "dog" in 1 of 4
  private val docs = Seq(
    (0L, "cat cat dog fish"),
    (1L, "cat bird bird bird"),
    (2L, "fish fish bird worm"),
    (3L, "worm worm worm worm")
  ).toDF("doc_id", "text")

  private def idf(n: Int, df: Int): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  private def w(tf: Long, dl: Long, avgdl: Double,
                k1: Double = 1.2, b: Double = 0.75): Double =
    tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))

  test("matches the hand-computed BM25 formula") {
    val out = Bm25.bm25TopK(docs, "doc_id", "text",
        Seq("cat", "dog"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 shares no query term -> absent
    assert(out.keySet === Set(0L, 1L))
    val exp0 = idf(4, 2) * w(2, 4, 4.0) + idf(4, 1) * w(1, 4, 4.0)
    val exp1 = idf(4, 2) * w(1, 4, 4.0)
    assert(math.abs(out(0L) - exp0) < 1e-6, s"${out(0L)} vs $exp0")
    assert(math.abs(out(1L) - exp1) < 1e-6, s"${out(1L)} vs $exp1")
    assert(out(0L) > out(1L))
  }

  test("k truncates with (score desc, doc_id asc) order") {
    val out = Bm25.bm25TopK(docs, "doc_id", "text",
        Seq("cat", "dog"), k = 1).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(0L))
  }

  test("rejects an empty query") {
    intercept[IllegalArgumentException] {
      Bm25.bm25TopK(docs, "doc_id", "text", Nil, k = 5)
    }
  }
}
