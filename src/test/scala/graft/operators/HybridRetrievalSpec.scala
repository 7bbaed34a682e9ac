package graft.operators

import graft.SparkTestBase

class HybridRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
  private val sem = Seq((20L, 1), (40L, 2), (10L, 3)).toDF("doc_id", "rank")

  test("matches the hand-computed RRF formula with c = 60") {
    val out = HybridRetrieval.rrfFuse(Seq(lex, sem), "doc_id", "rank",
        k = 10)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    def rrf(ranks: Seq[Int]): Double =
      BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L) === ((rrf(Seq(1, 3)), 2L)))
    assert(out(20L) === ((rrf(Seq(2, 1)), 2L)))
    assert(out(30L) === ((rrf(Seq(3)), 1L)))
    assert(out(40L) === ((rrf(Seq(2)), 1L)))
    // both-list ids must outrank single-list ids at these depths
    assert(out(20L)._1 > out(40L)._1)
  }

  test("k truncates by (score desc, id asc)") {
    val out = HybridRetrieval.rrfFuse(Seq(lex, sem), "doc_id", "rank",
        k = 2).collect().map(_.getLong(0)).toSeq
    // 20: 1/62+1/61 = .032524; 10: 1/61+1/63 = .032266 -> top-2
    assert(out === Seq(20L, 10L))
  }

  test("a single ranking degenerates to its own order") {
    val out = HybridRetrieval.rrfFuse(Seq(lex), "doc_id", "rank", k = 3)
      .collect().map(_.getLong(0)).toSeq
    assert(out === Seq(10L, 20L, 30L))
  }

  test("rejects empty input") {
    intercept[IllegalArgumentException] {
      HybridRetrieval.rrfFuse(Nil, "doc_id", "rank", k = 5)
    }
  }

  test("ragContext: rank-ordered concatenation, partition-order independent") {
    val ranking = Seq(
      (100L, 3L, 2L), (100L, 7L, 1L), (100L, 5L, 3L), // probe 100: 7,3,5
      (200L, 5L, 1L)
    ).toDF("probe_id", "doc_id", "rank")
    val docs = Seq(
      (3L, "second doc"), (5L, "third doc"), (7L, "first doc")
    ).toDF("doc_id", "text")
    def run(r: org.apache.spark.sql.DataFrame) = HybridRetrieval
      .ragContext(r, docs, "probe_id", "doc_id", "rank", "text")
      .select("probe_id", "n_docs", "total_tokens", "context")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val got = run(ranking)
    assert(got(100L) === ((3L, 6L, "first doc\n\nsecond doc\n\nthird doc")))
    assert(got(200L) === ((1L, 2L, "third doc")))
    // the collect is struct-sorted, so input partitioning cannot
    // reorder the blob
    assert(run(ranking.repartition(7)) === got)
  }
}
