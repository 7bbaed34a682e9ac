package graft.operators

import graft.SparkTestBase

class CorpusDivergenceSpec extends SparkTestBase {
  import spark.implicits._

  test("sourceKl matches the hand-computed divergence") {
    val docs = Seq(
      ("A", "a a b"),
      ("B", "a b b b")
    ).toDF("source", "text")
    val gotMap = CorpusDivergence.sourceKl(docs, "source", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // corpus: a=3, b=4, total=7
    val klA = 2.0 / 3 * math.log((2.0 / 3) / (3.0 / 7)) +
      1.0 / 3 * math.log((1.0 / 3) / (4.0 / 7))
    val klB = 1.0 / 4 * math.log((1.0 / 4) / (3.0 / 7)) +
      3.0 / 4 * math.log((3.0 / 4) / (4.0 / 7))
    assert(gotMap("A")._1 === 3L)
    assert(gotMap("B")._1 === 4L)
    assert(math.abs(gotMap("A")._2 - klA) < 1e-6, s"A: ${gotMap("A")._2} vs $klA")
    assert(math.abs(gotMap("B")._2 - klB) < 1e-6, s"B: ${gotMap("B")._2} vs $klB")
  }

  test("a single source diverges from the corpus by exactly zero") {
    val docs = Seq(("only", "x y z x")).toDF("source", "text")
    val kl = CorpusDivergence.sourceKl(docs, "source", "text")
      .select("kl").as[Double].head()
    assert(kl === 0.0)
  }

  test("docNovelty: shared grams scored 0, unique grams 1, short docs dropped") {
    val docs = Seq(
      (1L, "a b c d"),   // grams: abc, bcd — abc shared with doc 2
      (2L, "a b c x"),   // grams: abc, bcx
      (3L, "p q r s t"), // all unique
      (4L, "a b")        // no 3-grams -> no row
    ).toDF("doc_id", "text")
    val got = CorpusDivergence.docNovelty(docs, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((3L, 3L, 1.0)))
    assert(!got.contains(4L), "docs below one shingle emit no row")
  }

  test("null-text docs contribute nothing") {
    val docs = Seq(
      ("A", Option("a b")), ("A", Option.empty[String]), ("B", Option("a b"))
    ).toDF("source", "text")
    val got = CorpusDivergence.sourceKl(docs, "source", "text")
      .select("kl").as[Double].collect()
    assert(got.forall(_ === 0.0), "identical distributions must both be 0")
  }
}
