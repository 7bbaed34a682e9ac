package graft.operators

import graft.SparkTestBase

class VocabSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c"),
    (2L, "a b"),
    (3L, "a x"),
    (4L, "a a a") // repeated token: df counts the DOC once
  ).toDF("doc_id", "text")

  test("topTermsByDocFreq ranks by doc frequency, ties by term asc") {
    val got = Vocab.topTermsByDocFreq(docs, "text", 3)
      .as[(String, Long)].collect().toSeq
    // df: a=4, b=2, c=1, x=1 -> tie (c, x) broken by term asc
    assert(got === Seq(("a", 4L), ("b", 2L), ("c", 1L)))
  }

  test("oovStats counts OOV occurrences, not distinct OOV terms") {
    val rows = Vocab.oovStats(docs, "doc_id", "text", Seq("a", "b"))
      .select("doc_id", "n_tokens", "n_oov", "oov_rate")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(rows === Seq(
      (1L, 3L, 1L, 0.333333), // c is OOV
      (2L, 2L, 0L, 0.0),
      (3L, 2L, 1L, 0.5), // x is OOV
      (4L, 3L, 0L, 0.0)))
  }

  test("oovStats: null text emits no row, empty vocab rejected") {
    val withNull = Seq((1L, Option("a b")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    assert(Vocab.oovStats(withNull, "doc_id", "text", Seq("a")).count() === 1L)
    intercept[IllegalArgumentException] {
      Vocab.oovStats(docs, "doc_id", "text", Nil)
    }
  }

  test("oovStats scoring pass is map-only: zero shuffle at any corpus size") {
    val p = Vocab.oovStats(docs, "doc_id", "text", Seq("a"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"scoring must not shuffle:\n$p")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
  }

  test("oovAgainstTopTerms composes: full vocab -> zero OOV everywhere") {
    val got = Vocab.oovAgainstTopTerms(spark, docs, "doc_id", "text", 10)
      .select("n_oov").as[Long].collect()
    assert(got.forall(_ === 0L))
  }
}
