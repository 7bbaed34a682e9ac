package graft.operators

import graft.SparkTestBase

class BigramLmSpec extends SparkTestBase {
  import spark.implicits._

  // bigrams: doc0 -> "a b","b a","a b","b c"; doc1 -> "a b"; doc2 -> none
  // model: n("a b")=3, n("b a")=1, n("b c")=1
  // contexts: n(a·)=3, n(b·)=2  =>  p(b|a)=1, p(a|b)=1/2, p(c|b)=1/2
  private val docs = Seq(
    (0L, "a b a b c"),
    (1L, "a b"),
    (2L, "c")
  ).toDF("doc_id", "text")

  test("conditional probabilities match the hand-computed model") {
    val m = BigramLm.model(docs, "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m.keySet === Set("a b", "b a", "b c"))
    assert(m("a b")._1 === 3L)
    assert(math.abs(m("a b")._2 - 0.0) < 1e-12)             // ln 1
    assert(math.abs(m("b a")._2 - math.log(0.5)) < 1e-12)
    assert(math.abs(m("b c")._2 - math.log(0.5)) < 1e-12)
  }

  test("per-document mean conditional log-prob; <2-token docs emit no row") {
    val out = BigramLm.score(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet === Set(0L, 1L), "doc 2 has no bigrams -> no row")
    assert(out(0L)._1 === 4L)
    // (ln1 + ln.5 + ln1 + ln.5) / 4
    assert(math.abs(out(0L)._2 - math.log(0.5) / 2) < 1e-12)
    assert(out(1L)._1 === 1L)
    assert(math.abs(out(1L)._2 - 0.0) < 1e-12)
  }

  test("cross-corpus scoring floors unseen bigrams") {
    val probe = Seq((9L, "a z")).toDF("doc_id", "text")
    val lm = BigramLm.model(docs, "text")
    val floored = BigramLm.scoreAgainst(probe, "doc_id", "text", lm,
      unseenLogp = Some(-20.0)).collect()
    assert(floored.length === 1)
    assert(floored.head.getLong(1) === 1L)
    assert(math.abs(floored.head.getDouble(2) - (-20.0)) < 1e-12)
    // and the no-floor form drops the unseen bigram -> no row at all
    assert(BigramLm.scoreAgainst(probe, "doc_id", "text", lm,
      unseenLogp = None).collect().isEmpty)
  }
}
