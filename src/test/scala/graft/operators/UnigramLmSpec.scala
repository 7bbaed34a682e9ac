package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class UnigramLmSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")

  test("model: counts and log-probabilities over the corpus") {
    val m = UnigramLm.model(docs, "text")
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // a=2, b=2, c=1 over 5 token occurrences
    assert(m("a")._1 === 2L && m("b")._1 === 2L && m("c")._1 === 1L)
    assert(math.abs(m("a")._2 - math.log(0.4)) < 1e-12)
    assert(math.abs(m("c")._2 - math.log(0.2)) < 1e-12)
  }

  test("score: mean token log-prob; common-token docs outrank rare-token docs") {
    val s = UnigramLm.score(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(s(1L)._1 === 3L)
    assert(math.abs(s(1L)._2 - math.log(0.4)) < 1e-12)
    assert(math.abs(s(2L)._2 - (math.log(0.4) + math.log(0.2)) / 2) < 1e-12)
    assert(s(1L)._2 > s(2L)._2, "all-common doc must score higher")
  }

  test("scoreAgainst: unseen tokens take the floor, or drop without one") {
    val lm = UnigramLm.model(docs, "text")
    val eval = Seq((10L, "a zzz")).toDF("doc_id", "text")
    val floored = UnigramLm.scoreAgainst(eval, "doc_id", "text", lm,
        unseenLogp = Some(-20.0))
      .as[(Long, Long, Double)].collect().head
    assert(floored._2 === 2L)
    assert(math.abs(floored._3 - (math.log(0.4) + -20.0) / 2) < 1e-12)
    val dropped = UnigramLm.scoreAgainst(eval, "doc_id", "text", lm,
        unseenLogp = None)
      .as[(Long, Long, Double)].collect().head
    assert(dropped._2 === 1L)
    assert(math.abs(dropped._3 - math.log(0.4)) < 1e-12)
  }
}
