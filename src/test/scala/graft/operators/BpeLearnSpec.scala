package graft.operators

import graft.SparkTestBase

class BpeLearnSpec extends SparkTestBase {
  import spark.implicits._

  test("learns the hand-computed merge table") {
    // word counts: ab x3, abc x1. Pair counts: (a,b) = 4, (b,c) = 1.
    // merge 1 = (a,b); after it the types are [ab] x3 and [ab, c] x1,
    // so merge 2 = (ab, c); then no adjacent pairs remain
    val docs = Seq("ab ab ab", "abc").toDF("text")
    val merges = BpeLearn.learnMerges(docs, "text", nMerges = 5)
    assert(merges === Seq((1, "a", "b"), (2, "ab", "c")))
  }

  test("greedy left-to-right application handles overlapping pairs") {
    // "aaaa": pairs (a,a) x3 -> merge (a,a) applies left-to-right
    // giving [aa, aa]; next merge is then (aa, aa)
    val docs = Seq("aaaa").toDF("text")
    val merges = BpeLearn.learnMerges(docs, "text", nMerges = 2)
    assert(merges === Seq((1, "a", "a"), (2, "aa", "aa")))
  }

  test("ties break to the lexicographically smallest pair") {
    // "ba" and "cb" each once: pairs (b,a) = 1 and (c,b) = 1 -> (b,a)
    val docs = Seq("ba cb").toDF("text")
    val merges = BpeLearn.learnMerges(docs, "text", nMerges = 1)
    assert(merges === Seq((1, "b", "a")))
  }

  test("deterministic across partitioning") {
    val docs = (1 to 200)
      .map(i => s"alpha$i beta gamma delta epsilon beta gamma")
      .toDF("text")
    val a = BpeLearn.learnMerges(docs, "text", 10)
    val b = BpeLearn.learnMerges(docs.repartition(17), "text", 10)
    assert(a === b)
    assert(a.length === 10)
  }

  test("initialPairCounts equals merge loop iteration 0") {
    val docs = Seq("ab ab ab", "abc", "xy").toDF("text")
    val pairs = BpeLearn.initialPairCounts(docs, "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(pairs === Map(
      ("a", "b") -> 4L, ("b", "c") -> 1L, ("x", "y") -> 1L))
  }

  test("rejects bad parameters") {
    val docs = Seq("ab").toDF("text")
    intercept[IllegalArgumentException] {
      BpeLearn.learnMerges(docs, "text", 0)
    }
    intercept[IllegalArgumentException] {
      BpeLearn.learnMerges(docs, "text", 1, maxWords = 0)
    }
  }
}
