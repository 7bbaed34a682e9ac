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

  test("merge application is boundary-exact when a symbol suffix " +
       "straddles a later argmax pair") {
    // Corpus: ab x20, xbd x3, bd x4, abd x6.
    //  stage 1: (a,b)=26, (b,d)=13, (x,b)=3 -> merge (a,b);
    //           abd becomes [ab, d] (b is now INSIDE symbol ab)
    //  stage 2: (b,d)=7, (ab,d)=6, (x,b)=3 -> merge (b,d);
    //           [ab, d] must NOT fuse — its b is a symbol SUFFIX, not
    //           a whole symbol (a string-level 'b<sep>d' replace would
    //           wrongly produce [abd] here)
    //  stage 3: (ab,d)=6 beats (x,bd)=3 -> merge (ab, d).
    // A boundary-sloppy application yields (3, x, bd) instead — this
    // corpus makes the straddled word the argmax decider, pinning both
    // learnMerges and the oracle's double-separator replace encoding.
    val docs = (Seq.fill(20)("ab") ++ Seq.fill(3)("xbd") ++
        Seq.fill(4)("bd") ++ Seq.fill(6)("abd")).toDF("text")
    val merges = BpeLearn.learnMerges(docs, "text", nMerges = 3)
    assert(merges === Seq((1, "a", "b"), (2, "b", "d"), (3, "ab", "d")))
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

  test("encode applies merges in rank order, greedily left-to-right") {
    val docs = Seq((0L, "table tab a aaaa")).toDF("doc_id", "text")
    val merges = Seq("t" -> "a", "ta" -> "b", "a" -> "a")
    val toks = BpeLearn.encode(docs, "doc_id", "text", merges)
      .collect().head.getSeq[String](1)
    // table: t a b l e -> ta b l e -> tab l e (no (tab,l) merge)
    // tab: -> ta b -> tab; a: single char; aaaa: (a,a) greedy -> aa aa
    assert(toks === Seq("tab", "l", "e", "tab", "a", "aa", "aa"))
  }

  test("encode with the learned table reproduces the trainer's final state") {
    // learnMerges's update rule and encode must be the same function:
    // encoding the training corpus with all learned merges yields the
    // trainer's final symbol sequences
    val docs = Seq((0L, "abab abc ab"), (1L, "abab abab")).toDF("doc_id", "text")
    val learned = BpeLearn.learnMerges(docs, "text", nMerges = 3)
      .map { case (_, l, r) => (l, r) }
    val enc = BpeLearn.encode(docs, "doc_id", "text", learned)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // merges: (a,b) -> ab; (ab,ab) -> abab; (ab,c) or (abab, ...) per counts
    // independent check: re-run the trainer's own greedy application
    def apply1(word: String): Seq[String] = {
      var syms = word.split("").filter(_.nonEmpty).toSeq
      learned.foreach { case (l, r) =>
        val out = Seq.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      syms
    }
    assert(enc(0L) === "abab abc ab".split(" ").toSeq.flatMap(apply1))
    assert(enc(1L) === "abab abab".split(" ").toSeq.flatMap(apply1))
  }

  test("encodeStats counts words and subword tokens, skipping empty docs") {
    val docs = Seq((0L, "table scan"), (1L, "   "), (2L, null))
      .toDF("doc_id", "text")
    val out = BpeLearn.encodeStats(docs, "doc_id", "text",
        Seq("t" -> "a", "ta" -> "b", "s" -> "c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // table -> [ta b l e]? no: (t,a) then (ta,b) -> [tab, l, e] = 3;
    // scan -> [sc, a, n] = 3
    assert(out.toSeq === Seq((0L, 2L, 6L)))
  }
}
