package graft.operators

import graft.SparkTestBase

class QualityRulesSpec extends SparkTestBase {
  import spark.implicits._

  private val stop = Seq("the", "a")

  private def rules(rows: (Long, String)*) =
    QualityRules.gopherRules(rows.toDF("doc_id", "text"), "doc_id", "text", stop)
      .collect().map(r => r.getLong(0) -> r).toMap

  test("a clean mid-length doc keeps; every measured value is exact") {
    // 10 words, len sum 3+5+5+3+5+4+1+4+3+5 = 38
    val out = rules(
      (0L, "the quick brown fox jumps over a lazy dog again"))
    val r = out(0L)
    assert(r.getLong(1) === 10L)                        // n_words
    assert(math.abs(r.getDouble(2) - 3.8) < 1e-9)       // mean_word_len
    assert(r.getDouble(3) === 0.0)                      // symbol_ratio
    assert(r.getDouble(4) === 1.0)                      // alpha_frac
    assert(r.getLong(5) === 2L)                         // stop_hits
    assert(r.getLong(6) === 1L)                         // keep
  }

  test("each rule rejects independently") {
    val out = rules(
      (1L, "too short"),                                        // n_words < 10
      (2L, "the a x y z w v u t s"),                            // mean len 1.2 < 3
      (3L, "the a ### ... word word word word word word"),      // symbols 4/10
      (4L, "111 2222 3333 4444 5555 6666 7777 8888 9999 0000 the a"), // alpha 2/12
      (5L, "quick brown foxes jumped over lazy dogs once more today")) // stop_hits 0
    assert(out(1L).getLong(6) === 0L)
    assert(out(2L).getLong(6) === 0L)
    val r3 = out(3L)
    // '#' x3 + one '...' -> (3 + 1) / 10 words
    assert(math.abs(r3.getDouble(3) - 0.4) < 1e-9)
    assert(r3.getLong(6) === 0L)
    val r4 = out(4L)
    assert(math.abs(r4.getDouble(4) - 2.0 / 12.0) < 1e-6)
    assert(r4.getLong(6) === 0L)
    val r5 = out(5L)
    assert(r5.getLong(5) === 0L)
    assert(r5.getLong(6) === 0L)
  }

  test("empty text: one empty token, nothing passes, no crash") {
    val r = rules((9L, ""))(9L)
    assert(r.getLong(1) === 1L)       // split(trim("")) -> [""]
    assert(r.getDouble(4) === 0.0)    // no letter-bearing token
    assert(r.getLong(6) === 0L)
  }

  test("stopword probes count distinct presence, not occurrences") {
    val r = rules((7L, "the the the the the the the the the the"))(7L)
    assert(r.getLong(5) === 1L)
    assert(r.getLong(6) === 0L)       // needs >= 2 distinct stopwords
  }

  test("rejects an empty stopword list") {
    intercept[IllegalArgumentException] {
      QualityRules.gopherRules(Seq((0L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", Nil)
    }
  }
}
