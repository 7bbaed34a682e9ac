package graft.operators

import graft.SparkTestBase

/** Duplicated-span detection on planted verbatim repeats: span
  * boundaries must be exact (maximal, 1-based, inclusive), docs without
  * a width-long repeat must emit nothing, and the per-doc stats must
  * agree with the spans.
  */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  // doc 1 and doc 2 share a verbatim 12-token run ("dup1 .. dup12") at
  // different offsets; doc 3 is unrelated; doc 4 repeats a 7-token run
  // of doc 1 — BELOW the width-8 threshold, so it must not match.
  private val shared = (1 to 12).map(i => s"dup$i").mkString(" ")
  private val doc1 = s"a1 a2 a3 $shared b1 b2"            // dup at pos 4..15
  private val doc2 = s"c1 $shared"                        // dup at pos 2..13
  private val doc3 = (1 to 20).map(i => s"zzz$i").mkString(" ")
  private val doc4 = "x1 " + (1 to 7).map(i => s"dup$i").mkString(" ")

  private lazy val docs = Seq(
    (1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4)
  ).toDF("doc_id", "text")

  test("duplicatedSpans finds the maximal planted span with exact bounds") {
    val got = SpanDedup.duplicatedSpans(docs, "doc_id", "text", width = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc1: positions 4..8 start duplicated 8-grams (last start = 15-8+1=8)
    //   -> span [4, 8+7=15], 12 tokens. doc2: starts 2..6 -> [2, 13].
    assert(got === Set((1L, 4L, 15L, 12L), (2L, 2L, 13L, 12L)),
      s"expected exactly the two planted spans, got $got")
  }

  test("repeats shorter than width emit nothing") {
    val ids = SpanDedup.duplicatedSpans(docs, "doc_id", "text", width = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(3L) && !ids.contains(4L))
  }

  test("a repeat WITHIN one document is also a span (both copies)") {
    val selfDup = Seq((10L, s"$shared q1 q2 $shared")).toDF("doc_id", "text")
    val got = SpanDedup.duplicatedSpans(selfDup, "doc_id", "text", width = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 1L, 12L, 12L), (10L, 15L, 26L, 12L)),
      s"both in-document copies must span, got $got")
  }

  test("overlapping duplicated grams merge into ONE span — no double counting") {
    // doc X: starts 1 and 3 are duplicated (via two different witness
    // docs) but start 2 is not. The covering intervals [1,8] and [3,10]
    // overlap, so X must emit a single span [1,10] of 10 tokens — NOT
    // two overlapping spans whose token counts sum to 16 (the start-run
    // islanding bug: dup_fraction > 1).
    val tox = (1 to 10).map(i => s"t$i")
    val corpus = Seq(
      (1L, tox.mkString(" ")),
      (2L, "wa " + tox.take(8).mkString(" ")),
      (3L, tox.drop(2).mkString(" ") + " wb")
    ).toDF("doc_id", "text")
    val spans = SpanDedup.duplicatedSpans(corpus, "doc_id", "text", width = 8)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans.filter(_._1 == 1L) === Set((1L, 1L, 10L, 10L)),
      s"overlapping intervals must merge, got ${spans.filter(_._1 == 1L)}")
    val stats = SpanDedup.spanStats(corpus, "doc_id", "text", width = 8)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(stats.forall(_._5 <= 1.0),
      s"dup_fraction must never exceed 1.0, got ${stats.toSeq}")
    assert(stats.find(_._1 == 1L).get._5 === 1.0)
  }

  test("spanStats matches spans and reports zero rows for clean docs") {
    val got = SpanDedup.spanStats(docs, "doc_id", "text", width = 8)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 17L, 12L, 1L, 12.0 / 17)))
    assert(got(2L) === ((2L, 13L, 12L, 1L, 12.0 / 13)))
    assert(got(3L) === ((3L, 20L, 0L, 0L, 0.0)))
    assert(got(4L) === ((4L, 8L, 0L, 0L, 0.0)))
  }

  test("removeDuplicatedSpans keeps the canonical copy and strips the repeat") {
    val got = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text", width = 8)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1 is canonical for every shared gram (lowest doc id) — kept
    // whole; doc 2's copy of the 12-token span [2..13] is removed,
    // leaving only the lead-in token
    assert(got(1L) === ((1L, doc1, 17L, 17L)))
    assert(got(2L) === ((2L, "c1", 13L, 1L)))
    // untouched docs pass through (already single-spaced)
    assert(got(3L) === ((3L, doc3, 20L, 20L)))
    assert(got(4L) === ((4L, doc4, 8L, 8L)))
  }

  test("removeDuplicatedSpans strips the second in-document copy only") {
    val selfDup = Seq((10L, s"$shared q1 q2 $shared")).toDF("doc_id", "text")
    val got = SpanDedup.removeDuplicatedSpans(selfDup, "doc_id", "text",
      width = 8).as[(Long, String, Long, Long)].collect().head
    assert(got === ((10L, s"$shared q1 q2", 26L, 14L)))
  }

  test("removeDuplicatedSpans conserves tokens: kept + removed covers spans") {
    // every doc row emits; kept <= n; and for the planted corpus the
    // removed token total equals the non-canonical span coverage
    val rows = SpanDedup.removeDuplicatedSpans(docs, "doc_id", "text",
      width = 8).as[(Long, String, Long, Long)].collect()
    assert(rows.length === 4)
    assert(rows.forall(r => r._4 <= r._3))
    assert(rows.map(r => r._3 - r._4).sum === 12L)
  }
}
