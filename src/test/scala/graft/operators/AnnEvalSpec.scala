package graft.operators

import graft.SparkTestBase

class AnnEvalSpec extends SparkTestBase {
  import spark.implicits._

  private def frame(rows: (Long, Long, Long)*) =
    rows.toDF("probe_id", "neighbor_id", "rank")

  test("per-probe overlap counting, zero-hit probes kept") {
    val exact = frame(
      (0L, 10L, 1L), (0L, 11L, 2L),
      (1L, 20L, 1L), (1L, 21L, 2L),
      (2L, 30L, 1L), (2L, 31L, 2L))
    val approx = frame(
      (0L, 10L, 1L), (0L, 11L, 2L),   // full hit
      (1L, 21L, 1L), (1L, 99L, 2L),   // half hit (rank order irrelevant)
      (2L, 98L, 1L), (2L, 99L, 2L))   // total miss
    val out = AnnEval.recallAtK(approx, exact, k = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) === ((2L, 2L, 1.0)))
    assert(out(1L) === ((2L, 1L, 0.5)))
    assert(out(2L) === ((2L, 0L, 0.0)))
  }

  test("rows past the k cut are ignored on both sides") {
    val exact = frame((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L))
    val approx = frame((0L, 3L, 1L), (0L, 2L, 2L), (0L, 1L, 3L))
    val out = AnnEval.recallAtK(approx, exact, k = 2).collect().head
    // exact cut = {1, 2}; approx cut = {3, 2} -> one hit of two
    assert(out.getLong(1) === 2L && out.getLong(2) === 1L)
    assert(out.getDouble(3) === 0.5)
  }

  test("short exact lists use the achievable denominator") {
    val exact = frame((0L, 1L, 1L))
    val approx = frame((0L, 1L, 1L), (0L, 2L, 2L))
    val out = AnnEval.recallAtK(approx, exact, k = 5).collect().head
    assert(out.getLong(1) === 1L && out.getDouble(3) === 1.0)
  }

  test("k must be positive") {
    intercept[IllegalArgumentException] {
      AnnEval.recallAtK(frame(), frame(), 0)
    }
  }
}
