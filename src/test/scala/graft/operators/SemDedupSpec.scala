package graft.operators

import graft.SparkTestBase

class SemDedupSpec extends SparkTestBase {
  import spark.implicits._

  // two direction clusters; within cluster A, vectors 0/2/4 are exact
  // duplicates (cosine 1.0) and 6 points elsewhere; cluster B has no
  // dups above the threshold
  private val vecs = Seq(
    (0L, Seq(1.0, 0.0, 0.0)),
    (2L, Seq(1.0, 0.0, 0.0)),
    (4L, Seq(1.0, 0.0, 0.0)),
    (6L, Seq(0.6, 0.8, 0.0)),
    (1L, Seq(0.0, 0.0, 1.0)),
    (3L, Seq(0.0, 0.6, 0.8)),
    (5L, Seq(0.0, 0.9, 0.45)) // cos(3,5) ~ 0.894 — below tau
  ).toDF("vec_id", "embedding")

  test("drops every same-cluster over-threshold vector except the lowest id") {
    val out = SemDedup.semDedup(vecs, "vec_id", "embedding",
        k = 2, iters = 1, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size === 7)
    assert(out(0L), "lowest-id duplicate is the keeper")
    assert(!out(2L) && !out(4L), "higher-id exact dups are dropped")
    assert(out(6L) && out(1L) && out(3L) && out(5L),
      s"sub-threshold vectors all kept: $out")
  }

  test("tau above every pairwise cosine keeps everything") {
    val out = SemDedup.semDedup(vecs, "vec_id", "embedding",
        k = 2, iters = 1, tau = 1.01).collect()
    assert(out.forall(_.getBoolean(2)))
  }

  test("zero vectors are incomparable and always kept") {
    val withZero = vecs.union(
      Seq((9L, Seq(0.0, 0.0, 0.0))).toDF("vec_id", "embedding"))
    val out = SemDedup.semDedup(withZero, "vec_id", "embedding",
        k = 2, iters = 1, tau = 0.0)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(9L), "zero vector must be kept (NULL cosine)")
  }

  test("scale path: exact twins co-locate under both levels and drop " +
      "identically; sub-threshold vectors survive") {
    val out = SemDedup.semDedupScale(vecs, "vec_id", "embedding",
        kCoarse = 2, iters = 1, srpBits = 4, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out.size === 7)
    assert(out(0L), "lowest-id duplicate is the keeper")
    assert(!out(2L) && !out(4L),
      "identical vectors MUST share coarse cell and SRP signature")
    // sub-threshold pairs can only become MORE separated by the finer
    // cells — never spuriously dropped
    assert(out(6L) && out(1L) && out(3L) && out(5L))
  }

  test("scale path: deterministic across partitioning") {
    val a = SemDedup.semDedupScale(vecs, "vec_id", "embedding",
        2, 1, 6, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    val b = SemDedup.semDedupScale(vecs.repartition(7), "vec_id",
        "embedding", 2, 1, 6, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(a === b)
  }

  test("deterministic across partitioning") {
    val a = SemDedup.semDedup(vecs, "vec_id", "embedding", 2, 2, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    val b = SemDedup.semDedup(vecs.repartition(7), "vec_id", "embedding",
        2, 2, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .toSet
    assert(a === b)
  }
}
