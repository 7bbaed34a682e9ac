package graft.operators

import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private def rnd(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("one iteration on the two-edge path graph matches hand math") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = PageRank.ranks(edges, iters = 1)
      .as[(Long, Double)].collect().toMap
    val r0 = rnd(1.0 / 3)
    val base = (1.0 - 0.85) / 3
    val expEnd = rnd(base + 0.85 * (r0 / 2)) // endpoints: half of b's mass
    val expMid = rnd(base + 0.85 * (r0 + r0)) // b: all of a's and c's
    assert(got === Map(1L -> expEnd, 2L -> expMid, 3L -> expEnd))
  }

  test("star graph: the hub accumulates the mass") {
    val edges = (2L to 9L).map(l => (1L, l)).toDF("id_a", "id_b")
    val got = PageRank.ranks(edges, iters = 3)
      .as[(Long, Double)].collect().toMap
    val leaves = (2L to 9L).map(got)
    assert(leaves.toSet.size === 1, "leaves are symmetric")
    assert(got(1L) > 4 * leaves.head, s"hub ${got(1L)} vs leaf ${leaves.head}")
    // rank mass is conserved up to rounding
    assert(math.abs(got.values.sum - 1.0) < 1e-4)
  }

  test("ranks are partitioning- and input-order-independent") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("id_a", "id_b")
    val base = PageRank.ranks(edges, iters = 3)
      .as[(Long, Double)].collect().toMap
    val shuffled = PageRank.ranks(edges.repartition(7), iters = 3)
      .as[(Long, Double)].collect().toMap
    val reversed = PageRank.ranks(
        edges.orderBy($"id_b".desc).repartition(3), iters = 3)
      .as[(Long, Double)].collect().toMap
    assert(shuffled === base)
    assert(reversed === base)
  }

  test("invalid parameters rejected") {
    val edges = Seq((1L, 2L)).toDF("id_a", "id_b")
    intercept[IllegalArgumentException] { PageRank.ranks(edges, 0) }
    intercept[IllegalArgumentException] { PageRank.ranks(edges, 1, damping = 1.0) }
  }
}
