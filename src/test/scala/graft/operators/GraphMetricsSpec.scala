package graft.operators

import graft.SparkTestBase

class GraphMetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("triangleCounts: K4 gives every node C(3,2) = 3 triangles") {
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("id_a", "id_b")
    val got = GraphMetrics.triangleCounts(k4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("one triangle plus a pendant edge: pendant node absent") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = GraphMetrics.triangleCounts(g).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("edge direction, duplicates, and self-loops are canonicalized away") {
    val messy = Seq(
      (2L, 1L), (1L, 2L), // reversed + duplicate
      (2L, 3L), (3L, 1L),
      (2L, 2L) // self-loop
    ).toDF("id_a", "id_b")
    val got = GraphMetrics.triangleCounts(messy)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a chain has no triangles") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(GraphMetrics.triangleCounts(chain).count() === 0L)
  }

  test("adamicAdar: hand-computed star-plus-edge graph") {
    // star center 10 — {1,2,3}, plus edge (1,2). Wedges through 10
    // propose (1,2)/(1,3)/(2,3); through 1 and 2 they propose only
    // existing edges. (1,2) is an edge -> dropped; (1,3) and (2,3)
    // each score 1/ln(deg(10)) = 1/ln(3)
    val g = Seq((10L, 1L), (10L, 2L), (10L, 3L), (1L, 2L))
      .toDF("id_a", "id_b")
    val got = GraphMetrics.adamicAdar(g)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val w = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map((1L, 3L) -> ((1L, w)), (2L, 3L) -> ((1L, w))))
  }

  test("adamicAdar: maxDegree cap removes hub middles") {
    val g = Seq((10L, 1L), (10L, 2L), (10L, 3L), (1L, 2L))
      .toDF("id_a", "id_b")
    // deg(10) = 3 > 2: the only open wedges ran through the hub
    assert(GraphMetrics.adamicAdar(g, maxDegree = Some(2)).count() === 0L)
  }

  test("adamicAdar: two common neighbors sum their weights") {
    // a=1, b=2 share middles 10 (deg 2) and 11 (deg 3); (1,2) not an
    // edge -> score = 1/ln(2) + 1/ln(3), n_common = 2
    val g = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L), (3L, 11L))
      .toDF("id_a", "id_b")
    val got = GraphMetrics.adamicAdar(g)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val w12 = BigDecimal(1.0 / math.log(2.0) + 1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = BigDecimal(1.0 / math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // (1,3)/(2,3) also share middle 11; (10,11) shares middles 1 AND 2
    // (deg 2 each) from the other side of the bipartite wedge
    val w1011 = BigDecimal(2.0 / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map((1L, 2L) -> ((2L, w12)),
      (1L, 3L) -> ((1L, w)), (2L, 3L) -> ((1L, w)),
      (10L, 11L) -> ((2L, w1011))))
  }

  test("bfsHops: min distance on a path graph, truncated at maxHops") {
    // 1-2-3-4-5 path, seed 1: hops = position; 5 is beyond maxHops=3
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("id_a", "id_b")
    val seeds = Seq(1L).toDF("id")
    val got = GraphMetrics.bfsHops(path, seeds, maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfsHops: a node reachable two ways gets the SHORTER distance") {
    // 1-2-3-4 chain plus shortcut 1-4: node 4 is hop 1, not hop 3;
    // node 3 is hop 2 via either side
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
      .toDF("id_a", "id_b")
    val got = GraphMetrics.bfsHops(g, Seq(1L).toDF("id"), maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
  }

  test("bfsHops: multiple seeds, disconnected component stays absent") {
    val g = Seq((1L, 2L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b")
    val got = GraphMetrics
      .bfsHops(g, Seq(1L, 5L).toDF("id"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 5L -> 0, 2L -> 1, 6L -> 1))
  }

  test("bfsHops: deep-traversal knobs change the plan, never the rows") {
    // 12-node ring, two seeds: every node reached, distances = ring
    // distance to the nearer seed. The cached-edges + checkpointed
    // variant must return exactly the lazy chain's rows.
    val ring = (0L until 12L).map(i => (i, (i + 1) % 12))
      .toDF("id_a", "id_b")
    val seeds = Seq(0L, 6L).toDF("id")
    val lazyRows = GraphMetrics.bfsHops(ring, seeds, maxHops = 5)
      .as[(Long, Int)].collect().toMap
    val deepRows = GraphMetrics.bfsHops(ring, seeds, maxHops = 5,
        cacheEdges = true, checkpointEvery = 2)
      .as[(Long, Int)].collect().toMap
    assert(deepRows === lazyRows)
    assert(lazyRows === (0L until 12L)
      .map(i => i -> math.min(math.min(i, 12 - i),
        math.abs(i - 6)).toInt).toMap)
  }

  test("bfsHops: maxHops = 0 returns the deduplicated seed set") {
    val g = Seq((1L, 2L)).toDF("id_a", "id_b")
    val got = GraphMetrics
      .bfsHops(g, Seq(1L, 1L, 3L).toDF("id"), maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 3L -> 0))
  }
}
