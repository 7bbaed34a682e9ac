package graft.operators

import graft.SparkTestBase

class MarketBasketSpec extends SparkTestBase {
  import spark.implicits._

  // 4 baskets: {1,2} {1,2} {1,3} {2}; duplicate item rows collapse
  private lazy val rows = Seq(
    (10L, 1L), (10L, 2L), (10L, 2L), // dup (10,2) row must not double-count
    (11L, 1L), (11L, 2L),
    (12L, 1L), (12L, 3L),
    (13L, 2L)
  ).toDF("basket", "item")

  test("pairRules: hand-computed support / confidence / lift") {
    val got = MarketBasket.pairRules(rows, "basket", "item", minCount = 1L)
      .select("item_a", "item_b", "n_baskets", "support", "confidence", "lift")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // supports: item1 in 3 baskets, item2 in 3, item3 in 1; N = 4
    // pair (1,2): 2 baskets -> support .5, conf(1->2) 2/3, lift 2*4/(3*3)
    assert(got((1L, 2L)) === ((2L, 0.5, 0.666667, 0.888889)))
    // pair (1,3): 1 basket -> support .25, conf 1/3, lift 1*4/(3*1)
    assert(got((1L, 3L)) === ((1L, 0.25, 0.333333, 1.333333)))
    assert(!got.contains((2L, 3L)), "never co-occur -> no row")
  }

  test("minCount prunes singleton pairs") {
    val got = MarketBasket.pairRules(rows, "basket", "item", minCount = 2L)
      .select("item_a", "item_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("supports broadcast — the pair stream never shuffle-joins the counts") {
    val p = MarketBasket.pairRules(rows, "basket", "item", 1L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "item supports must broadcast back")
  }
}
