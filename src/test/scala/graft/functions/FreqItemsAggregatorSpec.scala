package graft.functions

import graft.SparkTestBase
import graft.functions.FreqItemsAggregator.FreqItems

class FreqItemsAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("exact regime: capacity >= distinct terms gives true counts, ranked") {
    val df = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("a") ++
      Seq("z")).map(("en", _)).toDF("lang", "term")
    val out = FreqItemsAggregator.frequentTerms(df, "lang", "term",
        capacity = 16, k = 3)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // count ties (y=3, a=3) break by term UTF-8 order
    assert(out.toSeq === Seq(("x", 5L, 1L), ("a", 3L, 2L), ("y", 3L, 3L)))
  }

  test("MG guarantee: a majority item survives any capacity-1 sketch") {
    val agg = new FreqItems(capacity = 1, k = 1)
    // 6 of 10 occurrences are "hot": freq > N/(cap+1) = 5 -> must survive
    val stream = Seq("hot", "c1", "hot", "c2", "hot", "c3", "hot", "hot", "c4", "hot")
    val buf = stream.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).head.term === "hot")
    // and the estimate is within N/(cap+1) UNDER the true count
    val est = agg.finish(buf).head.est
    assert(est <= 6L && est >= 6L - 5L)
  }

  test("merge keeps the capacity bound and sums exact-regime counts") {
    val agg = new FreqItems(capacity = 2, k = 2)
    val a = Map("x" -> 4L, "y" -> 2L)
    val b = Map("x" -> 1L, "z" -> 3L)
    val m = agg.merge(a, b)
    assert(m.size <= 2)
    // x: 5, z: 3, y: 2 -> cut = 3rd largest (2): x -> 3, z -> 1
    assert(m === Map("x" -> 3L, "z" -> 1L))
    // disjoint merge under capacity stays exact
    assert(agg.merge(Map("x" -> 4L), Map("y" -> 2L)) ===
      Map("x" -> 4L, "y" -> 2L))
  }

  test("parallelized input matches single-partition result in the exact regime") {
    val rows = (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(("g", s"t$i")))
    val one = FreqItemsAggregator.frequentTerms(
      rows.toDF("g", "term").coalesce(1), "g", "term", 1024, 5).collect()
    val many = FreqItemsAggregator.frequentTerms(
      rows.toDF("g", "term").repartition(7), "g", "term", 1024, 5).collect()
    assert(one.map(_.toSeq).toSeq === many.map(_.toSeq).toSeq)
  }

  test("guards: bad capacity / k") {
    intercept[IllegalArgumentException] { new FreqItems(0, 1) }
    intercept[IllegalArgumentException] { new FreqItems(4, 5) }
  }
}
