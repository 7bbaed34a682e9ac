package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  private def rnd(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("chiSquare: hand-computed 2x2 table") {
    // a:{x:10, y:20}, b:{x:20, y:10} -> every expected cell 15,
    // chi2 = 4 * 25/15 = 20/3, dof (2-1)(2-1) = 1, n = 60
    val rows = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(10)(("b", "y")))
      .toDF("u", "v")
    val (chi2, dof, n) = Stats.chiSquare(rows, "u", "v")
      .as[(Double, Long, Long)].head()
    assert(chi2 === rnd(20.0 / 3.0))
    assert(dof === 1L)
    assert(n === 60L)
  }

  test("chiSquare: independent columns score ~0") {
    // perfectly proportional table -> expected == observed -> chi2 = 0
    val rows = (Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(40)(("b", "y")))
      .toDF("u", "v")
    val chi2 = Stats.chiSquare(rows, "u", "v").as[(Double, Long, Long)].head()._1
    assert(chi2 === 0.0)
  }

  test("twoProportionZ: hand-computed arms") {
    // arm1 20/100 vs arm2 10/100
    val rows = ((1 to 100).map(i => (true, i <= 20)) ++
      (1 to 100).map(i => (false, i <= 10))).toDF("arm", "hit")
    val r = Stats.twoProportionZ(rows, col("arm"), col("hit"))
      .as[(Long, Long, Double, Long, Long, Double, Double)].head()
    assert(r._1 === 100L && r._2 === 20L && r._3 === 0.2)
    assert(r._4 === 100L && r._5 === 10L && r._6 === 0.1)
    val pooled = 30.0 / 200.0
    val want = rnd((0.2 - 0.1) /
      math.sqrt(pooled * (1.0 - pooled) * (1.0 / 100 + 1.0 / 100)))
    assert(r._7 === want)
  }

  test("twoProportionZ: identical arms give z = 0") {
    val rows = ((1 to 50).map(i => (true, i <= 10)) ++
      (1 to 50).map(i => (false, i <= 10))).toDF("arm", "hit")
    val z = Stats.twoProportionZ(rows, col("arm"), col("hit"))
      .as[(Long, Long, Double, Long, Long, Double, Double)].head()._7
    assert(z === 0.0)
  }
}
