package graft.operators

import graft.SparkTestBase

class OutliersSpec extends SparkTestBase {
  import spark.implicits._

  // group g: 1..10 with one planted outlier 1000 replacing 10
  private lazy val df = ((1 to 9).map(v => ("g", v.toDouble)) :+ ("g", 1000.0))
    .toDF("grp", "v")

  test("winsorize clamps to the exact interpolated percentile band") {
    // sorted: 1..9, 1000. p10 = 1 + 0.1*9 = 1.9; p90 = idx 0.9*9 = 8.1
    // -> 9 + 0.1*(1000-9) = 108.1
    val got = Outliers.winsorize(df, "grp", "v", 0.1, 0.9)
      .select("v", "v_w").as[(Double, Double)].collect().toMap
    assert(math.abs(got(1.0) - 1.9) < 1e-9, s"low clamp: ${got(1.0)}")
    assert(math.abs(got(1000.0) - 108.1) < 1e-9, s"high clamp: ${got(1000.0)}")
    assert(got(5.0) === 5.0, "interior values unchanged")
  }

  test("winsorizedMeans tames the planted outlier") {
    val (n, raw, wins) = Outliers.winsorizedMeans(df, "grp", "v", 0.1, 0.9)
      .select("n", "mean_raw", "mean_winsorized")
      .as[(Long, Double, Double)].head()
    assert(n === 10L)
    assert(raw === 104.5) // (45 + 1000) / 10
    assert(wins < raw / 5, s"winsorized mean $wins should collapse toward the body")
  }

  test("invalid percentile band rejected") {
    intercept[IllegalArgumentException] {
      Outliers.winsorThresholds(df, "grp", "v", 0.9, 0.1)
    }
  }

  test("zscore: hand-computed standardization, degenerate groups null-safe") {
    val d = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0)).toDF("grp", "v")
    val got = Outliers.zscore(d, "grp", "v", threshold = 0.9)
      .select("grp", "v", "z", "is_anomaly")
      .as[(String, Double, Option[Double], Boolean)].collect().toSet
    // group a: mean 2, sd 1 -> z = -1, 0, 1; threshold 0.9 flags the ends
    assert(got.contains(("a", 1.0, Some(-1.0), true)))
    assert(got.contains(("a", 2.0, Some(0.0), false)))
    assert(got.contains(("a", 3.0, Some(1.0), true)))
    // single-row group: sd undefined -> null z, never anomalous
    assert(got.contains(("b", 7.0, None, false)))
  }

  test("madOutliers: the planted extreme cannot mask itself") {
    // 1..9 + 1000: mean-based z of 1000 is only ~2.8 (the outlier
    // inflates its own stddev) but the robust z is enormous
    val got = Outliers.madOutliers(df, "grp", "v", threshold = 3.5)
      .select("v", "robust_z", "is_outlier")
      .as[(Double, Option[Double], Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // median of 1..9,1000 = 5.5; MAD = median(|x-5.5|) = 2.5
    assert(got(5.0)._1 === Some(-0.1349), s"interior: ${got(5.0)}")
    assert(got(1000.0)._1 === Some(BigDecimal(0.6745 * 994.5 / 2.5)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(got(1000.0)._2, "the extreme must be flagged")
    assert(got.count(_._2._2) === 1, "only the extreme flags at 3.5")
    // classical zscore at the same threshold MISSES it
    val z = Outliers.zscore(df, "grp", "v", threshold = 3.5)
      .filter($"is_anomaly").count()
    assert(z === 0L, "mean/stddev z must be masked by the outlier itself")
  }

  test("madOutliers: zero-MAD group degrades to null, never divides by zero") {
    val const = Seq(("g", 4.0), ("g", 4.0), ("g", 4.0)).toDF("grp", "v")
    val got = Outliers.madOutliers(const, "grp", "v", 3.5)
      .select("robust_z", "is_outlier")
      .as[(Option[Double], Boolean)].collect()
    assert(got.forall(r => r._1.isEmpty && !r._2))
  }

  test("clamp side never shuffles the fact table: thresholds broadcast") {
    val p = Outliers.winsorize(df, "grp", "v", 0.1, 0.9)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "per-group thresholds must broadcast, not shuffle-join")
  }
}
