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

  test("clamp side never shuffles the fact table: thresholds broadcast") {
    val p = Outliers.winsorize(df, "grp", "v", 0.1, 0.9)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"),
      "per-group thresholds must broadcast, not shuffle-join")
  }
}
