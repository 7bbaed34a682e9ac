package graft.operators

import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows =
    (1 to 40).map(i => (i.toLong, if (i <= 30) "big" else "small" + i % 5))
      .toDF("id", "grp")

  test("laplaceNoisyCounts: deterministic, seed-keyed, scale tracks 1/epsilon") {
    val a = Privacy.laplaceNoisyCounts(rows, "grp", epsilon = 1.0)
      .select("grp", "n_noisy").as[(String, Double)].collect().toMap
    val b = Privacy.laplaceNoisyCounts(rows, "grp", epsilon = 1.0)
      .select("grp", "n_noisy").as[(String, Double)].collect().toMap
    assert(a === b, "same seed must release identical values")
    val other = Privacy.laplaceNoisyCounts(rows, "grp", epsilon = 1.0,
        seed = "x")
      .select("grp", "n_noisy").as[(String, Double)].collect().toMap
    assert(other !== a, "a different seed draws different noise")
    // noise at eps=1 is Laplace(1): overwhelmingly within +-15 of the
    // true count; and eps=100 must sit 100x closer for the same seed
    assert(math.abs(a("big") - 30.0) < 15.0, s"noise too large: ${a("big")}")
    val tight = Privacy.laplaceNoisyCounts(rows, "grp", epsilon = 100.0)
      .select("grp", "n_noisy").as[(String, Double)].collect().toMap
    assert(math.abs(tight("big") - 30.0) * 10 < math.abs(a("big") - 30.0) + 1e-9,
      s"eps=100 (${tight("big")}) must be far tighter than eps=1 (${a("big")})")
  }

  test("kAnonymityAudit flags exactly the under-k combinations") {
    val got = Privacy.kAnonymityAudit(rows, Seq("grp"), k = 5)
      .select("grp", "n_rows", "suppress")
      .as[(String, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("big") === ((30L, false)))
    // each "smallN" bucket holds 2 rows -> suppress
    got.filter(_._1.startsWith("small")).values.foreach { case (n, s) =>
      assert(n === 2L && s, "tiny QI groups must be flagged")
    }
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      Privacy.laplaceNoisyCounts(rows, "grp", epsilon = 0.0)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(rows, Nil, 5)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(rows, Seq("grp"), 1)
    }
  }
}
