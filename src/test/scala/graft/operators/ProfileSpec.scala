package graft.operators

import graft.SparkTestBase

/** Column profiling: exact stats on a frame with known nulls and
  * cardinalities; the approx-NDV tier must stay within the HLL error
  * band of exact.
  */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val table = (1 to 1000).map { i =>
    (i.toLong, if (i % 10 == 0) None else Some(i % 37),
      s"cat${i % 5}")
  }.toDF("id", "maybe", "cat")

  test("exact profile: counts, nulls, NDV, min/max") {
    val got = Profile.profile(table, Seq("id", "maybe", "cat"))
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("id") === (("id", 1000L, 0L, 1000L, Some("1"), Some("1000"))))
    // nulls excluded from NDV and min/max; 100 of 1000 are null,
    // non-null values cover 0..36 (i % 37)
    assert(got("maybe") === (("maybe", 1000L, 100L, 37L, Some("0"), Some("36"))))
    assert(got("cat") === (("cat", 1000L, 0L, 5L, Some("cat0"), Some("cat4"))))
  }

  test("approx NDV lands inside the sketch band") {
    val exact = Profile.profile(table, Seq("id"))
      .select("n_distinct").as[Long].head()
    val approx = Profile.profile(table, Seq("id"), approxNdv = true)
      .select("n_distinct").as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx NDV $approx vs exact $exact beyond 5%")
  }

  test("unknown columns are rejected") {
    intercept[IllegalArgumentException] {
      Profile.profile(table, Seq("nope"))
    }
  }

  test("equi-width histogram: bins partition the rows exactly") {
    // ids 1..1000, 10 bins over [1, 1000]: width 99.9; every row lands
    // in exactly one bin and the top edge folds into the last bin
    val h = Profile.histogram(table, "id", 10)
      .as[(Long, Long)].collect().toMap
    assert(h.values.sum === 1000L)
    assert(h.keySet === (0L until 10L).toSet)
    // nulls excluded: 100 nulls in `maybe`
    val hm = Profile.histogram(table, "maybe", 4).as[(Long, Long)].collect()
    assert(hm.map(_._2).sum === 900L)
    // empty / all-null input yields no bins
    assert(Profile.histogram(table.filter($"id" < 0), "id", 4).count() === 0L)
  }

  test("equi-depth histogram: depths within the sketch band, full cover") {
    val n = 1000L
    val bins = 10
    val h = Profile.quantileHistogram(table, "id", bins, relativeError = 0.001)
      .as[(Long, Double, Double, Long)].collect().sortBy(_._1)
    // all rows covered exactly once
    assert(h.map(_._4).sum === n)
    // each depth within the sketch band of n/bins (plus one boundary row)
    val target = n.toDouble / bins
    val tol = 2 * 0.001 * n + 2
    h.foreach { case (b, _, _, c) =>
      assert(math.abs(c - target) <= tol, s"bin $b depth $c vs $target")
    }
    // boundaries are increasing and span the column range
    assert(h.head._2 === 1.0 && h.last._3 === 1000.0)
    assert(h.forall { case (_, lo, hi, _) => lo < hi })
  }
}
