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
}
