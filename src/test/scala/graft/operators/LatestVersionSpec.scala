package graft.operators

import java.sql.Timestamp
import graft.SparkTestBase

/** Dedup semantics over the reference's static fixture shape
  * (multi-version, out-of-order keys — reference
  * FlinkJoiner.scala:280-297): re-updates of one key, duplicate
  * (key, ts) pairs, never-updated keys.
  */
class LatestVersionSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(60000L * min)

  // listingData fixture: key 2 updated twice with a duplicate payload
  // at two different ts; key 2 ALSO has a (key, ts) duplicate pattern.
  private lazy val listings = Seq(
    (1L, "listing 1.0", ts(1)),
    (2L, "listing 2.0", ts(1)),
    (3L, "listing 3.0", ts(1)),
    (4L, "listing 4.0", ts(1)),
    (2L, "listing 2.1", ts(3)),
    (1L, "listing 1.1", ts(4)),
    (2L, "listing 2.2", ts(10)),
    (5L, "listing 5.0a", ts(7)), // tie on (key, ts): both kept by latestAll
    (5L, "listing 5.0b", ts(7))
  ).toDF("id", "data", "ts")

  test("latestAll keeps exactly the max-ts rows, including ties") {
    val got = LatestVersion.latestAll(listings, "id", "ts")
      .select("id", "data").as[(Long, String)].collect().toSet
    assert(got === Set(
      (1L, "listing 1.1"), (2L, "listing 2.2"), (3L, "listing 3.0"),
      (4L, "listing 4.0"), (5L, "listing 5.0a"), (5L, "listing 5.0b")))
  }

  test("latestOne keeps one row per key with deterministic tiebreak") {
    val withSeq = listings.withColumn("seq",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val got = LatestVersion.latestOne(withSeq, "id", "ts", "seq")
    assert(got.count() === 5)
    assert(got.filter("id = 5").select("data").as[String].head() === "listing 5.0b")
  }

  test("latestAllMulti dedups on a composite key") {
    val got = LatestVersion.latestAllMulti(
      listings.withColumn("shard", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"), org.apache.spark.sql.functions.lit(2))),
      Seq("id", "shard"), "ts")
    assert(got.count() === 6)
  }
}
