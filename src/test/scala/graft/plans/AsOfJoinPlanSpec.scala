package graft.plans

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase
import graft.operators.AsOfJoin

/** The custom physical as-of join must agree with the union+window
  * rewrite on randomized data (same tie/null semantics), and its plan
  * must be the sort-merge shape: one AsOfJoinExec, no Window, no row
  * explosion.
  */
class AsOfJoinPlanSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(60000L * min)

  private lazy val probes = Seq(
    (101L, 1L, ts(5)), (102L, 1L, ts(2)), (103L, 2L, ts(1)), (104L, 3L, ts(9))
  ).toDF("probe_id", "key", "ts")

  private lazy val images = Seq(
    (1L, "img 1.0", ts(1), 11L), (1L, "img 1.1", ts(2), 12L),
    (1L, "img 1.2", ts(3), 13L), (2L, "img 2.0", ts(3), 14L),
    (2L, "img 2.0b", ts(3), 15L)
  ).toDF("key", "img", "ts", "img_id")

  test("fixture semantics: inclusive bound, nulls, equal-ts tiebreak") {
    val got = AsOfJoinPlan.asOf(probes, images, "key", "ts", "ts",
        tiebreak = "img_id", buildCols = Seq("img"))
      .select(col("probe_id"), col("b_img"))
      .as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      101L -> Some("img 1.2"), 102L -> Some("img 1.1"),
      103L -> None, 104L -> None))
  }

  test("plan shape: AsOfJoinExec present, no Window, no SortMergeJoin") {
    val df = AsOfJoinPlan.asOf(probes, images, "key", "ts", "ts",
      "img_id", Seq("img"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), "custom exec must not fall back to window")
    assert(!p.contains("SortMergeJoin"), "must not plan a generic join")
  }

  test("null timestamps: null build ts never matches, null probe ts matches nothing") {
    // SQL semantics of `b.ts <= p.ts`: a null on either side is false.
    val p = Seq(
      (201L, Option(1L), Option(ts(5))),    // normal probe
      (202L, Option(1L), Option.empty[Timestamp]), // null probe ts
      (203L, Option.empty[Long], Option(ts(5)))    // null probe key
    ).toDF("probe_id", "key", "ts")
    val b = Seq(
      (Option(1L), "real", Option(ts(2)), 1L),
      (Option(1L), "null-ts", Option.empty[Timestamp], 2L), // must never match
      (Option.empty[Long], "null-key", Option(ts(1)), 3L)
    ).toDF("key", "img", "ts", "img_id")
    val expect = Map(201L -> Some("real"), 202L -> None, 203L -> None)

    val custom = AsOfJoinPlan.asOf(p, b, "key", "ts", "ts", "img_id", Seq("img"))
      .select("probe_id", "b_img").as[(Long, Option[String])].collect().toMap
    val rewrite = AsOfJoin.asOf(p, b, "key", "ts", "ts", Seq("img"), "img_id")
      .select("probe_id", "b_img").as[(Long, Option[String])].collect().toMap
    val viaJoin = AsOfJoin.asOfViaJoin(p, b, "key", "ts", "ts", Seq("img"), "img_id")
      .select("probe_id", "b_img").as[(Long, Option[String])].collect().toMap
    assert(custom === expect)
    assert(rewrite === expect)
    assert(viaJoin === expect)
  }

  test("reserved internal names are rejected up front") {
    val bad = probes.withColumn("__carried", lit(1))
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOf(bad, images, "key", "ts", "ts", Seq("img"), "img_id")
    }
    assert(e.getMessage.contains("__carried"))
  }

  test("empty build side: every probe emits nulls, none dropped") {
    val empty = Seq.empty[(Long, String, Timestamp, Long)]
      .toDF("key", "img", "ts", "img_id")
    val got = AsOfJoinPlan.asOf(probes, empty, "key", "ts", "ts",
        "img_id", Seq("img"))
      .select("probe_id", "b_img").as[(Long, Option[String])]
      .collect().toMap
    assert(got === Map(101L -> None, 102L -> None, 103L -> None,
      104L -> None))
  }

  test("empty probe side: empty result, exec still plans") {
    val empty = Seq.empty[(Long, Long, Timestamp)]
      .toDF("probe_id", "key", "ts")
    val df = AsOfJoinPlan.asOf(empty, images, "key", "ts", "ts",
      "img_id", Seq("img"))
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    assert(df.count() === 0L)
  }

  test("build side of only null keys/timestamps behaves as empty") {
    val b = Seq(
      (Option.empty[Long], "nk", Option(ts(1)), 1L),
      (Option(1L), "nt", Option.empty[Timestamp], 2L)
    ).toDF("key", "img", "ts", "img_id")
    val got = AsOfJoinPlan.asOf(probes, b, "key", "ts", "ts",
        "img_id", Seq("img"))
      .select("probe_id", "b_img").as[(Long, Option[String])]
      .collect().toMap
    assert(got.values.forall(_.isEmpty))
    assert(got.keySet === Set(101L, 102L, 103L, 104L))
  }

  test("probe keys beyond the last build key exhaust the lookahead cleanly") {
    val p = Seq((301L, 9L, ts(5)), (302L, 10L, ts(5)))
      .toDF("probe_id", "key", "ts")
    val got = AsOfJoinPlan.asOf(p, images, "key", "ts", "ts",
        "img_id", Seq("img"))
      .select("probe_id", "b_img").as[(Long, Option[String])]
      .collect().toMap
    assert(got === Map(301L -> None, 302L -> None))
  }

  test("agrees with the union+window rewrite on random data") {
    val rowGen = for {
      key <- Gen.choose(0L, 6L)
      // ~10% null timestamps: both impls must implement the SQL rule
      // that a null on either side of `buildTs <= probeTs` never matches
      t <- Gen.frequency(9 -> Gen.choose(0L, 20L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      payload <- Gen.alphaStr.map(_.take(4))
    } yield (key, t, payload)
    val dataGen = Gen.listOfN(50, rowGen)
    (1 to 6).foreach { i =>
      val probeRows = dataGen(Gen.Parameters.default, Seed(i.toLong)).get
      val buildRows = dataGen(Gen.Parameters.default, Seed(100L + i)).get
      val pdf = probeRows.zipWithIndex
        .map { case ((k, t, _), idx) => (idx.toLong, k, t.map(x => new Timestamp(x * 1000))) }
        .toDF("pid", "k", "ts")
      val bdf = buildRows.zipWithIndex
        .map { case ((k, t, p), idx) => (k, t.map(x => new Timestamp(x * 1000)), p + idx, idx.toLong) }
        .toDF("k", "ts", "payload", "bid")
      val custom = AsOfJoinPlan.asOf(pdf, bdf, "k", "ts", "ts", "bid", Seq("payload"))
        .select("pid", "b_payload").as[(Long, Option[String])].collect().toMap
      val rewrite = AsOfJoin.asOf(pdf, bdf, "k", "ts", "ts", Seq("payload"), "bid")
        .select("pid", "b_payload").as[(Long, Option[String])].collect().toMap
      assert(custom === rewrite, s"seed $i diverged")
    }
  }

  test("property: null keys on BOTH sides, invariant under partition count") {
    // the original property never generated null join keys; this one
    // makes them ~10% on both sides and re-runs the custom exec at
    // 1 / 3 / 17 shuffle partitions — the zipPartitions merge must be
    // partitioning-invariant and null keys must never match
    val rowGen = for {
      key <- Gen.frequency(9 -> Gen.choose(0L, 6L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      t <- Gen.frequency(9 -> Gen.choose(0L, 20L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      payload <- Gen.alphaStr.map(_.take(4))
    } yield (key, t, payload)
    val dataGen = Gen.listOfN(60, rowGen)
    def withPartitions[T](n: Int)(body: => T): T = {
      val k = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(k)
      spark.conf.set(k, n.toString)
      try body finally spark.conf.set(k, prev)
    }
    (1 to 4).foreach { i =>
      val probeRows = dataGen(Gen.Parameters.default, Seed(1000L + i)).get
      val buildRows = dataGen(Gen.Parameters.default, Seed(2000L + i)).get
      val pdf = probeRows.zipWithIndex
        .map { case ((k, t, _), idx) =>
          (idx.toLong, k, t.map(x => new Timestamp(x * 1000))) }
        .toDF("pid", "k", "ts")
      val bdf = buildRows.zipWithIndex
        .map { case ((k, t, p), idx) =>
          (k, t.map(x => new Timestamp(x * 1000)), p + idx, idx.toLong) }
        .toDF("k", "ts", "payload", "bid")
      val rewrite = AsOfJoin.asOf(pdf, bdf, "k", "ts", "ts",
          Seq("payload"), "bid")
        .select("pid", "b_payload").as[(Long, Option[String])]
        .collect().toMap
      Seq(1, 3, 17).foreach { n =>
        val custom = withPartitions(n) {
          AsOfJoinPlan.asOf(pdf, bdf, "k", "ts", "ts", "bid", Seq("payload"))
            .select("pid", "b_payload").as[(Long, Option[String])]
            .collect().toMap
        }
        assert(custom === rewrite, s"seed $i / $n partitions diverged")
      }
    }
  }
}
