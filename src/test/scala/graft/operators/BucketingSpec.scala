package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The point of bucketing is the PLAN: a join of two tables bucketed on
  * their join keys (same bucket count) must contain ZERO shuffle
  * exchanges, and must still return exactly the plain join's rows.
  */
class BucketingSpec extends SparkTestBase with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-bucketing-spec/$name"

  private lazy val facts = (1 to 1000)
    .map(i => (i.toLong % 97, i.toLong, s"f$i")).toDF("k", "seq", "payload")
  private lazy val dims = (0 to 96)
    .map(i => (i.toLong, s"dim$i")).toDF("k2", "name")

  test("bucketed equi-join plans with zero exchanges and exact rows") {
    Bucketing.writeBucketed(facts, "spec_facts_b", 8, "k", tmp("facts"))
    Bucketing.writeBucketed(dims, "spec_dims_b", 8, "k2", tmp("dims"))
    val joined = Bucketing.bucketedJoin(spark, "spec_facts_b", "spec_dims_b",
      col("k") === col("k2"))
    val plan = joined.queryExecution.executedPlan
    val exchanges = collectWithSubqueries(plan) {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed join must not shuffle, plan:\n$plan")
    val scans = collectWithSubqueries(plan) { case s: FileSourceScanExec => s }
    assert(scans.size == 2 && scans.forall(_.bucketedScan),
      "both sides must read as bucketed scans")

    val got = joined.select("k", "seq", "payload", "name")
      .as[(Long, Long, String, String)].collect().toSet
    val want = facts.join(dims, col("k") === col("k2"))
      .select("k", "seq", "payload", "name")
      .as[(Long, Long, String, String)].collect().toSet
    assert(got === want && got.size === 1000)
  }

  test("writeBucketed lays out one file per bucket") {
    Bucketing.writeBucketed(facts, "spec_layout_b", 8, "k", tmp("layout"))
    val files = new java.io.File(tmp("layout")).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    assert(files.length == 8,
      s"expected exactly one file per bucket, got ${files.map(_.getName).toSeq}")
  }

  test("bucketed layout + custom as-of exec compose: zero-shuffle temporal join") {
    // the as-of exec demands ClusteredDistribution(key) at exactly
    // numShufflePartitions on BOTH sides; tables bucketed into that
    // count satisfy it straight off the scan — a temporal join over a
    // 100 TB fact table without re-shuffling it is the whole point of
    // paying the bucketed write once
    import java.sql.Timestamp
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def ts(s: Long) = new Timestamp(s * 1000)
    val probes = (1 to 300).map(i => (i.toLong % 23, ts(100 + i), i.toLong))
      .toDF("k", "pts", "probe_id")
    val builds = (1 to 200).map(i => (i.toLong % 23, ts(80 + i * 2), i.toLong, i * 1.5))
      .toDF("k", "bts", "event_id", "v")
    Bucketing.writeBucketed(probes, "spec_asof_probe_b", n, "k", tmp("asof-p"))
    Bucketing.writeBucketed(builds, "spec_asof_build_b", n, "k", tmp("asof-b"))

    val joined = graft.plans.AsOfJoinPlan.asOf(
      spark.table("spec_asof_probe_b"), spark.table("spec_asof_build_b"),
      key = "k", probeTs = "pts", buildTs = "bts", tiebreak = "event_id",
      buildCols = Seq("bts", "v"))
    val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed as-of must not shuffle:\n${joined.queryExecution.executedPlan}")

    // same rows as the rewrite-based operator over the raw frames
    val want = AsOfJoin.asOf(probes, builds, key = "k", probeTs = "pts",
      buildTs = "bts", buildCols = Seq("bts", "v"), tiebreak = "event_id")
      .select("probe_id", "b_bts", "b_v")
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
    val got = joined.select("probe_id", "b_bts", "b_v")
      .as[(Long, Option[Timestamp], Option[Double])].collect().toSet
    assert(got === want)
  }

  test("aggregation on the bucket key also runs shuffle-free") {
    Bucketing.writeBucketed(facts, "spec_agg_b", 8, "k", tmp("agg"))
    val agg = spark.table("spec_agg_b").groupBy("k")
      .agg(count(lit(1)).as("n"), sum("seq").as("s"))
    val exchanges = collectWithSubqueries(agg.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, "groupBy(bucket key) must reuse the layout")
    assert(agg.count() == 97)
  }
}
