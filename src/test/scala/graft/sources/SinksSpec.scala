package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SinksSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed join of same-bucketed tables plans with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val fact = (1 to 10000).map(i => (i.toLong % 500, s"f$i")).toDF("k", "f")
      val dim = (1 to 5000).map(i => (i.toLong % 500, s"d$i")).toDF("k", "d")
      Sinks.writeBucketed(fact, "fact_b", 8, Seq("k"), Seq("k"))
      Sinks.writeBucketed(dim, "dim_b", 8, Seq("k"), Seq("k"))

      val joined = Sinks.bucketedJoin(spark, "fact_b", "dim_b", Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      // correctness: matches the plain join count
      assert(joined.count() ===
        fact.join(dim, Seq("k")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS fact_b")
      spark.sql("DROP TABLE IF EXISTS dim_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("partitioned write enables partition pruning at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"p${i % 5}", i * 1.0)).toDF("id", "part", "v")
    Sinks.writePartitioned(df, dir, Seq("part"))
    val read = spark.read.parquet(dir).filter(col("part") === "p3")
    assert(read.count() === 200)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("p0"),
      "partition filter should prune directories")
  }
}
