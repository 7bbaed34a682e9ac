package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Runtime scan pruning — the two optimizer features that decide
  * whether a selective dim filter reaches the fact scan at 100 TB:
  *
  *  - dynamic partition pruning (DPP): a filter on the dim side of a
  *    join on the fact's PARTITION column becomes a runtime partition
  *    filter on the fact scan, so the query reads 2 of 20 partitions
  *    instead of all 20;
  *  - runtime bloom-filter join pruning: for shuffle joins on
  *    non-partition columns, a bloom filter built from the (filtered)
  *    creation side is pushed into the application side's scan,
  *    discarding non-joining rows before the exchange.
  *
  * These are Catalyst features, not graft code — but the engine's
  * scale story depends on its plans keeping them eligible, so this
  * spec pins both: the expected expression in the executed plan AND
  * (for DPP) the realized file pruning.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) =>
      k -> (try Some(spark.conf.get(k)) catch { case _: Exception => None })
    }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("DPP: dim filter prunes fact partitions at runtime") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dpp").toString
    (0L until 20000L).map(i => (i, i % 20))
      .toDF("id", "k")
      .write.mode("overwrite").partitionBy("k").parquet(s"$dir/fact")
    (0L until 20L).map(i => (i, s"dim$i"))
      .toDF("dk", "name")
      .write.mode("overwrite").parquet(s"$dir/dim")
    // the fact-side file path is projected BEFORE the join: both scan
    // legs are parquet, so `_metadata` would be ambiguous afterwards
    val fact = spark.read.parquet(s"$dir/fact")
      .withColumn("__file", col("_metadata.file_path"))
    val dim = spark.read.parquet(s"$dir/dim")
      .filter(col("name").isin("dim3", "dim7"))
    val joined = fact.join(dim, col("k") === col("dk"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"fact scan must carry a dynamic pruning filter:\n${plan.take(2000)}")
    // realized pruning: only the two matching partition directories
    // contribute files to the scan
    val files = joined.select(col("__file")).distinct()
      .collect().map(_.getString(0)).toSeq
    assert(files.nonEmpty &&
      files.forall(f => f.contains("k=3") || f.contains("k=7")), files)
    assert(joined.count() === 2000L)
  }

  test("bloom-filter join pruning: probe pushed to the application side") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-bloom").toString
    (0L until 200000L).map(i => (i, i % 1000))
      .toDF("id", "fk")
      .write.mode("overwrite").parquet(s"$dir/fact")
    (0L until 1000L).map(i => (i, i % 50))
      .toDF("dk", "grp")
      .write.mode("overwrite").parquet(s"$dir/dim")
    withConf(
      // force a shuffle join (bloom injection targets shuffle joins;
      // a broadcast join already prunes at the hash table)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // the real thresholds target multi-GB scans; drop them so the
      // injection fires at test scale
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("grp") === 7)
      val joined = fact.join(dim, col("fk") === col("dk"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"application side must probe a runtime bloom filter:\n${plan.take(3000)}")
      // 20 of 1000 dim keys survive grp=7; 200 fact rows each
      assert(joined.count() === 4000L)
    }
  }
}
