package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed-table layout: pre-shuffle a table ONCE at write time so that
  * every subsequent equi-join or aggregation on the bucket key runs with
  * NO exchange at read time.
  *
  * This is the storage-layout half of the scale story: the reference
  * keeps its join co-located by holding state partitioned by key inside
  * the engine (reference CRMLSJoiner.scala:471-487 — Flink keyed state);
  * the Spark-native equivalent for batch is hash-bucketed parquet, where
  * the bucket id is the SAME hash-partitioning Catalyst uses for
  * shuffles, so the planner proves the sides are co-partitioned and
  * drops the exchange. At 100 TB, re-shuffling a fact table per join is
  * the dominant cost; bucketing pays it once at ingest and amortizes it
  * over every downstream query.
  */
object Bucketing {

  /** Write `df` as a hash-bucketed, per-bucket-sorted parquet table
    * registered in the session catalog.
    *
    * The input is repartitioned by the bucket key into exactly
    * `numBuckets` partitions first, so each task holds exactly one
    * bucket and writes exactly ONE file per bucket —
    * one-file-per-bucket is the layout Spark requires to also elide the
    * sort-merge SORT (not just the exchange) on bucketed joins. Spark's
    * bucket id and its shuffle partitioning are the same Murmur3-based
    * `HashPartitioning`, which is what makes the write-side repartition
    * line up with the bucket files and the read-side join skip the
    * exchange.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    bucketCol: String, path: String,
                    sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    // no pre-drop: mode(overwrite) replaces the table atomically from
    // the catalog's view — an explicit DROP first would leave NO table
    // at all if the write job then fails, breaking readers that were
    // fine before the re-ingest
    val sorts = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    df.repartition(numBuckets, col(bucketCol))
      .write
      .format("parquet")
      .mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .saveAsTable(table)
  }

  /** Join two bucketed catalog tables on their bucket keys. The merge
    * hint pins sort-merge (broadcast would also avoid the exchange but
    * proves nothing about layout); with matching bucket counts on both
    * sides the physical plan contains ZERO ShuffleExchange nodes —
    * asserted by BucketingSpec, and visible in `.explain("formatted")`
    * as `Bucketed: true` scans feeding SortMergeJoin directly.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, joinExpr: Column,
                   joinType: String = "inner"): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), joinExpr, joinType)
}
