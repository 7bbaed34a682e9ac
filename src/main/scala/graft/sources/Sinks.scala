package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch sink/layout helpers: partitioned and bucketed parquet.
  *
  * Layout is THE 100 TB lever: date/key partitioning gives partition
  * pruning at the scan; bucketing by join key gives co-located
  * (exchange-free) fact-fact joins — the one join shape where neither
  * side broadcasts and a shuffle would move terabytes.
  */
object Sinks {

  /** Write partitioned parquet (hive-style dirs); readers prune
    * partitions from `WHERE` predicates on the partition columns.
    */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Save as a bucketed table (metastore-managed): `buckets` files per
    * partition, rows hash-bucketed by `bucketCols` and sorted within
    * buckets by `sortCols`. Two tables bucketed the same way join with
    * ZERO exchange and zero sort.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    bucketCols: Seq[String],
                    sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    val s = if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w
    s.format("parquet").saveAsTable(table)
  }

  /** Co-located join of two same-bucketed tables. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, on: Seq[String],
                   joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, joinType)
}
