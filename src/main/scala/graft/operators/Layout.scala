package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.NativeExpressions

/** Multi-dimensional data layout: Z-order (Morton) clustering so that
  * parquet min/max zone maps prune scans on ANY of the clustered
  * columns, not just the leading sort key.
  *
  * A plain `ORDER BY a` layout prunes filters on `a` perfectly and
  * filters on `b` not at all; interleaving the bits of rank-quantized
  * `a` and `b` gives every clustered column locality proportional to
  * its share of the interleave — the standard lakehouse layout for
  * multi-column point/range scans at 100 TB ("OPTIMIZE ZORDER BY").
  *
  * Realization is Spark-shaped end to end:
  *   1. ONE `approxQuantile` sketch pass computes per-column quantile
  *     boundaries (driver footprint = nTiles doubles per column — the
  *     same class as a fitted range partitioner). A global `ntile()`
  *     window would be semantically identical and scale-fatal: no
  *     partition key means every row through one partition.
  *   2. bucket assignment is a row-local native binary search over the
  *     referenced boundary array ([[NativeExpressions.SearchBucket]]);
  *     rank-space interleaving makes the layout immune to skew and
  *     value-range width — only order matters.
  *   3. rows are range-partitioned + sorted by the interleaved Morton
  *     value and written; each output file then owns a compact
  *     hyper-rectangle of the clustered space, which is exactly the
  *     shape min/max zone maps prune.
  *
  * LayoutSpec measures the effect rather than asserting folklore:
  * after z-ordering on (a, b), a selective filter on EITHER column
  * must touch a small fraction of files; the linear-sort baseline
  * only manages that for its leading column.
  */
object Layout {

  /** Morton-interleave the columns' quantile ranks into one sortable
    * long. `bits` quantile bits per column; `columns.length * bits`
    * must fit a long (<= 63). Numeric columns only (ranks come from a
    * double-space quantile sketch).
    */
  def zValue(df: DataFrame, columns: Seq[String], bits: Int = 8): Column = {
    require(columns.nonEmpty, "need at least one column")
    require(columns.length * bits <= 63,
      s"${columns.length} cols x $bits bits exceeds a long")
    val nTiles = 1 << bits
    val probs = (1 until nTiles).map(_.toDouble / nTiles).toArray
    val doubled = columns.foldLeft(df) { (d, c) =>
      d.withColumn(s"__zq_$c", col(c).cast("double"))
    }
    val bounds = doubled.stat.approxQuantile(
      columns.map(c => s"__zq_$c").toArray, probs, 0.25 / nTiles)
    val ranks = columns.zip(bounds).map { case (c, b) =>
      NativeExpressions.searchBucket(col(c).cast("double"),
        b.distinct.sorted)
    }
    val nCols = columns.length
    val pieces = for {
      (r, i) <- ranks.zipWithIndex
      j <- 0 until bits
    } yield shiftleft(
      shiftright(r, j).bitwiseAND(lit(1L)), j * nCols + i)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Z-order `df` by `columns` and write parquet laid out so each file
    * covers a compact hyper-rectangle: range-partition by the Morton
    * value into `numFiles` partitions, sort within, write.
    */
  def zorderWrite(df: DataFrame, columns: Seq[String], path: String,
                  numFiles: Int, bits: Int = 8): Unit =
    df.withColumn("__z", zValue(df, columns, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Linear-sort layout (the baseline z-order beats on trailing
    * columns): global range sort by the given columns, same file count.
    */
  def linearWrite(df: DataFrame, columns: Seq[String], path: String,
                  numFiles: Int): Unit =
    df.repartitionByRange(numFiles, columns.map(col): _*)
      .sortWithinPartitions(columns.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Clustering quality probe: the number of files holding rows that
    * satisfy `predicate` — the zone-map pruning proxy LayoutSpec and
    * the catalog measure (a file with no matching rows is a file a
    * min/max index skips).
    */
  def filesTouched(df: DataFrame, predicate: Column): Long =
    df.filter(predicate)
      .select(col("_metadata.file_path"))
      .distinct().count()

  /** Target-file-size writer — the small-files control. A job that
    * writes one file per shuffle partition produces 100-KB files at
    * one scale and 10-GB files at another; both break the next
    * reader (footer-per-file overhead and no scan parallelism,
    * respectively). This sizes the file count from the SOURCE's
    * planned on-disk bytes (Catalyst's `sizeInBytes` statistic — for
    * a parquet scan, the actual file bytes after pruning) divided by
    * the target, then lays rows out with ONE range exchange on
    * `sortCols` + in-partition sort, so files are evenly sized AND
    * carry compact min/max zone maps on the sort key. Parquet-in →
    * parquet-out keeps compressed bytes comparable, so planned bytes
    * track written bytes; SizedWriteSpec asserts the realized file
    * sizes land in a band around the target rather than trusting
    * the estimate.
    *
    * Returns the file count it chose. Content is partition-count
    * independent (no sampling, no rand), which is what the catalog
    * oracle pins.
    */
  def sizedWrite(df: DataFrame, sortCols: Seq[String], path: String,
                 targetFileBytes: Long = 128L << 20,
                 maxFiles: Int = 100000): Int = {
    require(sortCols.nonEmpty, "need at least one sort column")
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val planned = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val wanted = (planned + targetFileBytes - 1) / targetFileBytes
    val numFiles = wanted.min(maxFiles).max(1).toInt
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
    numFiles
  }
}
