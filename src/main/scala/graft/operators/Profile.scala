package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column profiling — the ANALYZE/statistics pass a pipeline runs over
  * a new corpus drop before anything else touches it: per column, row
  * and null counts, exact distinct cardinality, and min/max rendered as
  * strings (type-agnostic, so one output schema serves every table).
  *
  * Scale design: ONE job for the whole profile. The per-column scalar
  * stats (count/nulls/min/max) compute as a single aggregation pass
  * with map-side partials; the exact distinct counts ride the same
  * collected row as `count(DISTINCT col)` aggregates — Spark plans the
  * multi-distinct with one expand + partial aggregation, which is the
  * exact-NDV cost floor. For the 100x path swap exact NDV for
  * `approx_count_distinct` (one ordinary aggregation, mergeable HLL
  * partials — same trade the catalog's q_approx_distinct documents);
  * `approxNdv = true` does exactly that.
  */
object Profile {

  /** One row per profiled column: (col_name, n_rows, n_null,
    * n_distinct, min_val, max_val) — min/max as strings, null for
    * all-null columns.
    */
  def profile(df: DataFrame, columns: Seq[String],
              approxNdv: Boolean = false,
              ndvRsd: Double = 0.05): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val unknown = columns.filterNot(df.columns.contains)
    require(unknown.isEmpty, s"unknown column(s): ${unknown.mkString(", ")}")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approxNdv) approx_count_distinct(col(c), ndvRsd)
         else countDistinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).head()
    val n = row.getAs[Long]("__n")
    val spark = df.sparkSession
    import spark.implicits._
    columns.map { c =>
      val nonNull = row.getAs[Long](s"__nn_$c")
      (c, n, n - nonNull, row.getAs[Long](s"__nd_$c"),
        Option(row.getAs[String](s"__mn_$c")),
        Option(row.getAs[String](s"__mx_$c")))
    }.toDF("col_name", "n_rows", "n_null", "n_distinct",
      "min_val", "max_val")
  }

  /** Equi-width histogram of a numeric column: one min/max pass fixes
    * the range, then one aggregation pass counts rows per bin (nulls
    * excluded; the top edge folds into the last bin). Both passes are
    * single map-side-combined aggregations — the scalable shape at any
    * corpus size, and every arithmetic step is plain IEEE double so an
    * external engine replays bins bit-identically (the q_profile_hist
    * oracle recomputes them in SQL).
    *
    * Output: (bin, n) for every non-empty bin, bin in [0, nBins).
    */
  def histogram(df: DataFrame, column: String, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    require(df.columns.contains(column), s"unknown column: $column")
    val r = df.agg(min(col(column)).cast("double"),
      max(col(column)).cast("double")).head()
    val spark = df.sparkSession
    if (r.isNullAt(0)) {
      import spark.implicits._
      return Seq.empty[(Long, Long)].toDF("bin", "n")
    }
    val lo = r.getDouble(0)
    val hi = r.getDouble(1)
    val width = if (hi > lo) (hi - lo) / nBins else 1.0
    df.filter(col(column).isNotNull)
      .select(least(floor((col(column).cast("double") - lo) / width),
        lit(nBins - 1).cast("double")).cast("long").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** Equi-depth histogram: bin boundaries from the approxQuantile
    * sketch (mergeable Greenwald-Khanna partials — the same machinery
    * Layout.zorderWrite uses for its range boundaries), then one count
    * pass per bin. Depths are approximately n/nBins within the
    * sketch's relative error (ProfileSpec pins the band); boundaries
    * on heavily-duplicated values can merge, so the row count is at
    * most nBins. Output: (bin, bin_lo, bin_hi, n).
    */
  def quantileHistogram(df: DataFrame, column: String, nBins: Int,
                        relativeError: Double = 0.001): DataFrame = {
    require(nBins > 0, "nBins must be positive")
    require(df.columns.contains(column), s"unknown column: $column")
    val probs = (0 to nBins).map(_.toDouble / nBins).toArray
    val qs = df.filter(col(column).isNotNull)
      .stat.approxQuantile(column, probs, relativeError)
    val spark = df.sparkSession
    import spark.implicits._
    if (qs.isEmpty) return Seq.empty[(Long, Double, Double, Long)]
      .toDF("bin", "bin_lo", "bin_hi", "n")
    // collapse duplicate boundaries (skewed columns); intervals are
    // [lo, hi) except the last, which is [lo, hi]
    val edges = qs.distinct.sorted
    val conds = edges.toSeq.sliding(2).zipWithIndex.collect {
      case (Seq(a, b), i) =>
        val c = col(column).cast("double")
        val in = if (b == edges.last) c >= a && c <= b else c >= a && c < b
        (i.toLong, a, b, in)
    }.toSeq
    val binCol = conds.foldRight(lit(null).cast("long")) {
      case ((i, _, _, in), acc) => when(in, lit(i)).otherwise(acc)
    }
    val counts = df.filter(col(column).isNotNull)
      .select(binCol.as("bin")).filter(col("bin").isNotNull)
      .groupBy("bin").agg(count(lit(1)).as("n"))
    val bounds = conds.map { case (i, a, b, _) => (i, a, b) }
      .toDF("bin", "bin_lo", "bin_hi")
    bounds.join(counts, Seq("bin"), "left")
      .select(col("bin"), col("bin_lo"), col("bin_hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }
}
