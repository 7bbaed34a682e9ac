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
              approxNdv: Boolean = false): DataFrame = {
    require(columns.nonEmpty, "profile needs at least one column")
    val unknown = columns.filterNot(df.columns.contains)
    require(unknown.isEmpty, s"unknown column(s): ${unknown.mkString(", ")}")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        (if (approxNdv) approx_count_distinct(col(c))
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
}
