package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Outlier handling for numeric feature columns (SURVEY §2.10): robust
  * per-group winsorization — clamp a value column to its group's exact
  * [pLo, pHi] percentile band before aggregation, the standard defence
  * against a fat-tailed metric poisoning a mean.
  *
  * Scale design: percentiles aggregate per GROUP (one shuffle on the
  * group key, map-side partial sketch), producing a thresholds frame
  * with one row per group — broadcast-joined back, so the clamp itself
  * is map-only. Exact `percentile` is the oracle-matched default; at
  * 100 TB swap `percentile` for `percentile_approx` (same plan shape,
  * sketch-bounded memory) — the clamp and the downstream aggregation
  * are unchanged.
  */
object Outliers {

  /** Per-group winsorization thresholds: exact interpolated percentiles
    * `pLo`/`pHi` of `valueCol` within each `groupCol` group.
    */
  def winsorThresholds(df: DataFrame, groupCol: String, valueCol: String,
                       pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"bad band [$pLo, $pHi]")
    // one percentile buffer per group, not two: the array form computes
    // both points from a single collected value buffer (same exact
    // interpolation, bit-identical results), halving the dominant
    // aggregation state (r12; two scalar percentile() aggs each held a
    // full copy of every group value)
    df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, array($pLo, $pHi))").as("__p"))
      .select(col(groupCol), col("__p").getItem(0).as("__lo"),
        col("__p").getItem(1).as("__hi"))
  }

  /** `df` with `valueCol` clamped to its group's [pLo, pHi] band in a
    * new column `<valueCol>_w`. The thresholds side is one row per
    * group — broadcast by hint so the clamp never shuffles the fact
    * table.
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    val thr = winsorThresholds(df, groupCol, valueCol, pLo, pHi)
    df.join(broadcast(thr), Seq(groupCol))
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** The catalog reporting shape: per-group row count and the raw vs
    * winsorized mean of `valueCol` — the one-line "did the tails move
    * the metric" check.
    */
  def winsorizedMeans(df: DataFrame, groupCol: String, valueCol: String,
                      pLo: Double, pHi: Double): DataFrame =
    winsorize(df, groupCol, valueCol, pLo, pHi)
      .groupBy(groupCol).agg(
        count(lit(1)).as("n"),
        round(avg(col(valueCol)), 4).as("mean_raw"),
        round(avg(col(s"${valueCol}_w")), 4).as("mean_winsorized"))

  /** Per-group z-score anomaly flagging: standardize `valueCol` against
    * its group's mean and sample standard deviation, flag |z| beyond
    * `threshold` — the monitoring-pipeline "this metric value is off
    * for its segment" primitive.
    *
    * Same plan stance as [[winsorize]]: one per-group aggregation (rows
    * = number of groups) broadcast back, the scoring pass map-only.
    * Degenerate groups (one row, or zero variance) emit NULL z and
    * false is_anomaly rather than a divide-by-zero.
    *
    * Output: input columns plus `z` (rounded to 6) and `is_anomaly`.
    */
  def zscore(df: DataFrame, groupCol: String, valueCol: String,
             threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val stats = df.groupBy(groupCol).agg(
      avg(col(valueCol)).as("__mu"),
      stddev_samp(col(valueCol)).as("__sd"))
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("z",
        round((col(valueCol) - col("__mu")) /
          when(col("__sd") > 0, col("__sd")), 6))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__mu", "__sd")
  }

  /** Robust (median/MAD) outlier flags — the fat-tail-safe counterpart
    * to [[zscore]]: a single planted extreme inflates the mean AND the
    * stddev (masking itself), but moves the median and the median
    * absolute deviation barely at all. robust_z = 0.6745·(x − med)/MAD
    * (the consistency constant makes it stddev-comparable for normal
    * data), flagged beyond `threshold`.
    *
    * Two per-group aggregation passes by necessity (the deviations
    * need the median first); both produce one-row-per-group frames
    * broadcast back, so the fact table still never shuffles. Exact
    * `percentile` is the oracle mode; swap `percentile_approx` at
    * 100 TB, same plan shape.
    */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  threshold: Double): DataFrame = {
    require(threshold > 0, s"threshold must be positive, got $threshold")
    val med = df.groupBy(groupCol)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed
      .groupBy(groupCol)
      .agg(expr(s"percentile(abs($valueCol - __med), 0.5)").as("__mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("robust_z",
        round(lit(0.6745) * (col(valueCol) - col("__med")) /
          when(col("__mad") > 0, col("__mad")), 6))
      .withColumn("is_outlier",
        coalesce(abs(col("robust_z")) > threshold, lit(false)))
      .drop("__med", "__mad")
  }
}
