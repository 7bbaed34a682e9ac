package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy tooling for dataset release (SURVEY §2.10 widening): the
  * two screens a data-release pipeline runs before counts or
  * quasi-identified rows leave the boundary.
  *
  * Both are single-aggregation plans: one exchange keyed on the
  * group/QI columns, everything after it map-only over the bounded
  * group frame.
  */
object Privacy {

  /** md5-seeded uniform in (0, 1): the top 48 bits of the keyed digest
    * as (h48 + 1) / 2^48 — exact in a double, never 0 or 1 (the
    * [[TrainingOps]] weightedSample construction, so every seeded draw
    * in the library shares one primitive an external engine can
    * replay: DuckDB parses the same hex slice via a '0x' cast).
    */
  private def seededUniform(key: Column, seed: String): Column =
    (conv(substring(md5(concat_ws("|", lit(seed), key)), 1, 12), 16, 10)
      .cast("double") + 1.0) / lit(281474976710656.0) // 2^48

  /** Differentially-private count release: per-group counts with
    * Laplace(sensitivity/epsilon) noise — count queries have
    * sensitivity 1, so scale b = 1/epsilon. Noise is derived from the
    * SEEDED uniform via the inverse CDF
    * (-b * sign(u-0.5) * ln(1 - 2|u-0.5|)), which makes the release
    * deterministic and oracle-replayable; a production release swaps
    * the seed for real entropy — the plan, sensitivity math, and
    * post-processing are unchanged. The true count never leaves this
    * function's output unrounded: `n_noisy` is the release value,
    * rounded to 4 decimals (rounding is post-processing — DP survives
    * it).
    *
    * Output: (groupCol, n_noisy, epsilon).
    */
  def laplaceNoisyCounts(df: DataFrame, groupCol: String, epsilon: Double,
                         seed: String = "dp"): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    val b = 1.0 / epsilon
    val u = seededUniform(col(groupCol).cast("string"), seed)
    val centered = u - 0.5
    val noise = -lit(b) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("__n"))
      .select(col(groupCol),
        round(col("__n") + noise, 4).as("n_noisy"),
        lit(epsilon).as("epsilon"))
  }

  /** k-anonymity audit: group sizes over the quasi-identifier columns,
    * with the suppression verdict — any row whose QI combination is
    * shared by fewer than `k` rows re-identifies too easily and must
    * be suppressed or generalized before release.
    *
    * Output: one row per QI combination —
    * (qiCols..., n_rows, suppress) — plus the caller-side invariant
    * that sum(n_rows WHERE suppress) is the suppression cost.
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("suppress", col("n_rows") < k)
  }
}
