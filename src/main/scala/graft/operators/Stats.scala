package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classical statistical tests as single-aggregation plans (SURVEY
  * §2.10 widening: the experimentation/feature-screening analytics a
  * product pipeline runs on the same engine).
  *
  * Both tests reduce to one bounded aggregation (cells = category
  * product, arms = 2) with the test statistic computed over that
  * bounded frame — nothing scales beyond the first exchange. P-value
  * lookup is left to the caller (the statistic and dof are the
  * deterministic, oracle-comparable part; CDF evaluation is a scalar
  * client-side step).
  */
object Stats {

  /** Pearson chi-square test of independence between two categorical
    * columns: one (a, b) contingency aggregation, expected counts from
    * broadcast marginals, X² = Σ (obs − exp)²/exp.
    *
    * Output: one row — (chi2, dof, n) with chi2 rounded to 6.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.groupBy(col(aCol).as("__a"), col(bCol).as("__b"))
      .agg(count(lit(1)).as("__o"))
    val ra = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val rb = cells.groupBy("__b").agg(sum("__o").as("__rb"))
    val n = cells.agg(sum("__o").as("__n"))
    val stat = cells
      .join(broadcast(ra), Seq("__a"))
      .join(broadcast(rb), Seq("__b"))
      .crossJoin(broadcast(n))
      .select(
        (col("__o") - col("__ra") * col("__rb") / col("__n").cast("double"))
          .as("__d"),
        (col("__ra") * col("__rb") / col("__n").cast("double")).as("__e"),
        col("__n"))
      .agg(
        round(sum(col("__d") * col("__d") / col("__e")), 6).as("chi2"),
        max(col("__n")).as("__nn"))
    stat
      .crossJoin(broadcast(ra.agg(count(lit(1)).as("__na"))))
      .crossJoin(broadcast(rb.agg(count(lit(1)).as("__nb"))))
      .select(col("chi2"),
        ((col("__na") - 1) * (col("__nb") - 1)).cast("long").as("dof"),
        col("__nn").cast("long").as("n"))
  }

  /** Two-proportion z-test (the A/B-test staple): conversion rates of
    * two arms compared under the pooled-variance normal approximation,
    * z = (p1 − p2) / sqrt(p̂(1−p̂)(1/n1 + 1/n2)).
    *
    * @param armCol  boolean-ish column: true = arm 1, false = arm 2
    * @param hitCol  boolean-ish column: true = converted
    * @return one row — (n1, x1, p1, n2, x2, p2, z) with rates and z
    *         rounded to 6
    */
  def twoProportionZ(df: DataFrame, armCol: Column, hitCol: Column): DataFrame = {
    val agg = df.select(armCol.cast("boolean").as("__arm"),
        hitCol.cast("boolean").cast("long").as("__hit"))
      .agg(
        sum(when(col("__arm"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("__arm"), col("__hit")).otherwise(0L)).as("x1"),
        sum(when(!col("__arm"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("__arm"), col("__hit")).otherwise(0L)).as("x2"))
    agg.select(
      col("n1"), col("x1"),
      round(col("x1") / col("n1").cast("double"), 6).as("p1"),
      col("n2"), col("x2"),
      round(col("x2") / col("n2").cast("double"), 6).as("p2"),
      round(
        (col("x1") / col("n1").cast("double") -
          col("x2") / col("n2").cast("double")) /
          sqrt(((col("x1") + col("x2")) / (col("n1") + col("n2")).cast("double")) *
            (lit(1.0) - (col("x1") + col("x2")) / (col("n1") + col("n2")).cast("double")) *
            (lit(1.0) / col("n1") + lit(1.0) / col("n2"))), 6).as("z"))
  }
}
