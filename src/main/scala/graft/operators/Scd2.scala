package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 builder: turn a change log (one row
  * per key mutation, the shape a CDC feed or the reference's upsert
  * stream delivers — reference CRMLSJoiner.scala:179's versioned
  * envelope rows) into validity intervals `[valid_from, valid_to)` with
  * a current-row flag.
  *
  * This is the batch complement of the engine's as-of join
  * ([[AsOfJoin]]): SCD2 materializes the interval table once; an
  * interval/as-of join then answers "which version was live at time t"
  * without re-deriving history per query.
  *
  * Scale: one window over the key partition — a single exchange keyed
  * on the dimension key, no self-join (the naive formulation joins the
  * change log to itself on "next change"; `lead()` does it in one pass).
  * `is_current` is emitted as an int (1/0) so downstream engines and
  * external oracles agree on the encoding.
  */
object Scd2 {

  def intervals(changes: DataFrame, keyCol: String, tsCol: String,
                tiebreakCol: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tiebreakCol))
    changes
      .select((Seq(keyCol, tsCol, tiebreakCol) ++ attrCols).map(col): _*)
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, lit(1L)).otherwise(lit(0L)))
      .drop(tsCol)
  }
}
