package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge. Spark 4 made the Column API
  * implementation-agnostic and the classic converters `private[sql]`;
  * this shim lives in an `org.apache.spark.sql` subpackage solely to
  * re-export the two conversions the engine's native expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a logical plan as a DataFrame (classic Dataset.ofRows is
    * private[sql]).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .logicalPlan

  /** Driver-side evaluator of `xxhash64(struct(col1, ..., colN))` over
    * external Rows of `schema` — the SAME expression tree the Column
    * form builds (seed 42, recursive struct hashing), evaluated
    * interpreted. Lets driver-tier code replicate a plan-side hash
    * tiebreak bit for bit; drift between the two would silently pick
    * different winners in merges that must converge across tiers.
    */
  def rowXxHash64(schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.Row => Long = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, CreateNamedStruct, Literal, XxHash64}
    val structExpr = CreateNamedStruct(
      schema.fields.toIndexedSeq.zipWithIndex.flatMap { case (f, i) =>
        Seq(Literal(f.name),
          BoundReference(i, f.dataType, nullable = true))
      })
    val hashExpr = XxHash64(Seq(structExpr), 42L)
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(schema)
    r => hashExpr.eval(conv(r)
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])
      .asInstanceOf[Long]
  }
}
