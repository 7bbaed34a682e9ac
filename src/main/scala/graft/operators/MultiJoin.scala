package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Multi-way LEFT OUTER equi-join — the core of the reference.
  *
  * The reference's production query is an 11-way streaming left join of
  * deduped listings against agents (x4 role keys), open-houses, offices
  * (x4 role keys), media and history (reference CRMLSJoiner.scala:471-487),
  * with the same dimension table joined several times under aliases
  * (self-join via roles, CRMLSJoiner.scala:475-483).
  *
  * Spark realization: chained `DataFrame.join(..., "left_outer")`.
  * Catalyst + AQE pick broadcast-hash for dimensions under the broadcast
  * threshold; callers mark known-small dimensions with
  * `dim.hint("broadcast")` via the `broadcastDim` flag so that at 100 TB
  * the fact table is never shuffled for a 25-row `nation`-sized dim.
  * Re-used dimensions (role joins) should be passed as the SAME cached
  * DataFrame re-aliased — Spark broadcasts it once and reuses the
  * exchange.
  */
object MultiJoin {

  /** One dimension join spec: the dim frame, the join condition builder
    * (given the accumulated left side), and whether to broadcast.
    */
  final case class Dim(df: DataFrame, cond: DataFrame => Column,
                       broadcastDim: Boolean = true)

  /** Left-join `fact` against every dim in order. */
  def leftJoinAll(fact: DataFrame, dims: Seq[Dim]): DataFrame =
    dims.foldLeft(fact) { (acc, d) =>
      val right = if (d.broadcastDim) broadcast(d.df) else d.df
      acc.join(right, d.cond(acc), "left_outer")
    }
}
