package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Oracle-replayable PageRank over an undirected edge list (SURVEY
  * §2.10 widening: graph centrality for the linkage/dup graphs the
  * dedup tier produces — "which member of an entity group is the
  * canonical hub", "which domain anchors the link neighborhood").
  *
  * Determinism stance is [[KMeans.assignRounded]]'s: every iteration's
  * rank vector is ROUNDED to `decimals` before it feeds the next
  * iteration, collapsing partition-order float-sum ulps to one
  * canonical value, so the whole chain — and therefore the SQL oracle
  * replaying it iteration by iteration — is engine- and
  * parallelism-independent (up to the measure-zero rounding-boundary
  * class every rounded oracle in this library shares).
  *
  * Scale shape: each iteration is one equi-join of the rank vector to
  * the directed edge list on the source id plus one aggregation on the
  * destination id — two bounded-key exchanges per iteration, nothing
  * proportional to pairs². Degrees come from one aggregation up front.
  * Undirected edges mean no dangling nodes (every endpoint has degree
  * >= 1), so no dangling-mass redistribution term is needed.
  */
object PageRank {

  /** Ranks after `iters` rounded power iterations.
    *
    * @param edges (id_a, id_b) undirected edges; self-loops and
    *              duplicate pairs are tolerated (they just weight the
    *              walk like parallel edges)
    * @return (id, rank) — one row per distinct endpoint
    */
  def ranks(edges: DataFrame, iters: Int, damping: Double = 0.85,
            decimals: Int = 6): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0 && damping < 1, s"damping in (0,1), got $damping")
    val dir = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    val deg = dir.groupBy("src").agg(count(lit(1)).as("__deg"))
    // n rides into the plan as a broadcast one-row scalar instead of a
    // driver count() (r13, guide §2.6/§5: the count was a full extra
    // job — scan + degree aggregation — before the real plan ran, and
    // the cache it justified buys nothing once the whole chain is ONE
    // action: exchange reuse dedups deg's scan+shuffle across the
    // iterations, and the reduce-side re-aggregation per reference is
    // cheaper than columnar cache build/read at every scale we
    // measured). The arithmetic is bit-identical: count()->double is
    // exact and the divisions are the same IEEE ops the driver-side
    // literal produced.
    val nRow = deg.agg(count(lit(1)).cast("double").as("__n"))
    // 1-row broadcast scalar attach (the MarketBasket crossJoin(n)
    // house pattern): plans as a BroadcastNestedLoopJoin whose build
    // side is a single row — O(rows), not a cartesian;
    // PlanHygieneSpec pins exactly this shape
    val degN = deg.crossJoin(broadcast(nRow))
    var r = degN.select(col("src").as("id"),
      round(lit(1.0) / col("__n"), decimals).as("rank"))
    for (_ <- 1 to iters) {
      r = dir
        .join(r.withColumnRenamed("id", "src"), Seq("src"))
        .join(degN, Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(round(lit(1.0 - damping) / max(col("__n")) + lit(damping) *
          sum(col("rank") / col("__deg")), decimals).as("rank"))
    }
    r
  }
}
