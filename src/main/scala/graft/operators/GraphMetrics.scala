package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-based graph metrics over an undirected edge list — the
  * structural companions to [[PageRank]] (centrality) and
  * [[DedupOps.duplicateClusters]] (components) for the linkage/dup
  * graphs the dedup tier produces. A near-dup cluster that is a CLIQUE
  * (every member pairs with every member) is a true duplicate family;
  * one that is a sparse chain is transitive drift — triangle density
  * is the cheap separator.
  */
object GraphMetrics {

  /** Per-node triangle participation counts (nodes in no triangle are
    * absent). The classic two-join formulation: canonical a<b edges,
    * wedge join on the middle vertex, closure semi-join — work is
    * Σ deg(v)² for the wedge stage, the standard bound; every join is
    * an equi-join on node ids (never a cartesian), so skew protection
    * is the same degree-cap/AQE toolkit the jaccard tier uses.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    // wedges a<b<c with edges (a,b) and (b,c)
    val wedges = canon
      .join(canon.select(col("a").as("b"), col("b").as("c")), Seq("b"))
    // closure: (a,c) must be an edge; a<b<c means each triangle is
    // generated exactly once
    val tris = wedges
      .join(canon.select(col("a"), col("b").as("c")), Seq("a", "c"),
        "left_semi")
    tris
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Bounded-depth BFS: minimum hop distance from a seed set, for
    * every node within `maxHops` (unreached nodes are absent). The
    * crawl-frontier / link-distance-feature primitive: "everything
    * within k purchase-graph hops of these accounts".
    *
    * Classic frontier iteration, one round per hop: neighbors of the
    * frontier, minus everything already visited (a node enters on its
    * FIRST reachable hop, which is its minimum distance — no min-agg
    * needed afterwards). Each round is two id-keyed equi-shuffles
    * (neighbor distinct + visited anti-join); the frontier and visited
    * sets carry (id, hops) only, never payloads, and `maxHops` bounds
    * the plan depth so Catalyst sees a fixed join chain. For deep
    * traversals (maxHops ≳ 10) checkpoint `visited` every few rounds
    * to cut lineage — at the feature-engineering depths this serves
    * (2-4 hops) the straight chain is the faster plan.
    *
    * `edges` is undirected (`id_a`, `id_b`); `seeds` is a single
    * column `id`. Output: (id, hops), hops in [0, maxHops].
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val dir = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    var visited = seeds.select(col("id")).distinct()
      .withColumn("hops", lit(0))
    var frontier = visited.select(col("id"))
    for (h <- 1 to maxHops) {
      val next = dir
        .join(frontier.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
      frontier = next
      visited = visited.unionByName(next.withColumn("hops", lit(h)))
    }
    visited
  }
}
