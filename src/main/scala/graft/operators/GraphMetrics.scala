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
}
