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

  /** Adamic–Adar link prediction over an undirected edge list: for
    * every NON-edge pair (a < b) sharing at least one neighbor, the
    * score Σ_z 1/ln(deg(z)) over common neighbors z — rare shared
    * neighbors say more than hubs (Adamic & Adar 2003). The classic
    * related-item / link-suggestion feature for the graphs the dedup
    * and entity tiers produce.
    *
    * Same wedge-join shape and Σ deg(z)² work bound as
    * [[triangleCounts]]; `maxDegree` excludes hub middles from wedge
    * generation (the standard mitigation — a hub's 1/ln(deg) term is
    * the least informative and its deg² wedge fan-out the most
    * expensive; at web scale you ALWAYS cap). A degree-1 middle can't
    * join two nodes, so deg(z) >= 2 and ln is never zero.
    *
    * Output: (id_a, id_b, n_common, aa_score rounded to 6).
    */
  def adamicAdar(edges: DataFrame,
                 maxDegree: Option[Int] = None): DataFrame = {
    val canon = edges
      .select(least(col("id_a"), col("id_b")).as("a"),
        greatest(col("id_a"), col("id_b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val adj = canon.select(col("a").as("z"), col("b").as("n"))
      .unionByName(canon.select(col("b").as("z"), col("a").as("n")))
    // ONE aggregation per middle replaces the degree aggregation + the
    // wedge self-join: adj is distinct by construction, so the sorted
    // neighbor list IS the degree, and the Σ deg² wedge-pair stream is
    // produced by codegen'd collection expressions (posexplode +
    // slice) instead of flowing through a join exchange twice. Per-row
    // memory is the neighbor list — bounded by `maxDegree` when
    // capped; an UNCAPPED call on a hub-bearing graph materializes a
    // hub's full list in one row, which is exactly why web scale
    // always caps (the scaladoc note above).
    val byMid = adj
      .groupBy("z").agg(sort_array(collect_list(col("n"))).as("ns"))
      .withColumn("__deg", size(col("ns")))
      .filter(col("__deg") >= 2) // a degree-1 middle joins nothing
    val mids = maxDegree.foldLeft(byMid)((d, cap) =>
      d.filter(col("__deg") <= cap))
    // Pin the explode stage's parallelism (r13, guide §2.2/§2.5): AQE
    // coalesces the post-aggregation partitions from the INPUT bytes
    // of the middle table (a few MB of capped neighbor lists), blind
    // to the Σ deg² wedge-pair amplification the explode is about to
    // apply — measured 5 tasks carrying an 82 MB pair stream at sf0.1.
    // An explicit hash repartition (REPARTITION_BY_NUM is exempt from
    // AQE coalescing) moves only the capped lists once and buys the
    // amplified stage full parallelism at any scale. The (z, __deg)
    // compound key is deliberate: hash(z) alone is satisfied by the
    // aggregation's own exchange, so EnsureRequirements elides it and
    // the AQE-coalesced reader comes back.
    val midsSpread = mids.repartition(
      edges.sparkSession.sparkContext.defaultParallelism,
      col("z"), col("__deg"))
    val pairs = midsSpread
      .select((lit(1.0) / log(col("__deg").cast("double"))).as("__w"),
        col("ns"), posexplode(col("ns")).as(Seq("__i", "a")))
      // neighbors after position __i (sorted, distinct => a < b, each
      // unordered pair generated exactly once per middle)
      .select(col("__w"), col("a"),
        explode(expr("slice(ns, __i + 2, size(ns))")).as("b"))
    // Aggregate BEFORE the anti-join: the anti-join then probes the
    // distinct candidate-pair set (bounded by #pairs) instead of the
    // raw Σ deg² wedge stream, and the groupBy's hash partitioning on
    // (a, b) is reused by the anti-join — one exchange saved and the
    // anti-join input is orders of magnitude smaller on dense graphs.
    pairs
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_common"),
        round(sum("__w"), 6).as("aa_score"))
      .join(canon, Seq("a", "b"), "left_anti") // predict NEW links only
      .select(col("a").as("id_a"), col("b").as("id_b"),
        col("n_common"), col("aa_score"))
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
    * the plan depth so Catalyst sees a fixed join chain.
    *
    * Two DEEP-TRAVERSAL knobs, both off by default (at the
    * feature-engineering depths this usually serves — 2-4 hops — the
    * straight lazy chain is the faster plan, and the oracle-checked
    * catalog row deliberately prices that honest shape):
    *
    *  - `cacheEdges` persists the doubled edge list, so each hop scans
    *    memory instead of re-deriving the union from the source scan —
    *    the per-hop constant a depth-20 crawl cares about;
    *  - `checkpointEvery = k` (> 0) switches to materialized
    *    iteration: EVERY hop's frontier increment is eagerly
    *    `localCheckpoint`ed (computed exactly once — a lazy chain
    *    re-derives each round inside every later round's plan, which
    *    is the classic quadratic lineage blowup; the stress harness's
    *    flatness bar caught precisely that on a checkpoint-the-span
    *    variant), and the visited UNION is flattened every k hops so
    *    plan width stays bounded at long diameters.
    *
    * With either knob on, the RESULT is materialized (eager
    * checkpoint) before returning — iterative traversals act per hop
    * anyway — and the edge cache is released. Output is identical to
    * the lazy shape: (id, hops), hops in [0, maxHops].
    *
    * Fault-tolerance (multi-executor deploys): the default
    * localCheckpoint blocks are unreplicated and lineage-truncated, so
    * an executor loss mid-traversal fails the job instead of
    * recomputing — the traversal restarts from `edges`, which is
    * recomputable. Where that retry cost matters, pass
    * `reliableCheckpoint = true` (with sparkContext.setCheckpointDir)
    * and each materialization persists to the reliable store instead
    * ([[Checkpoints.materialize]] documents the trade).
    *
    * `edges` is undirected (`id_a`, `id_b`); `seeds` is a single
    * column `id`.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int,
              cacheEdges: Boolean = false,
              checkpointEvery: Int = 0,
              reliableCheckpoint: Boolean = false): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val dir0 = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    val dir = if (cacheEdges) dir0.persist() else dir0
    var visited = seeds.select(col("id")).distinct()
      .withColumn("hops", lit(0))
    var frontier = visited.select(col("id"))
    // reliable-store hygiene: a frontier's checkpoint files stay live
    // while EITHER the next round's join reads it or the (not yet
    // re-materialized) visited union still has it in lineage — so
    // superseded frontiers park in `pending` and are released on the
    // next visited materialization, which covers them; each visited
    // checkpoint also supersedes the previous one.
    val pending = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var lastVisitedCkpt: Option[DataFrame] = None
    for (h <- 1 to maxHops) {
      var next = dir
        .join(frontier.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(visited, Seq("id"), "left_anti")
      if (checkpointEvery > 0)
        next = Checkpoints.materialize(next, reliableCheckpoint)
      pending += frontier
      frontier = next
      visited = visited.unionByName(next.withColumn("hops", lit(h)))
      if (checkpointEvery > 0 && h % checkpointEvery == 0 && h < maxHops) {
        visited = Checkpoints.materialize(visited, reliableCheckpoint)
        pending.foreach(Checkpoints.release)
        pending.clear()
        lastVisitedCkpt.foreach(Checkpoints.release)
        lastVisitedCkpt = Some(visited)
      }
    }
    if (cacheEdges || checkpointEvery > 0) {
      val out = Checkpoints.materialize(visited, reliableCheckpoint)
      pending.foreach(Checkpoints.release)
      Checkpoints.release(frontier)
      lastVisitedCkpt.foreach(Checkpoints.release)
      if (cacheEdges) dir.unpersist()
      out
    } else visited
  }
}
