package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{NativeExpressions, VectorFunctions}

/** Graph-routed approximate-nearest-neighbor search (SURVEY §2.10 /
  * §12.1.5) — the serving-shape complement of [[SimilaritySearch
  * .ivfTopK]], patterned after the SPANN/DiskANN memory-graph-routes-
  * to-disk-postings split:
  *
  *  - a SMALL-WORLD GRAPH over the `nNodes` lowest-id corpus vectors
  *    is built ONCE on the driver (deterministic insertion order, each
  *    new node bidirectionally linked to its `m` exact-nearest
  *    predecessors — an NSW with exact neighbor selection, connected
  *    by construction);
  *  - corpus vectors and probes route through the graph with a greedy
  *    beam search ([[NativeExpressions.graphNearestEval]]) that is
  *    ROW-LOCAL: the node matrix + CSR adjacency travel to executors
  *    as codegen references, so assignment costs O(ef * m * dim) per
  *    row instead of IVF's O(nNodes * dim) brute scan — the reason
  *    graphs win when the routing set is large (nNodes 10k+);
  *  - candidates then join on the routed node id and rank by exact
  *    cosine through the same two-tier (broadcast | salted
  *    shuffle-hash) join and map-side-truncated top-k as IVF
  *    ([[SimilaritySearch.candidateJoinTopK]]).
  *
  * At 100 TB the corpus-side routing pass is one embarrassingly
  * parallel scan (no shuffle, no join); the graph itself is bounded by
  * nNodes (driver-built, broadcast-sized by construction) and the only
  * exchanges carry (probe x nProbe) candidate rows and pre-truncated
  * top-k partials.
  *
  * Tier guidance (measured, 10 M vectors / 1,000 nodes / ef=64 / m=8,
  * STRESS_ANN_r06): graph routing runs 1.6x IVF's wall (72 s vs 44 s,
  * zero spill, task-time spread 1.4 after the round-6 workspace-reuse
  * fix removed the per-row allocation churn that had it at 4x / spread
  * 8). The residual gap is the SHAPE, not a defect: beam expansion
  * visits a large fraction of a 1,000-node graph (up to O(n) keys) while
  * IVF brute-scans only its 250 cells, so at routing sets this small the
  * brute scan is simply less work. IVF remains the recommended
  * assignment tier until the routing set is large enough (~10k+ nodes,
  * where sqrt(N) cell counts would make the brute scan the bottleneck)
  * — which is exactly the regime this operator exists for.
  *
  * Determinism: node set = lowest-id vectors (the IVF centroid trick),
  * insertion order = ordinal, search priorities = (cosine desc,
  * ordinal asc) with zero-norm pairs last — reruns and permuted inputs
  * produce identical layouts and results. With `ef >= nNodes` the beam
  * expands the whole connected graph and routing is the EXACT argmax
  * over nodes, which is what lets q_graph_ann replay the whole index
  * in SQL (same oracle shape as q_ivf_ann).
  */
object GraphAnn {

  /** Driver-built routing graph: flat node matrix (row-major, one row
    * per node ordinal), per-node norms, CSR adjacency.
    */
  final case class Graph(nodes: Array[Double], norms: Array[Double],
                         dim: Int, adjOff: Array[Int], adj: Array[Int]) {
    def nNodes: Int = norms.length
  }

  /** Build the small-world graph over the `nNodes` lowest-id corpus
    * vectors. Insertion in ordinal order; node i links bidirectionally
    * to its `m` exact-nearest among nodes 0..i-1 by (cosine desc,
    * ordinal asc), so the graph is connected (every node reaches node
    * 0) and fully determined by the vector content. Build cost is
    * O(nNodes^2 * dim) driver-side — the same footprint class as
    * fitting the IVF quantizer, bounded by `nNodes` (guarded).
    */
  def buildGraph(corpus: DataFrame, idCol: String, vecCol: String,
                 nNodes: Int, m: Int): Graph = {
    require(nNodes > 0, "nNodes must be positive")
    require(m > 0, "m must be positive")
    require(nNodes <= 65536, s"nNodes=$nNodes past the driver-build guard")
    val rows = corpus.orderBy(col(idCol)).limit(nNodes)
      .select(VectorFunctions.toDouble(col(vecCol)).as("__v"))
      .collect()
    val vecs = rows.map(_.getSeq[Double](0).toArray)
    val n = vecs.length
    require(n > 0, "empty corpus")
    val dim = vecs.iterator.map(_.length).max
    val flat = new Array[Double](n * dim)
    val norms = new Array[Double](n)
    var i = 0
    while (i < n) {
      System.arraycopy(vecs(i), 0, flat, i * dim, vecs(i).length)
      var ss = 0.0
      var j = 0
      while (j < vecs(i).length) { ss += vecs(i)(j) * vecs(i)(j); j += 1 }
      norms(i) = math.sqrt(ss)
      i += 1
    }
    // insertion loop shared with the distributed per-cell build
    // (GraphAnnDist.nswForwardEdges) so the two tiers cannot drift
    val nbrs = Array.fill(n)(scala.collection.mutable.ArrayBuffer.empty[Int])
    GraphAnnDist.nswForwardEdges(flat, norms, dim, m).foreach {
      case (a, b) => nbrs(a) += b; nbrs(b) += a
    }
    val adjOff = new Array[Int](n + 1)
    i = 0
    while (i < n) { adjOff(i + 1) = adjOff(i) + nbrs(i).length; i += 1 }
    val adj = new Array[Int](adjOff(n))
    i = 0
    while (i < n) {
      val sorted = nbrs(i).toArray
      java.util.Arrays.sort(sorted)
      System.arraycopy(sorted, 0, adj, adjOff(i), sorted.length)
      i += 1
    }
    Graph(flat, norms, dim, adjOff, adj)
  }

  /** Graph-routed approximate top-k: corpus vectors route to their
    * beam-nearest node (one row-local pass), probes route to their
    * `nProbe` beam-nearest nodes, candidates join on the node id and
    * rank by exact cosine.
    *
    * @param ef       probe-side beam width (recall knob; >= nNodes
    *                 makes routing exact)
    * @param efCorpus corpus-side beam width (defaults to ef)
    */
  def graphTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int, nNodes: Int = 32, m: Int = 4,
                nProbe: Int = 4, ef: Int = 16, efCorpus: Int = -1,
                maxBroadcastBytes: Option[Long] = None,
                saltFactor: Int = 8): DataFrame = {
    val g = buildGraph(corpus, idCol, vecCol, nNodes, m)
    val efc = if (efCorpus > 0) efCorpus else ef
    def route(vec: org.apache.spark.sql.Column, beam: Int, take: Int) =
      NativeExpressions.graphNearestNodes(vec, g.nodes, g.norms, g.dim,
        g.adjOff, g.adj, beam, take)
    // coalesce to a provably non-null cell id — same constraint-
    // dedup rationale as ivfTopK's assignment
    val corpusCells = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
      .withColumn("cell_id", coalesce(
        element_at(route(col("__cv"), efc, 1), 1), lit(-1L)))
    val probeCells = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", VectorFunctions.norm(col("__pv")))
      .withColumn("__cell", explode(route(col("__pv"), math.max(ef, nProbe),
        math.min(nProbe, nNodes))))
      .select(col("probe_id"), col("__pv"), col("__pn"),
        coalesce(col("__cell"), lit(-1L)).as("cell_id"))
    SimilaritySearch.candidateJoinTopK(probeCells, corpusCells, k,
      maxBroadcastBytes, saltFactor)
  }
}
