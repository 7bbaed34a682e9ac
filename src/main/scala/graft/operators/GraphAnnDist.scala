package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Distributed small-world-graph index build — the corpus-scale
  * complement of [[GraphAnn.buildGraph]] (SURVEY §2.10 similarity
  * search), which is driver-bound (O(nNodes² · dim) on one machine,
  * guarded at 65,536 nodes). This build is the SPANN/partitioned-
  * DiskANN shape: a coarse quantizer routes every node to a cell, each
  * cell builds its own exact-NSW subgraph IN THE EXECUTORS, and the
  * subgraphs are stitched through cell entry nodes along a
  * centroid-level NSW — so index size is bounded by the corpus, not by
  * driver memory, and the only exchange is one corpus-sized groupBy.
  *
  * Construction (every step deterministic, so the whole index replays
  * in SQL — [[graft.OracleGen.graphAnnDistSql]], q_graph_ann_dist):
  *
  *  1. centroids = the `nCells` lowest-id corpus vectors (the same
  *     deterministic quantizer as [[SimilaritySearch.ivfTopK]]);
  *     assignment = row-local argmax cosine (ties to the lower cell
  *     ordinal, zero-norm vectors last) — no shuffle, no join.
  *  2. per-cell NSW: one `groupByKey(cell)` (THE one corpus-sized
  *     exchange), then inside each cell, insertion in ascending id
  *     order with node i linked bidirectionally to its min(m, i)
  *     exact-nearest predecessors by (cosine desc, ordinal asc) —
  *     [[nswForwardEdges]], the identical routine the driver build
  *     uses, so a one-cell distributed build IS the driver build.
  *     Cell cost is O(|cell|² · dim) executor-local; `maxCellSize`
  *     fails fast with a refit-with-more-cells message instead of
  *     letting a hot cell run quadratic (the knob a 100 TB corpus
  *     tunes: nCells ~ n / targetCellSize).
  *  3. stitching: per non-empty cell, the entry node (lowest id); the
  *     entry of cell c links bidirectionally to the entries of c's
  *     `mCells` exact-nearest lower-ordinal non-empty cells (the NSW
  *     insertion rule applied at the centroid level). Every cell
  *     reaches the first non-empty cell through the centroid NSW and
  *     every node reaches its cell entry through the per-cell NSW, so
  *     the stitched graph is CONNECTED by construction.
  *
  * The result is the index as a plain DataFrame — (src_id, dst_id),
  * both directions — ready to be written bucketed-by-source for a
  * serving system, handed to [[GraphMetrics]], or routed over. Serving
  * at corpus scale keeps the centroid level in memory and pages cell
  * subgraphs (the SPANN split); in-engine search over the same
  * partitioning is [[SimilaritySearch.ivfTopK]]'s candidate join, and
  * the beam-search demo over a driver-held graph is
  * [[GraphAnn.graphTopK]].
  */
object GraphAnnDist {

  /** Forward NSW edges over an in-memory node set (flat row-major
    * matrix + norms): node i (insertion order) links to its min(m, i)
    * exact-nearest predecessors by (cosine desc, ordinal asc);
    * zero-norm pairs order last (sentinel -2 cosine), ties to the
    * lower ordinal. Shared by the driver build ([[GraphAnn
    * .buildGraph]]) and the per-cell executor build so the two tiers
    * cannot drift.
    */
  private[operators] def nswForwardEdges(flat: Array[Double],
      norms: Array[Double], dim: Int,
      m: Int): scala.collection.mutable.ArrayBuffer[(Int, Int)] = {
    require(m >= 0, "m must be non-negative")
    val n = norms.length
    val out = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    def negCos(a: Int, b: Int): Double = {
      val d = norms(a) * norms(b)
      if (d == 0.0) 2.0
      else {
        var s = 0.0
        val oa = a * dim; val ob = b * dim
        var j = 0
        while (j < dim) { s += flat(oa + j) * flat(ob + j); j += 1 }
        -(s / d)
      }
    }
    var i = 1
    while (i < n) {
      // exact min(m, i)-nearest among already-inserted: selection over
      // i keys; strict < keeps the lowest ordinal on ties
      val keys = new Array[Double](i)
      var j = 0
      while (j < i) { keys(j) = negCos(i, j); j += 1 }
      val take = math.min(m, i)
      val used = new Array[Boolean](i)
      var t = 0
      while (t < take) {
        var best = -1
        var c = 0
        while (c < i) {
          if (!used(c) && (best < 0 ||
              java.lang.Double.compare(keys(c), keys(best)) < 0))
            best = c
          c += 1
        }
        used(best) = true
        out += ((i, best))
        t += 1
      }
      i += 1
    }
    out
  }

  /** Build the distributed stitched-NSW index. Returns the edge list
    * (src_id, dst_id), each link in both directions; within-cell edges
    * connect members of one cell, stitch edges connect cell entry
    * nodes.
    *
    * @param nCells      coarse-quantizer size (driver-held — bounded
    *                    by the same 65,536 guard as every
    *                    lowest-id-seeded quantizer in the library)
    * @param m           per-node NSW links inside a cell
    * @param mCells      per-cell stitch links at the centroid level
    * @param maxCellSize fail-fast bound on executor-local quadratic
    *                    work (refit with more cells past it)
    */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 nCells: Int, m: Int, mCells: Int = 2,
                 maxCellSize: Int = 1 << 20): DataFrame = {
    require(nCells > 0, "nCells must be positive")
    require(nCells <= 65536, s"nCells=$nCells past the driver-held guard")
    require(m > 0, "m must be positive")
    require(mCells >= 0, "mCells must be non-negative")
    require(maxCellSize > 0, "maxCellSize must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents =
      SimilaritySearch.centroidLiterals(corpus, idCol, vecCol, nCells)

    // row-local assignment; coalesce makes cell_id provably non-null so
    // the groupBy constraint folds (same rationale as ivfTopK)
    val assigned = corpus
      .select(col(idCol).cast("long").as("id"),
        VectorFunctions.toDouble(col(vecCol)).as("v"))
      .withColumn("cell_id", coalesce(
        element_at(
          SimilaritySearch.nearestCells(col("v"), cents.toSeq, take = 1), 1),
        lit(-1L)))

    val withinEdges = assigned.select("cell_id", "id", "v")
      .as[(Long, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val rows = it.toArray
        require(rows.length <= maxCellSize,
          s"cell $cell holds ${rows.length} nodes > maxCellSize=" +
            s"$maxCellSize — refit the quantizer with more cells " +
            "(nCells ~ corpus / target cell size)")
        val sorted = rows.sortBy(_._2)
        val n = sorted.length
        val ids = new Array[Long](n)
        var d = 0
        var i = 0
        while (i < n) {
          ids(i) = sorted(i)._2
          if (sorted(i)._3.length > d) d = sorted(i)._3.length
          i += 1
        }
        val flat = new Array[Double](n * math.max(d, 1))
        val norms = new Array[Double](n)
        i = 0
        while (i < n) {
          val v = sorted(i)._3
          var ss = 0.0
          var j = 0
          while (j < v.length) {
            val x = v(j)
            flat(i * d + j) = x
            ss += x * x
            j += 1
          }
          norms(i) = math.sqrt(ss)
          i += 1
        }
        nswForwardEdges(flat, norms, d, m).iterator.flatMap {
          case (a, b) => Iterator((ids(a), ids(b)), (ids(b), ids(a)))
        }
      }
      .toDF("src_id", "dst_id")

    // stitch: centroid-level NSW over the NON-EMPTY cells in ordinal
    // order, realized between cell entry nodes. nCells-bounded driver
    // work (the quantizer already lives there).
    val entries = assigned.groupBy("cell_id").agg(min(col("id")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val alive = entries.keys.toArray.sorted
    require(alive.headOption.forall(_ >= 0L),
      s"unassigned vectors landed in sentinel cell ${alive.head}")
    val cdim = cents.iterator.map(_._2.length).max
    val cflat = new Array[Double](alive.length * cdim)
    val cnorms = new Array[Double](alive.length)
    alive.zipWithIndex.foreach { case (cellId, i) =>
      val (_, cv, cn) = cents(cellId.toInt)
      System.arraycopy(cv, 0, cflat, i * cdim, cv.length)
      cnorms(i) = cn
    }
    val stitch = nswForwardEdges(cflat, cnorms, cdim, mCells)
      .iterator.flatMap { case (a, b) =>
        val ea = entries(alive(a)); val eb = entries(alive(b))
        Iterator((ea, eb), (eb, ea))
      }.toSeq

    withinEdges.unionByName(stitch.toDF("src_id", "dst_id"))
  }
}
