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

  /** Incrementally extend a built index: the daily-ingest path that
    * avoids rebuilding. Each append vector is assigned to its cell by
    * the SAME quantizer (the `nCells` lowest-id BASE vectors) and
    * linked bidirectionally to its `m` exact-nearest BASE members of
    * that cell (cosine desc, base id asc; zero-norm pairs last) —
    * never to other appends, so the result is ORDER-FREE by
    * construction: ingest batches produce the identical index
    * regardless of arrival order, partitioning, or how the appends
    * are split across calls, and the whole operation replays in SQL
    * (q_graph_ann_append). An append landing in a cell with no base
    * members links to the global entry node (the lowest base id)
    * instead — deterministic, SQL-expressible (the oracle carries the
    * same rule), and it keeps the stitched graph connected. With a
    * quantizer fitted on THIS base frame the branch is actually
    * unreachable (a cell is base-empty only when its centroid is an
    * exact duplicate of a lower one, and the same cosine tie that
    * pushed the centroid down-cell pushes every append down-cell
    * too); it guards drift — a base frame that shrank since fitting,
    * or centroids carried over from an earlier corpus.
    *
    * Cost shape matches [[buildIndex]]: one row-local assignment per
    * side, ONE union+groupBy exchange, executor-local O(|A_c|·|B_c|·
    * dim) per cell (both sides bounded together by `maxCellSize`).
    * Returns only the NEW edges (both directions) — union with the
    * existing edge table to serve.
    */
  def appendToIndex(base: DataFrame, appends: DataFrame, idCol: String,
                    vecCol: String, nCells: Int, m: Int,
                    maxCellSize: Int = 1 << 20): DataFrame = {
    require(nCells > 0, "nCells must be positive")
    require(nCells <= 65536, s"nCells=$nCells past the driver-held guard")
    require(m > 0, "m must be positive")
    val spark = base.sparkSession
    import spark.implicits._
    val cents = SimilaritySearch.centroidLiterals(base, idCol, vecCol, nCells)
    val globalEntry = base.agg(min(col(idCol).cast("long"))).head().getLong(0)
    def assigned(df: DataFrame, isBase: Int) = df
      .select(col(idCol).cast("long").as("id"),
        VectorFunctions.toDouble(col(vecCol)).as("v"))
      .withColumn("cell_id", coalesce(
        element_at(
          SimilaritySearch.nearestCells(col("v"), cents.toSeq, take = 1), 1),
        lit(-1L)))
      .withColumn("is_base", lit(isBase))
    assigned(base, 1).unionByName(assigned(appends, 0))
      .select("cell_id", "is_base", "id", "v")
      .as[(Long, Int, Long, Seq[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        val rows = it.toArray
        require(rows.length <= maxCellSize,
          s"cell $cell holds ${rows.length} nodes > maxCellSize=" +
            s"$maxCellSize — refit the quantizer with more cells")
        val (baseRows, appRows) = rows.partition(_._2 == 1)
        if (appRows.isEmpty) Iterator.empty
        else if (baseRows.isEmpty)
          // quantizer drift: no base member in this cell — anchor the
          // orphans at the global entry so the graph stays connected
          appRows.iterator.flatMap(a =>
            Iterator((a._3, globalEntry), (globalEntry, a._3)))
        else {
          val bs = baseRows.sortBy(_._3)
          val nb = bs.length
          var d = 0
          rows.foreach(r => if (r._4.length > d) d = r._4.length)
          val dd = math.max(d, 1)
          def flatOf(rs: Array[(Long, Int, Long, Seq[Double])]) = {
            val f = new Array[Double](rs.length * dd)
            val nrm = new Array[Double](rs.length)
            var i = 0
            while (i < rs.length) {
              val v = rs(i)._4
              var ss = 0.0
              var j = 0
              while (j < v.length) {
                f(i * dd + j) = v(j); ss += v(j) * v(j); j += 1
              }
              nrm(i) = math.sqrt(ss)
              i += 1
            }
            (f, nrm)
          }
          val (bf, bn) = flatOf(bs)
          val (af, an) = flatOf(appRows)
          appRows.iterator.zipWithIndex.flatMap { case (a, ai) =>
            // exact min(m, nb)-nearest base members: selection with
            // the same (cosine desc, ordinal asc, zero-norm last)
            // rule as nswForwardEdges
            val keys = new Array[Double](nb)
            var j = 0
            while (j < nb) {
              val den = an(ai) * bn(j)
              keys(j) = if (den == 0.0) 2.0 else {
                var s = 0.0
                var k = 0
                while (k < dd) { s += af(ai * dd + k) * bf(j * dd + k); k += 1 }
                -(s / den)
              }
              j += 1
            }
            val take = math.min(m, nb)
            val used = new Array[Boolean](nb)
            (0 until take).iterator.flatMap { _ =>
              var best = -1
              var c = 0
              while (c < nb) {
                if (!used(c) && (best < 0 ||
                    java.lang.Double.compare(keys(c), keys(best)) < 0))
                  best = c
                c += 1
              }
              used(best) = true
              Iterator((a._3, bs(best)._3), (bs(best)._3, a._3))
            }
          }
        }
      }
      .toDF("src_id", "dst_id")
  }
}
