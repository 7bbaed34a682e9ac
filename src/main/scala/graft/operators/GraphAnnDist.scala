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

  /** Opaque fitted coarse quantizer (the `nCells` lowest-id corpus
    * vectors as driver-held literals). Build and search fit the SAME
    * quantizer from the same corpus; fitting it once via
    * [[fitQuantizer]] and passing it to both skips the second
    * orderBy-limit-collect job a build+search pair otherwise pays
    * (r13, guide §2.6 — fewer driver actions).
    */
  final class Quantizer private[GraphAnnDist] (
      private[operators] val cents: Array[(Long, Array[Double], Double)])

  /** Fit the deterministic coarse quantizer once for a build+search
    * pair over the same corpus.
    */
  def fitQuantizer(corpus: DataFrame, idCol: String, vecCol: String,
                   nCells: Int): Quantizer = {
    require(nCells > 0 && nCells <= 65536, s"nCells=$nCells out of range")
    new Quantizer(
      SimilaritySearch.centroidLiterals(corpus, idCol, vecCol, nCells))
  }

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
                 maxCellSize: Int = 1 << 20,
                 quantizer: Option[Quantizer] = None): DataFrame = {
    require(nCells > 0, "nCells must be positive")
    require(nCells <= 65536, s"nCells=$nCells past the driver-held guard")
    require(m > 0, "m must be positive")
    require(mCells >= 0, "mCells must be non-negative")
    require(maxCellSize > 0, "maxCellSize must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = quantizer.map(_.cents).getOrElse(
      SimilaritySearch.centroidLiterals(corpus, idCol, vecCol, nCells))
    require(cents.length <= nCells, "quantizer larger than nCells")

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

  /** Distributed beam search over a built index: probes route to their
    * `nProbe` nearest cells through the SAME quantizer the build used
    * (the SPANN serving split — centroid level in memory, one cell's
    * subgraph walked per probe), each probed cell's members +
    * within-cell adjacency group executor-local, and a per-probe
    * best-first beam of width `ef` walks the cell graph from its entry
    * node (lowest id). Per-probe work is O(beam · m · dim),
    * executor-local; the exchanges are the corpus groupBy and the
    * probe-by-cell shuffle — no all-pairs scan.
    *
    * Output contract is EXACTLY [[SimilaritySearch.ivfTopK]]'s
    * (probe_id, neighbor_id, rank, cosine; self-matches excluded;
    * rank by cosine desc, id asc — the same [[TopKAggregator]] final
    * stage), and with `ef` >= the largest probed cell the beam visits
    * every member (the within-cell graph is connected by
    * construction), so the result is BIT-IDENTICAL to the IVF
    * candidate scan over the same cells — which is what lets the
    * catalog row hash-match the deterministic IVF oracle while the
    * beam-limited shape serves production. Zero-norm members carry a
    * null cosine (ranked last), matching the join form.
    */
  def searchIndex(corpus: DataFrame, edges: DataFrame, probes: DataFrame,
                  idCol: String, vecCol: String, nCells: Int, k: Int,
                  ef: Int, nProbe: Int = 1,
                  maxCellSize: Int = 1 << 20,
                  quantizer: Option[Quantizer] = None): DataFrame = {
    require(nCells > 0 && nCells <= 65536, s"nCells=$nCells out of range")
    require(k > 0 && ef > 0 && nProbe > 0, "k, ef, nProbe must be positive")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = quantizer.map(_.cents).getOrElse(
      SimilaritySearch.centroidLiterals(corpus, idCol, vecCol, nCells))
    val assigned = corpus
      .select(col(idCol).cast("long").as("id"),
        VectorFunctions.toDouble(col(vecCol)).as("v"))
      .withColumn("cell_id", coalesce(
        element_at(
          SimilaritySearch.nearestCells(col("v"), cents.toSeq, take = 1), 1),
        lit(-1L)))
    val probed = probes
      .select(col(idCol).cast("long").as("probe_id"),
        VectorFunctions.toDouble(col(vecCol)).as("pv"))
      .withColumn("cell_id", explode(
        SimilaritySearch.nearestCells(col("pv"), cents.toSeq,
          take = math.min(nProbe, nCells))))
    // page ONLY the probed cells (the SPANN serving discipline): a
    // probe set touches |probes| * nProbe cells at most, so the
    // members/adjacency shipped into the grouped walk — and the edge
    // tagging joins below — are bounded by the query, not the corpus
    // (at 2M nodes / 256 probes this is the difference between a
    // zero-spill phase and 1.7 GB of groupBy spill)
    val probedCells = broadcast(probed.select("cell_id").distinct())
    val pagedMembers = assigned.join(probedCells, Seq("cell_id"),
      "left_semi")
    // within-cell adjacency: stitch edges cross cells and are the
    // build-time connectivity device — at query time the quantizer IS
    // the inter-cell step, so they are filtered out here
    val srcCell = pagedMembers.select(col("id").as("src_id"),
      col("cell_id"))
    val dstCell = pagedMembers.select(col("id").as("dst_id"),
      col("cell_id").as("__dc"))
    val cellEdges = edges.join(srcCell, "src_id").join(dstCell, "dst_id")
      .filter(col("cell_id") === col("__dc"))
      .select(col("cell_id"), col("src_id"), col("dst_id"))
    // one grouped pass per cell: members (kind 0), adjacency (kind 1),
    // probes (kind 2) — vectors ride only on kinds 0 and 2
    val nullVec = lit(null).cast("array<double>")
    val tagged = pagedMembers
      .select(col("cell_id"), lit(0).as("kind"), col("id").as("a"),
        lit(-1L).as("b"), col("v"))
      .unionByName(cellEdges.select(col("cell_id"), lit(1).as("kind"),
        col("src_id").as("a"), col("dst_id").as("b"), nullVec.as("v")))
      .unionByName(probed.select(col("cell_id"), lit(2).as("kind"),
        col("probe_id").as("a"), lit(-1L).as("b"), col("pv").as("v")))
      .as[(Long, Int, Long, Long, Seq[Double])]
    val candidates = tagged.groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        val members = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Seq[Double])]
        val adj = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
        val prbs = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Seq[Double])]
        it.foreach {
          case (_, 0, id, _, v) => members += ((id, v))
          case (_, 1, s, d, _) =>
            adj.getOrElseUpdate(s,
              scala.collection.mutable.ArrayBuffer.empty[Long]) += d
          case (_, _, p, _, v) => prbs += ((p, v))
        }
        if (prbs.isEmpty || members.isEmpty) Iterator.empty
        else {
          require(members.length <= maxCellSize,
            s"cell holds ${members.length} nodes > maxCellSize=" +
              s"$maxCellSize — refit the quantizer with more cells")
          val n = members.length
          val sorted = members.sortBy(_._1).toArray
          val ids = sorted.map(_._1)
          val idToOrd = ids.zipWithIndex.toMap
          val dim = sorted.iterator.map(_._2.length).max
          val flat = new Array[Double](n * math.max(dim, 1))
          val norms = new Array[Double](n)
          var i = 0
          while (i < n) {
            val v = sorted(i)._2
            var ss = 0.0
            var j = 0
            while (j < v.length) {
              val x = v(j); flat(i * dim + j) = x; ss += x * x; j += 1
            }
            norms(i) = math.sqrt(ss)
            i += 1
          }
          val adjOrd: Array[Array[Int]] = ids.map(id =>
            adj.get(id).map(_.iterator.flatMap(idToOrd.get)
              .toArray.sorted).getOrElse(Array.empty[Int]))
          prbs.iterator.flatMap { case (pid, pvSeq) =>
            val pv = pvSeq.toArray
            var pss = 0.0
            var j = 0
            while (j < pv.length) { pss += pv(j) * pv(j); j += 1 }
            val pn = math.sqrt(pss)
            // cosine exactly as the join form: dot asc-index fold,
            // null (NaN here, filtered to null later) on a zero norm
            def cosOf(o: Int): Double = {
              val d = pn * norms(o)
              if (d == 0.0) Double.NaN
              else {
                var s = 0.0
                val off = o * dim
                var jj = 0
                while (jj < pv.length && jj < dim) {
                  s += pv(jj) * flat(off + jj); jj += 1
                }
                s / d
              }
            }
            // best-first beam from the entry node (ordinal 0 = lowest
            // id): expand while a frontier candidate could still beat
            // the ef-th best; NaN scores never expand but are kept as
            // (null-cosine) results so the contract matches the join
            val visited = new Array[Boolean](n)
            val scores = new Array[Double](n)
            val ord = Ordering.by[(Double, Int), Double](_._1)
            val frontier =
              scala.collection.mutable.PriorityQueue.empty[(Double, Int)](ord)
            val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
            def visit(o: Int): Unit = {
              visited(o) = true
              scores(o) = cosOf(o)
              kept += o
              frontier.enqueue(
                (if (scores(o).isNaN) -2.0 else scores(o), o))
            }
            visit(0)
            var expanded = 0
            while (frontier.nonEmpty && expanded < ef) {
              val (_, o) = frontier.dequeue()
              expanded += 1
              val nbs = adjOrd(o)
              var x = 0
              while (x < nbs.length) {
                if (!visited(nbs(x))) visit(nbs(x))
                x += 1
              }
            }
            kept.iterator.filter(o => ids(o) != pid).map { o =>
              (pid, ids(o),
                if (scores(o).isNaN) null
                else java.lang.Double.valueOf(scores(o)))
            }
          }
        }
      }
      .toDF("probe_id", "neighbor_id", "cosine")
      .withColumn("cosine", col("cosine").cast("double"))
    graft.functions.TopKAggregator
      .groupedTopK(candidates, "probe_id", "neighbor_id", "cosine", k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }
}
