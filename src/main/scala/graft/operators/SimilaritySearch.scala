package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{TopKAggregator, VectorFunctions}

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.10: similarity search).
  *
  * Three paths, all ending in [[TopKAggregator.groupedTopK]] — a typed
  * aggregator whose map side truncates every partition's candidates to
  * k rows before the exchange, so no plan here shuffles the raw scored
  * pair stream:
  *
  *  - [[bruteTopK]]: exact cosine, probes x corpus. The PROBE side is
  *    broadcast (probes are the small side by construction), so the
  *    100 TB corpus is scanned once with no shuffle; the only exchange
  *    carries O(partitions x k) pre-truncated rows per probe.
  *  - [[ivfTopK]]: inverted-file index. Cell assignment is ROW-LOCAL
  *    (argmax over a literal centroid array — zero shuffle); the
  *    candidate join's key is the cell id.
  *  - [[srpTopK]]: sign-random-projection LSH bucketing; candidates are
  *    corpus vectors sharing a band bucket with the probe. Shuffle key =
  *    (band, bucket); comparisons are bucket-local. The scale path when
  *    |P| is large too.
  */
object SimilaritySearch {

  /** Exact top-k cosine neighbors for each probe row.
    *
    * @param probes  (idCol, vecCol) rows to search for (small side)
    * @param corpus  (idCol, vecCol) rows to search in
    */
  def bruteTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, k: Int): DataFrame = {
    // Norms are computed once per vector (pre-join projection); the
    // per-pair work is exactly one dot product.
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", VectorFunctions.norm(col("__pv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        VectorFunctions.cosineWithNorms(
          col("__pv"), col("__cv"), col("__pn"), col("__cn")).as("cosine"))
    TopKAggregator.groupedTopK(scored, "probe_id", "neighbor_id", "cosine", k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }

  /** Hard-negative mining for contrastive/embedding training (SURVEY
    * §2.10 widening): for each probe, the top-k most-similar corpus
    * vectors with a DIFFERENT label — the highest-loss negatives a
    * triplet/InfoNCE run wants in its batches.
    *
    * Same plan as [[bruteTopK]] (probes broadcast, corpus scanned once,
    * map-side top-k truncation before the only exchange); the label
    * inequality rides the broadcast-join condition, so mismatched
    * pairs are dropped before any score is computed. For probe sets
    * too large to broadcast, feed the candidate stage from
    * [[ivfTopK]]/[[srpTopK]] with a post-filter on the label instead.
    */
  def hardNegatives(data: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, probeFilter: Column, k: Int): DataFrame = {
    val p = data.filter(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"),
        col(labelCol).as("__pl"))
      .withColumn("__pn", VectorFunctions.norm(col("__pv")))
    val c = data
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
        col(labelCol).as("__cl"))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
    val scored = c.join(broadcast(p), col("__pl") =!= col("__cl"))
      .select(col("probe_id"), col("neighbor_id"),
        VectorFunctions.cosineWithNorms(
          col("__pv"), col("__cv"), col("__pn"), col("__cn")).as("cosine"))
    TopKAggregator.groupedTopK(scored, "probe_id", "neighbor_id", "cosine", k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }

  /** Collect the coarse-quantizer centroids (the `nCells` lowest-id
    * corpus vectors — deterministic, so results are reproducible) to the
    * driver. nCells is tiny by construction (<=64ish), so this is the
    * same driver-side footprint as a fitted KMeans model, and it lets
    * cell assignment run as a row-local expression over LITERAL
    * centroids — no join, no exchange, the index actually prunes.
    */
  private[operators] def centroidLiterals(corpus: DataFrame, idCol: String,
                               vecCol: String, nCells: Int): Array[(Long, Array[Double], Double)] =
    // cell ids are ORDINALS over the id-sorted seed set (not the ids
    // themselves): id-type-agnostic, and since ordinals are monotone in
    // the seed ids, every cell-id tiebreak below orders identically to
    // ordering by seed id — which is what the SQL oracle does
    corpus
      .orderBy(col(idCol)).limit(nCells)
      .select(VectorFunctions.toDouble(col(vecCol)).as("__cv"))
      .collect().zipWithIndex
      .map { case (r, idx) =>
        val v = r.getSeq[Double](0).toArray
        var ss = 0.0
        var i = 0
        while (i < v.length) { ss += v(i) * v(i); i += 1 }
        (idx.toLong, v, math.sqrt(ss))
      }

  /** Row-local `take`-nearest-cell ids, best first — one native loop
    * over the centroid matrix (NearestCells). Ordering contract is the
    * sorted-struct-array form this replaces, bit for bit: (cosine
    * desc, cell_id asc), zero-norm similarities last. The struct-array
    * form additionally stopped codegen-ing past ~100 cells (250 cosine
    * subtrees per row at the 10 M-vector stress tier ran interpreted
    * and sorted a struct array per row just to read back ids).
    *
    * Cell ids are ORDINALS over the id-sorted seed set, which is
    * exactly the matrix row order — asserted here, relied on below.
    */
  private[operators] def nearestCells(vec: Column,
                           cents: Seq[(Long, Array[Double], Double)],
                           take: Int): Column = {
    val dim = cents.head._2.length
    val flat = new Array[Double](cents.length * dim)
    val norms = new Array[Double](cents.length)
    cents.zipWithIndex.foreach { case ((cid, cv, cn), i) =>
      require(cid == i, s"cell ids must be ordinals, got $cid at $i")
      require(cv.length == dim, "centroid dim mismatch")
      System.arraycopy(cv, 0, flat, i * dim, dim)
      norms(i) = cn
    }
    graft.functions.NativeExpressions.nearestCells(vec, flat, norms, dim, take)
  }

  /** Lloyd-refine the coarse quantizer: assign every corpus vector to
    * its nearest current centroid (row-local argmax, one job), average
    * members per cell (the per-dimension aggregation collects only
    * nCells x dim rows to the driver — same footprint as a fitted
    * KMeans model), repeat. Cell ids stay the original seed ids; an
    * emptied cell keeps its previous centroid.
    *
    * NOTE: distributed averages sum in partition order, so refined
    * centroids are not bitwise-reproducible across different
    * partitionings — use refineIters = 0 (the deterministic lowest-id
    * quantizer) where exact reproducibility is required, e.g. the
    * oracle-checked catalog query.
    */
  private def refineCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                              seed: Seq[(Long, Array[Double], Double)],
                              iters: Int): Seq[(Long, Array[Double], Double)] = {
    var cur = seed
    for (_ <- 0 until iters) {
      val assigned = corpus
        .select(VectorFunctions.toDouble(col(vecCol)).as("__v"))
        .withColumn("cell_id",
          element_at(nearestCells(col("__v"), cur, take = 1), 1))
      val means = assigned
        .select(col("cell_id"), posexplode(col("__v")))
        .groupBy("cell_id", "pos").agg(avg("col").as("m"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      cur = cur.map { case (cid, oldV, oldN) =>
        means.get(cid) match {
          case Some(v) =>
            var ss = 0.0
            var i = 0
            while (i < v.length) { ss += v(i) * v(i); i += 1 }
            (cid, v, math.sqrt(ss))
          case None => (cid, oldV, oldN) // emptied cell: keep previous
        }
      }
    }
    cur
  }

  /** IVF (inverted-file) approximate top-k: a deterministic coarse
    * quantizer (the `nCells` lowest-id corpus vectors serve as
    * centroids, optionally Lloyd-refined with `refineIters` k-means
    * passes) partitions the corpus into cells; each probe searches
    * only its `nProbe` nearest cells.
    *
    * Both assignment passes are row-local argmax expressions over the
    * literal centroid array (no shuffle, no join), so the only
    * exchanges are the cell-keyed candidate join and the final
    * map-side-truncated top-k — at corpus scale the shuffle moves
    * (probe x nProbe) rows and each comparison is cell-local.
    * Recall/cost is tuned with nCells x nProbe exactly as in classic
    * IVF indexes.
    */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16,
              nProbe: Int = 4, refineIters: Int = 0,
              maxBroadcastBytes: Option[Long] = None,
              saltFactor: Int = 8): DataFrame = {
    val cents = refineCentroids(corpus, idCol, vecCol,
      centroidLiterals(corpus, idCol, vecCol, nCells).toSeq, refineIters)

    // cell_id is never null (the centroid array is non-empty), but
    // Catalyst can't prove that: the equi-join below would generate an
    // IsNotNull(cell_id) constraint that DUPLICATES the whole
    // nCells-dot assignment expression into a filter. coalesce with a
    // non-nullable sentinel makes the column provably non-null, so the
    // constraint folds away and the assignment is evaluated once.
    // norms ride the pre-join projections: computed once per VECTOR,
    // so the per-pair work below is exactly one dot product (the
    // invariant bruteTopK documents; recomputing them inside the pair
    // projection costs 3 dots per candidate)
    val corpusCells = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
      .withColumn("cell_id", coalesce(
        element_at(nearestCells(col("__cv"), cents, take = 1), 1),
        lit(-1L)))
    val probeCells = probes
      .select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", VectorFunctions.norm(col("__pv")))
      .withColumn("__cell",
        explode(nearestCells(col("__pv"), cents, take = nProbe)))
      .select(col("probe_id"), col("__pv"), col("__pn"),
        coalesce(col("__cell"), lit(-1L)).as("cell_id"))

    candidateJoinTopK(probeCells, corpusCells, k, maxBroadcastBytes,
      saltFactor)
  }

  /** Shared cell-keyed candidate join + exact-cosine top-k tail of the
    * partitioned ANN family ([[ivfTopK]], [[GraphAnn.graphTopK]]).
    *
    * Each corpus vector lives in exactly one cell and each probe
    * probes nProbe distinct cells, so (probe, neighbor) pairs are
    * already unique — no dedup pass needed.
    *
    * Join strategy is a TWO-TIER choice made at plan time from the
    * probe side's size estimate (no extra job):
    *
    *  - bounded probe batches (the normal ANN serving shape) are
    *    broadcast EXPLICITLY: leaving the choice to size estimates
    *    let the join degrade to sort-merge on cell_id — a
    *    64-distinct-value key, so every task sorts huge key runs
    *    (observed 8x wall-time flips at the 1M-vector stress tier
    *    before the hint).
    *  - probe sides past the broadcast threshold take a SALTED
    *    shuffled-hash join instead of OOMing the driver: the corpus
    *    side salts on hash(neighbor_id) % saltFactor and the probe
    *    side replicates per salt, widening the join key to
    *    (cell_id, salt) — nCells x saltFactor distinct keys, so the
    *    exchange actually parallelizes despite the low-cardinality
    *    cell key, and each pair still matches exactly once. Degrades
    *    predictably: cost grows with |P| x saltFactor replication,
    *    never with driver memory.
    */
  private[operators] def candidateJoinTopK(
      probeCells: DataFrame, corpusCells: DataFrame, k: Int,
      maxBroadcastBytes: Option[Long], saltFactor: Int): DataFrame = {
    val threshold = maxBroadcastBytes.getOrElse {
      val raw = try probeCells.sparkSession.conf
        .get("spark.sql.autoBroadcastJoinThreshold")
      catch { case scala.util.control.NonFatal(_) => "10MB" }
      // plain numbers first: byteStringAsBytes rejects "-1", and a user
      // who DISABLED broadcast (threshold -1) must get the salted
      // fallback, not a silently-restored 10MB default
      raw.trim.toLongOption.getOrElse(
        try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        catch { case scala.util.control.NonFatal(_) => 10L << 20 })
    }
    val probeEstimate =
      probeCells.queryExecution.optimizedPlan.stats.sizeInBytes
    val scored = (if (threshold >= 0 && probeEstimate <= threshold) {
      broadcast(probeCells).join(corpusCells, Seq("cell_id"))
    } else {
      val saltedCorpus = corpusCells.withColumn("__salt",
        pmod(xxhash64(col("neighbor_id")), lit(saltFactor)).cast("int"))
      val saltedProbes = probeCells.withColumn("__salt",
        explode(array((0 until saltFactor).map(lit): _*)))
      saltedProbes.hint("shuffle_hash")
        .join(saltedCorpus, Seq("cell_id", "__salt"))
    })
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        VectorFunctions.cosineWithNorms(col("__pv"), col("__cv"),
          col("__pn"), col("__cn")).as("cosine"))
    TopKAggregator.groupedTopK(scored, "probe_id", "neighbor_id", "cosine", k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs, exact all-pairs form: every
    * (a < b) pair above the similarity threshold. O(n^2) BY DESIGN —
    * this is the in-bucket verifier for [[cosineDupePairsLsh]] and is
    * only safe on a bounded probe set (it plans as a nested-loop over
    * all pairs). The corpus-scale entry point is
    * [[cosineDupePairsLsh]], which buckets first.
    */
  def cosineDupePairs(vecs: DataFrame, idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
      .withColumn("__na", VectorFunctions.norm(col("__va")))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
      .withColumn("__nb", VectorFunctions.norm(col("__vb")))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.cosineWithNorms(
        col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cosine") > threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Explode a vector frame into one row per (band, SRP bucket). The
    * hyperplanes are deterministic (seeded by band index), so bucket
    * ids are reproducible cluster-wide AND recomputable by an external
    * oracle. All bands are computed by ONE native expression
    * (NativeExpressions.SrpBucketArray) whose plane matrix travels as a
    * codegen reference, not as plan literals.
    */
  private def srpBanded(vecs: DataFrame, idOut: String, vecOut: String,
                        idCol: String, vecCol: String, bands: Int,
                        bitsPerBand: Int, maxDim: Int): DataFrame =
    vecs.select(col(idCol).as(idOut), col(vecCol).as(vecOut))
      .select(col(idOut), col(vecOut),
        posexplode(graft.functions.NativeExpressions.srpBucketArray(
          col(vecOut), bands, bitsPerBand, maxDim)))
      .toDF(idOut, vecOut, "band", "bucket")

  /** LSH-bucketed near-duplicate pairs: candidates share at least one
    * of `bands` SRP band buckets; exact cosine verifies within the
    * bucket. The shuffle key is (band, bucket) and the quadratic
    * compare is bucket-local, so — unlike [[cosineDupePairs]] — this
    * never plans an all-pairs nested loop. Recall is the standard SRP
    * band/bit trade-off: P(candidate) = 1 - (1 - p^bits)^bands with
    * p = 1 - angle/pi; size bitsPerBand ~ log2(corpus) at scale.
    */
  def cosineDupePairsLsh(vecs: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bands: Int = 16,
                         bitsPerBand: Int = 8, maxDim: Int = 512): DataFrame = {
    val banded = srpBanded(vecs, "__id", "__v", idCol, vecCol,
      bands, bitsPerBand, maxDim)
    // candidate ids only through the dedup — vectors rejoin by id after.
    // shuffle_hash like DedupOps' banded self-join: the join feeds an
    // unordered distinct, so sort-merge's sort of BOTH (corpus x bands)
    // sides is pure loss (the measured 31 GB spill shape at the
    // 50 M-doc tier)
    val cand = banded.select(col("__id").as("id_a"), col("band"), col("bucket"))
      .join(banded.select(col("__id").as("id_b"), col("band"), col("bucket"))
          .hint("shuffle_hash"),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val va = vecs.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
      .withColumn("__na", VectorFunctions.norm(col("__va")))
    val vb = vecs.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
      .withColumn("__nb", VectorFunctions.norm(col("__vb")))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cosine", VectorFunctions.cosineWithNorms(
        col("__va"), col("__vb"), col("__na"), col("__nb")))
      .filter(col("cosine") > threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** Int8-quantized candidate generation with exact re-ranking: score
    * every (probe, corpus) pair on the DEQUANTIZED int8 codes
    * ([[VectorFunctions.quantizeInt8]] — 4x smaller vectors), keep the
    * `k * refine` best candidates per probe, then rejoin the
    * full-precision vectors BY ID for the survivors and rank the final
    * k on exact cosine.
    *
    * This is the memory-bandwidth variant of [[bruteTopK]]: at corpus
    * scale the candidate scan streams int8 codes (a quarter of the
    * float bytes off disk and through the broadcast), and the
    * full-precision vectors are touched only for the k*refine survivors
    * per probe — the standard quantize-then-rescore ANN serving shape.
    * Both ranking stages go through the map-side-truncated
    * [[TopKAggregator.groupedTopK]]; the exact stage's candidate rejoin
    * keys on ids, so no exchange carries float vectors.
    *
    * Determinism: quantization is floor-based and exactly reproducible
    * ([[VectorFunctions.quantizeInt8]]'s contract), both ranks tiebreak
    * (score desc, id asc), so the result is bit-stable and
    * oracle-recomputable end to end.
    */
  def quantizedTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                    vecCol: String, k: Int, refine: Int = 4): DataFrame = {
    def quantized(df: DataFrame, idOut: String, vecOut: String): DataFrame = {
      val scale = VectorFunctions.int8Scale(col(vecCol))
      df.select(col(idCol).as(idOut), scale.as("__scale"), col(vecCol).as("__v"))
        .select(col(idOut),
          VectorFunctions.dequantizeInt8(
            VectorFunctions.quantizeInt8(col("__v"), col("__scale")),
            col("__scale")).as(vecOut))
        .withColumn(vecOut + "n", VectorFunctions.norm(col(vecOut)))
    }
    val p = quantized(probes, "probe_id", "__pq")
    val c = quantized(corpus, "neighbor_id", "__cq")
    val approx = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        VectorFunctions.cosineWithNorms(
          col("__pq"), col("__cq"), col("__pqn"), col("__cqn")).as("approx"))
    val candIds = TopKAggregator.groupedTopK(
      approx, "probe_id", "neighbor_id", "approx", k * refine)
      .select("probe_id", "neighbor_id")
    val pv = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", VectorFunctions.norm(col("__pv")))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
    val exact = candIds
      .join(broadcast(pv), Seq("probe_id"))
      .join(cv, Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        VectorFunctions.cosineWithNorms(col("__pv"), col("__cv"),
          col("__pn"), col("__cn")).as("cosine"))
    TopKAggregator.groupedTopK(exact, "probe_id", "neighbor_id", "cosine", k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }

  /** LSH-bucketed approximate top-k: candidates share at least one of
    * `bands` SRP bucket ids; exact cosine + map-side-truncated rank
    * within candidates. Candidate dedup is keyed on (probe_id,
    * neighbor_id) ONLY — vectors are rejoined by id afterwards, so no
    * exchange in the plan carries embeddings as keys.
    */
  def srpTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, bands: Int = 4,
              bitsPerBand: Int = 8, maxDim: Int = 512): DataFrame = {
    val p = srpBanded(probes, "probe_id", "__pv", idCol, vecCol,
      bands, bitsPerBand, maxDim)
    val c = srpBanded(corpus, "neighbor_id", "__cv", idCol, vecCol,
      bands, bitsPerBand, maxDim)
    // the candidate join feeds an unordered distinct — hint the probe
    // side as the shuffled-hash build so neither banded side gets
    // sort-merge-sorted for an order nothing consumes (same measured
    // rationale as the dedup banding; the probe side is the smaller
    // build by construction even when |P| is large)
    val candIds = p.drop("__pv").hint("shuffle_hash")
      .join(c.drop("__cv"), Seq("band", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "neighbor_id").distinct()
    val pv = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
      .withColumn("__pn", VectorFunctions.norm(col("__pv")))
    val cv = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
    // no broadcast hint: this operator is documented as the scale path
    // for LARGE probe sets too, so forcing probe vectors through the
    // driver would cap |P| at the broadcast limit — both rejoins key on
    // ids and Catalyst/AQE still picks broadcast when a side is small
    val scored = candIds
      .join(pv, Seq("probe_id"))
      .join(cv, Seq("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        VectorFunctions.cosineWithNorms(col("__pv"), col("__cv"),
          col("__pn"), col("__cn")).as("cosine"))
    TopKAggregator.groupedTopK(scored, "probe_id", "neighbor_id", "cosine", k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }
}
