package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TopKAggregator, VectorFunctions}

/** Product-quantization ANN (SURVEY §2.10 similarity search) — the
  * memory-bound tier of the FAISS-style index family this engine
  * already carries (IVF cells: [[SimilaritySearch.ivfTopK]], int8:
  * [[SimilaritySearch.quantizedTopK]], graph routing: [[GraphAnn]]).
  * Jégou et al. 2011 ("Product quantization for nearest neighbor
  * search"), inner-product flavor: split each `dim` vector into `m`
  * contiguous subvectors, train an independent `kSub`-centroid
  * codebook per subspace, store each corpus vector as `m` small codes,
  * and score probe↔candidate as the ADC table-lookup sum
  * `Σ_s dot(probe_s, codebook_s[code_s])` — the inner product
  * DECOMPOSES across subspaces (cosine does not), which is what makes
  * the lookup-sum an unbiased estimate of the full dot product.
  *
  * Determinism pins (the [[KMeans]] stance, so the DuckDB oracle can
  * replay the whole chain bit-for-bit):
  *  - codebooks: rounded-Lloyd per subspace ([[KMeans.fitRounded]] —
  *    lowest-id init, cosine argmax ties to the lower ordinal,
  *    per-dimension means rounded to 6 decimals each iteration);
  *  - encoding: the same row-local native argmax
  *    ([[graft.functions.NativeExpressions.NearestCells]]); zero-norm
  *    subvectors take cell 0 on both engines (all-ties → lowest
  *    ordinal here, `NULLS LAST, cell_id` in the oracle);
  *  - ADC tables: built on the driver from the ROUNDED centroids in
  *    index order, so the dot sums match the oracle's unrolled SQL
  *    exactly; ranking on the score rounded to 6 decimals, ties to
  *    the lower neighbor id.
  *
  * Shape at scale: training touches only subvector aggregates
  * (k×dim driver footprint per subspace); encoding is ONE map-only
  * projection computing all `m` codes per row (no shuffle, codes are
  * `m` longs — the 64-dim float vector compresses 64→`m` bytes-ish,
  * which is the point: at 100 TB the encoded corpus fits where raw
  * vectors cannot); scoring joins the tiny probe×table set in as a
  * broadcast and runs O(m) array lookups per candidate instead of
  * O(dim) multiplies; top-k is map-side ([[TopKAggregator]]), so the
  * exchange carries O(partitions × k) rows. Nothing quadratic beyond
  * the probe×corpus stream itself, which is the ADC contract.
  */
object ProductQuantization {

  /** Max probes collected to the driver for ADC table construction —
    * the same bounded-collect guard class as GraphAnn's node cap.
    */
  val maxProbes = 1024

  /** The trained model: per-subspace codebooks (ordinal, centroid,
    * norm) plus the geometry that produced them.
    */
  final case class PqModel(m: Int, dim: Int,
                           books: Seq[Seq[(Long, Array[Double], Double)]]) {
    def subDim: Int = dim / m
  }

  /** Train `m` per-subspace `kSub`-centroid codebooks with `iters`
    * rounded-Lloyd rounds (the replayable [[KMeans.fitRounded]] chain
    * per subvector slice).
    */
  def fit(corpus: DataFrame, idCol: String, vecCol: String, m: Int,
          kSub: Int, iters: Int): PqModel = {
    require(m >= 1, s"m must be >= 1, got $m")
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"m = $m must divide dim = $dim")
    val subDim = dim / m
    val v = VectorFunctions.toDouble(col(vecCol))
    // ONE corpus scan seeds every subspace: collect the kSub lowest-id
    // FULL vectors once and slice driver-side — ordinals and values are
    // bit-identical to a per-subspace lowest-id init (slicing commutes
    // with the id sort), but the per-subspace TakeOrdered full scans
    // are gone (they were 8× the corpus reads of the whole fit, and
    // the dominant skew when run against a cold cache: the r10 10 M
    // stress artifact's spread-84 stage was exactly this init). The
    // scan also MATERIALIZES a cached corpus before the concurrent
    // stages below, so none of them races the cache build.
    val seeds: Array[Array[Double]] = corpus
      .orderBy(col(idCol)).limit(kSub)
      .select(v.as("__fv")).collect()
      .map(_.getSeq[Double](0).toArray)
    def initFor(s: Int): Seq[(Long, Array[Double], Double)] =
      seeds.zipWithIndex.map { case (full, idx) =>
        val sub = java.util.Arrays.copyOfRange(full, s * subDim,
          (s + 1) * subDim)
        var ss = 0.0
        var i = 0
        while (i < sub.length) { ss += sub(i) * sub(i); i += 1 }
        (idx.toLong, sub, math.sqrt(ss))
      }.toSeq
    // The subspace fits run SEQUENTIALLY on purpose: each fit's
    // assignment/means stages already span every task slot (full-width
    // aggregations over the corpus), so concurrent submission cannot
    // shorten the wall — it just oversubscribes the slots and inflates
    // per-task wall times (measured at the 10 M tier: spread 6.1 from
    // tasks queued behind peer stages, vs ≤2 sequential, for ~3% wall
    // difference). The shared one-scan init above is where the real
    // redundancy lived.
    val books = (0 until m).map { s =>
      KMeans.fitRounded(
        corpus.select(col(idCol),
          slice(v, s * subDim + 1, subDim).as("__sv")),
        idCol, "__sv", kSub, iters, init = Some(initFor(s)))
    }
    PqModel(m, dim, books)
  }

  /** Encode every vector as its `m` codebook ordinals in ONE map-only
    * projection: (idOut, code_0, ..., code_{m-1}). This IS the
    * compression: dim floats become m small codes, with the native
    * row-local argmax and zero shuffle at any corpus size.
    */
  def encode(vectors: DataFrame, idCol: String, vecCol: String,
             model: PqModel, idOut: String = "vec_id"): DataFrame = {
    val v = VectorFunctions.toDouble(col(vecCol))
    val codeCols = (0 until model.m).map { s =>
      coalesce(
        element_at(SimilaritySearch.nearestCells(
          slice(v, s * model.subDim + 1, model.subDim),
          model.books(s), 1), 1),
        lit(0L)).as(s"code_$s")
    }
    vectors.select(col(idCol).as(idOut) +: codeCols: _*)
  }

  /** Top-`k` approximate neighbors per probe:
    * (probe_id, neighbor_id, rank, score). `m` must divide the vector
    * dimension; `kSub` centroids per subspace, `iters` rounded-Lloyd
    * rounds. Probes score against every OTHER corpus vector (self
    * excluded) by ADC lookup-sum; rank orders by (rounded score desc,
    * neighbor_id).
    */
  def pqTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, m: Int, kSub: Int, iters: Int,
             k: Int): DataFrame =
    pqTopK(probes, corpus, idCol, vecCol,
      fit(corpus, idCol, vecCol, m, kSub, iters), k)

  /** [[pqTopK]] against an already-fitted model (train once, search
    * many — the serving shape).
    */
  def pqTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, model: PqModel, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._

    val m = model.m
    val subDim = model.subDim
    val books = model.books
    val v = VectorFunctions.toDouble(col(vecCol))

    val encoded = encode(corpus, idCol, vecCol, model, idOut = "neighbor_id")
      .withColumnsRenamed((0 until m).map(s => s"code_$s" -> s"__c$s").toMap)

    // driver-side ADC tables: per probe, per subspace, dot(probe_s,
    // centroid) over the rounded codebook in index order
    val probeRows = probes
      .select(col(idCol).cast("long").as("id"), v.as("v"))
      .limit(maxProbes + 1)
      .as[(Long, Array[Double])].collect()
    require(probeRows.length <= maxProbes,
      s"pqTopK collects probes to the driver; got more than $maxProbes — " +
        "filter the probe set or shard it")
    val probeTables = probeRows.toSeq.sortBy(_._1).map { case (pid, pv) =>
      val tables: Seq[Seq[Double]] = (0 until m).map { s =>
        books(s).map { case (_, cv, _) =>
          var acc = 0.0
          var j = 0
          while (j < subDim) { acc += pv(s * subDim + j) * cv(j); j += 1 }
          acc
        }
      }
      (pid, tables)
    }
    val probeDf = probeTables.toDF("probe_id", "__adc")

    // broadcast probe×table rows against the encoded corpus: the score
    // is m literal-array lookups summed left-to-right (matching the
    // oracle's `t1 + t2 + ...` association order)
    val score = (0 until m)
      .map(s => element_at(element_at(col("__adc"), s + 1),
        (col(s"__c$s") + 1).cast("int")))
      .reduce(_ + _)
    val scored = encoded
      .join(broadcast(probeDf), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        round(score, 6).as("score"))
    TopKAggregator.groupedTopK(scored, "probe_id", "neighbor_id", "score", k)
      .select("probe_id", "neighbor_id", "rank", "score")
  }
}
