package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Deterministic, oracle-replayable k-means over an embedding column
  * (SURVEY §2.10) — the clustering stage of an embedding pipeline
  * (coarse quantizer fitting, semantic sharding, diversity sampling),
  * expressed so an external engine can replay every iteration exactly.
  *
  * Lloyd's algorithm with three deterministic pins:
  *
  *  - INIT: the `k` lowest-id vectors (the IVF quantizer trick — no
  *    RNG, stable under corpus growth of higher ids);
  *  - ASSIGNMENT: cosine argmax via the same row-local native
  *    expression as IVF ([[graft.functions.NativeExpressions
  *    .NearestCells]]), ties to the lower cell ordinal, zero-norm
  *    pairs last — one map-only job per iteration, no shuffle of
  *    vectors;
  *  - UPDATE: per-cell per-dimension means ROUNDED to 6 decimals at
  *    the iteration boundary. Distributed sums are partition-order
  *    dependent in the last ulps; rounding collapses that to one
  *    canonical value (the q_centroids stance), which is what makes
  *    iteration N+1's input — and therefore the whole chain —
  *    replayable bit-for-bit by the DuckDB oracle. An emptied cell
  *    keeps its previous centroid.
  *
  * Shape at scale: per iteration, one assignment scan (centroid matrix
  * rides as a codegen reference, O(k * dim) per row) plus one
  * (cell, dim)-keyed aggregation whose map-side partials collapse to
  * k * dim rows per partition; the driver holds only the k * dim
  * centroid matrix (same footprint class as the fitted IVF quantizer).
  * Nothing else leaves the executors.
  *
  * For throughput-first refinement where bitwise reproducibility is
  * not required, [[SimilaritySearch.ivfTopK]]'s `refineIters` keeps
  * the unrounded form.
  */
object KMeans {

  /** Fit `iters` rounded Lloyd iterations from the lowest-id init and
    * return the final centroid literals `(ordinal, vector, norm)` —
    * the reusable half of [[assignRounded]], exposed so composite
    * quantizers ([[ProductQuantization]]) can train per-subspace
    * codebooks through the identical replayable chain.
    */
  def fitRounded(vectors: DataFrame, idCol: String, vecCol: String,
                 k: Int, iters: Int): Seq[(Long, Array[Double], Double)] =
    fitRounded(vectors, idCol, vecCol, k, iters, init = None)

  /** [[fitRounded]] with a caller-supplied lowest-id init — for
    * composite quantizers that can derive every subspace's seed set
    * from ONE corpus scan instead of paying a full TakeOrdered scan
    * per subspace (the init term was 8× the corpus reads of the whole
    * PQ fit, and the dominant skew source when the fits run
    * concurrently against a cold cache).
    */
  def fitRounded(vectors: DataFrame, idCol: String, vecCol: String,
                 k: Int, iters: Int,
                 init: Option[Seq[(Long, Array[Double], Double)]])
      : Seq[(Long, Array[Double], Double)] = {
    require(k > 0, s"k must be positive, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    var cents: Seq[(Long, Array[Double], Double)] = init.getOrElse(
      SimilaritySearch.centroidLiterals(vectors, idCol, vecCol, k).toSeq)
    val vec = VectorFunctions.toDouble(col(vecCol))
    def assigned = vectors.select(col(idCol), vec.as("__v"))
      // coalesce to a provably non-null id — same constraint-dedup
      // rationale as ivfTopK's assignment
      .withColumn("cell_id", coalesce(
        element_at(SimilaritySearch.nearestCells(col("__v"), cents, 1), 1),
        lit(-1L)))
    for (_ <- 0 until iters) {
      val means = assigned
        .select(col("cell_id"), posexplode(col("__v")))
        .groupBy("cell_id", "pos")
        .agg(round(avg("col"), 6).as("m"))
        .collect() // k x dim rows by construction
        .groupBy(_.getLong(0))
        .map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray
        }
      cents = cents.map { case (cid, oldV, oldN) =>
        means.get(cid) match {
          case Some(nv) =>
            var ss = 0.0
            var i = 0
            while (i < nv.length) { ss += nv(i) * nv(i); i += 1 }
            (cid, nv, math.sqrt(ss))
          case None => (cid, oldV, oldN) // emptied cell keeps its centroid
        }
      }
    }
    cents
  }

  /** Final cluster assignment (idCol, cell_id) after `iters` rounded
    * Lloyd iterations from the lowest-id init. `iters = 0` is the raw
    * lowest-id quantizer assignment.
    */
  def assignRounded(vectors: DataFrame, idCol: String, vecCol: String,
                    k: Int, iters: Int): DataFrame = {
    val cents = fitRounded(vectors, idCol, vecCol, k, iters)
    val vec = VectorFunctions.toDouble(col(vecCol))
    vectors.select(col(idCol), vec.as("__v"))
      .withColumn("cell_id", coalesce(
        element_at(SimilaritySearch.nearestCells(col("__v"), cents, 1), 1),
        lit(-1L)))
      .select(col(idCol), col("cell_id"))
  }

  /** Cluster-vs-label purity — the unsupervised-clustering eval
    * harness (the [[AnnEval]] stance applied to [[assignRounded]]):
    * per cluster, the majority label's share. A purity near 1 means
    * the embedding clusters recover the labels; the per-cluster rows
    * tell you WHICH clusters are mixed. Vote ties break to the
    * smaller label (the [[KnnClassify]] convention).
    *
    * Everything past the assignment is O(k x labels): one
    * (cell, label) aggregation and two windows over that bounded
    * frame.
    *
    * Output: (cell_id, n_vecs, top_label, purity).
    */
  def clusterPurity(vectors: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, k: Int, iters: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val assign = assignRounded(vectors, idCol, vecCol, k, iters)
    val cells = assign
      .join(vectors.select(col(idCol), col(labelCol).as("__lab")), Seq(idCol))
      .groupBy(col("cell_id"), col("__lab")).agg(count(lit(1)).as("__n"))
    cells
      .withColumn("__rn", row_number().over(
        w.partitionBy("cell_id").orderBy(col("__n").desc, col("__lab"))))
      .withColumn("n_vecs", sum("__n").over(w.partitionBy("cell_id")))
      .filter(col("__rn") === 1)
      .select(col("cell_id"), col("n_vecs"), col("__lab").as("top_label"),
        round(col("__n").cast("double") / col("n_vecs"), 6).as("purity"))
  }
}
