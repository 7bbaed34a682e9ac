package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
  * deduplication of an embedded corpus — cluster the embeddings with
  * k-means, then drop, within each cluster, every vector that has a
  * same-cluster neighbor above a cosine threshold with a smaller id
  * (the deterministic keeper rule standing in for the paper's
  * keep-one-per-dup-group choice). SURVEY §2.10 dedup tier; no
  * reference citation.
  *
  * Shape at scale: the pair generation is the published algorithm's —
  * all-pairs WITHIN a cluster only, never across the corpus. The
  * clustering step is what bounds it: with c = corpus/k points per
  * cluster the comparison volume is k * c^2, and k is chosen so c
  * stays in the tens-of-thousands (the paper uses ~50k clusters for
  * LAION-440M). The shuffle key is cell_id; a hot cluster is a skew
  * problem before it is a compute one, and the fix is raising k, not
  * changing the operator. Uses [[KMeans.assignRounded]] so the
  * cluster assignment — and therefore the whole result — is
  * engine-reproducible (the DuckDB oracle replays the identical
  * rounded-Lloyd chain, then the identical pair rule).
  */
object SemDedup {

  /** Returns every input id with its final cluster and a `keep` flag;
    * `keep = false` iff some same-cluster vector with a smaller id has
    * cosine >= `tau` with it. Output: (idCol, cell_id, keep).
    */
  def semDedup(vecs: DataFrame, idCol: String, vecCol: String,
               k: Int, iters: Int, tau: Double): DataFrame = {
    val assign = KMeans.assignRounded(vecs, idCol, vecCol, k, iters)
    flagWithinCells(vecs, assign, idCol, vecCol, tau)
  }

  /** Scale path of [[semDedup]]: at paper-sized cluster counts the
    * FLAT assignment argmax is the wall — k = N/250 at 10 M vectors is
    * 40k centroids, O(k·dim·N) ≈ 2.6e13 mult-adds, infeasible in one
    * JVM and wasteful on a cluster (sharding the argmax by centroid
    * block moves the flops around, it does not remove any). The
    * standard fix is a TWO-LEVEL cell (hierarchical coarse
    * quantization, the IVF/IMI shape): a coarse rounded-Lloyd cell
    * (`kCoarse` centroids) refined by a deterministic
    * sign-random-projection signature (`srpBits` hyperplane signs,
    * [[VectorFunctions.srpBucket]]). Assignment flops drop to
    * O((kCoarse + srpBits)·dim·N) — ~100x at the tier-2 sizing — while
    * the effective cell count kCoarse·2^srpBits keeps the
    * within-cell pair volume at the paper's budget. IDENTICAL vectors
    * still co-locate exactly (both levels are deterministic functions
    * of the vector), so exact-twin recall is 1; a cos >= tau near-dup
    * pair splits only when an SRP plane separates it — probability
    * <= srpBits·acos(tau)/pi (< 1% at tau = 0.99, srpBits = 8), the
    * standard SRP recall trade, tunable via srpBits.
    * Output schema identical to [[semDedup]]; cell_id is the composite
    * coarse·2^srpBits + signature.
    */
  def semDedupScale(vecs: DataFrame, idCol: String, vecCol: String,
                    kCoarse: Int, iters: Int, srpBits: Int,
                    tau: Double): DataFrame = {
    require(srpBits >= 1 && srpBits <= 24, s"srpBits out of range: $srpBits")
    val coarse = KMeans.assignRounded(vecs, idCol, vecCol, kCoarse, iters)
    val sig = vecs.select(col(idCol).as("__sid"),
      VectorFunctions.srpBucket(
        VectorFunctions.toDouble(col(vecCol)), srpBits).as("__sig"))
    val assign = coarse.join(sig, col(idCol) === col("__sid"))
      .select(col(idCol),
        (col("cell_id") * (1L << srpBits) + col("__sig")).as("cell_id"))
    flagWithinCells(vecs, assign, idCol, vecCol, tau)
  }

  /** The paper's within-cell pair rule over a finished assignment:
    * drop every vector with a smaller-id same-cell neighbor at
    * cosine >= tau. Shared by the flat and two-level assignments.
    */
  private def flagWithinCells(vecs: DataFrame, assign: DataFrame,
                              idCol: String, vecCol: String,
                              tau: Double): DataFrame = {
    val emb = vecs.select(col(idCol).as("__eid"),
      VectorFunctions.toDouble(col(vecCol)).as("__v"))
    val cellVecs = assign
      .join(emb, col(idCol) === col("__eid"))
      .select(col(idCol).as("id"), col("cell_id"), col("__v"))
      .withColumn("__n", VectorFunctions.norm(col("__v")))
    val lo = cellVecs.select(col("id").as("lo_id"),
      col("cell_id").as("lo_cell"),
      col("__v").as("__lv"), col("__n").as("__ln"))
    val hi = cellVecs.select(col("id").as("hi_id"),
      col("cell_id").as("hi_cell"),
      col("__v").as("__hv"), col("__n").as("__hn"))
    // zero-norm cosines are NULL (never >= tau): zero vectors are
    // incomparable, so they are always kept — same rule both engines
    val dropped = lo.join(hi,
        col("lo_cell") === col("hi_cell") && col("lo_id") < col("hi_id"))
      .filter(VectorFunctions.cosineWithNorms(
        col("__lv"), col("__hv"), col("__ln"), col("__hn")) >= tau)
      .select(col("hi_id")).distinct()
    assign
      .join(dropped, col(idCol) === col("hi_id"), "left")
      .select(col(idCol), col("cell_id"),
        col("hi_id").isNull.as("keep"))
  }
}
