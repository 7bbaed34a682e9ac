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
