package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN index-quality evaluation (SURVEY §2.10 similarity search): the
  * recall@k harness every production vector index ships with — before
  * trusting an IVF/PQ/graph/SRP tier at 100 TB you measure, on a probe
  * sample, what fraction of the TRUE top-k each approximate tier
  * returns, and tune the knobs (nProbe, kSub, ef, bits) against that
  * curve. This operator is the measurement half; the tiers themselves
  * live in [[SimilaritySearch]] / [[ProductQuantization]] /
  * [[GraphAnn]].
  *
  * Per-probe recall = |approx top-k ∩ exact top-k| / |exact top-k|
  * (the denominator is the ACHIEVABLE set size, so probes with fewer
  * than k defined neighbors — tiny corpora, null cosines — still
  * score in [0, 1]). Probes the exact tier scores are the base: an
  * approximate tier that misses a probe entirely scores 0, not
  * no-row.
  *
  * Shape at scale: both inputs are already probe×k bounded (that is
  * the ANN contract), so everything here is joins and aggregations
  * over O(probes × k) rows — negligible next to the searches that
  * produced them, and broadcastable on the approx side.
  */
object AnnEval {

  /** Per-probe recall of `approx` against `exact` — both in the ANN
    * result shape (probe_id, neighbor_id, rank, ...). Rows ranked
    * past `k` are ignored on both sides, so differently-sized result
    * lists compare at the same cut. Output: (probe_id, n_exact,
    * n_hit, recall).
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"recall needs k > 0, got $k")
    val a = approx.filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"))
    val e = exact.filter(col("rank") <= k)
      .select(col("probe_id"), col("neighbor_id"))
    val base = e.groupBy("probe_id").agg(count(lit(1)).as("n_exact"))
    val hits = e.join(a, Seq("probe_id", "neighbor_id"))
      .groupBy("probe_id").agg(count(lit(1)).as("n_hit"))
    base.join(hits, Seq("probe_id"), "left_outer")
      .select(col("probe_id"), col("n_exact"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact").cast("double"), 6).as("recall"))
  }
}
