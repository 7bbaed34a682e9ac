package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** k-NN label propagation over an embedding column — classify
  * unlabeled vectors by majority vote of their k nearest labeled
  * neighbors (cosine). The standard bootstrap for quality/domain
  * labels in training-data curation: hand-label a seed set, propagate
  * to the corpus, filter on the propagated label. SURVEY §2.10
  * similarity tier; no reference citation.
  *
  * Shape at scale: neighbor search is delegated to
  * [[SimilaritySearch.bruteTopK]] (broadcast probes × corpus, exact)
  * — swap in `ivfTopK`/`srpTopK` for large probe sets; the vote is an
  * O(probes × k) aggregation, and the ranking window runs over at
  * most `k` vote rows per probe. Nothing here is corpus-quadratic.
  *
  * Determinism: neighbor rank ties break on neighbor_id (the
  * groupedTopK contract); vote ties break on the smaller label.
  */
object KnnClassify {

  /** Returns (probe_id, pred_label, votes): the winning label among
    * the k nearest labeled neighbors and its vote count. Labeled rows
    * with a NULL label are excluded from the electorate.
    */
  def classify(probes: DataFrame, labeled: DataFrame, idCol: String,
               vecCol: String, labelCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val electorate = labeled.filter(col(labelCol).isNotNull)
    val nn = SimilaritySearch.bruteTopK(probes, electorate, idCol, vecCol, k)
    vote(nn, electorate, idCol, labelCol)
  }

  /** The majority-vote tail shared by every search tier: join the
    * (probe_id, neighbor_id) rows against the electorate's labels,
    * count votes, keep the winner (ties to the smaller label). The
    * vote is O(probes x k) and the ranking window sees at most
    * #labels rows per probe — nothing downstream of the search scales
    * with the corpus.
    */
  private def vote(nn: DataFrame, electorate: DataFrame, idCol: String,
                   labelCol: String): DataFrame = {
    val lab = electorate.select(col(idCol).as("__lid"),
      col(labelCol).as("__lab"))
    val votes = nn.join(lab, col("neighbor_id") === col("__lid"))
      .groupBy(col("probe_id"), col("__lab"))
      .agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("votes").desc, col("__lab"))
    votes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("probe_id"), col("__lab").as("pred_label"), col("votes"))
  }

  /** Label-noise detection by k-NN disagreement (the confident-learning
    * screen): every labeled vector is re-classified by its k nearest
    * OTHER labeled vectors; a row whose neighborhood vote contradicts
    * its own label is a mislabeling suspect for human re-review. The
    * standard pre-training label audit — run it before trusting a
    * propagated or crowd-sourced label column.
    *
    * Same machinery as [[classify]] with probes = electorate (self
    * matches are excluded by the search's id inequality). The probe
    * side is the whole labeled set: fine while it broadcasts; for
    * web-scale label audits swap the bruteTopK call for `ivfTopK` —
    * the vote and disagreement stages are unchanged.
    *
    * Output: (probe_id, label, pred_label, votes, is_suspect).
    */
  def labelSuspects(labeled: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, k: Int): DataFrame = {
    val electorate = labeled.filter(col(labelCol).isNotNull)
    flagSuspects(
      classify(electorate, electorate, idCol, vecCol, labelCol, k),
      electorate, idCol, labelCol)
  }

  /** [[labelSuspects]] with the neighbor search routed through the IVF
    * index instead of the brute probe-x-electorate scan — the
    * web-scale realization of the audit the brute tier's scaladoc
    * promises: the whole labeled set is both probe and corpus side, so
    * past broadcastable sizes the brute plan is |L|^2 dots while this
    * one compares each vector only against its nProbe nearest cells
    * (|L|^2 x nProbe / nCells pairs, cell-local, salted-join guarded —
    * the [[SimilaritySearch.ivfTopK]] machinery end to end).
    *
    * The verdict is approximate exactly where the search is: a suspect
    * flag can differ from the brute audit only when the IVF
    * neighborhood differs from the true one, which recall tuning
    * (nCells x nProbe) bounds — and the whole approximate audit is
    * deterministic (lowest-id centroids), so it replays in the oracle.
    */
  def labelSuspectsIvf(labeled: DataFrame, idCol: String, vecCol: String,
                       labelCol: String, k: Int, nCells: Int = 16,
                       nProbe: Int = 4): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val electorate = labeled.filter(col(labelCol).isNotNull)
    val nn = SimilaritySearch.ivfTopK(electorate, electorate, idCol, vecCol,
      k, nCells, nProbe)
    flagSuspects(vote(nn, electorate, idCol, labelCol), electorate,
      idCol, labelCol)
  }

  private def flagSuspects(pred: DataFrame, electorate: DataFrame,
                           idCol: String, labelCol: String): DataFrame =
    pred
      .join(electorate.select(col(idCol).as("probe_id"),
        col(labelCol).as("label")), Seq("probe_id"))
      .select(col("probe_id"), col("label"), col("pred_label"), col("votes"),
        (col("pred_label") =!= col("label")).as("is_suspect"))
}
