package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2.10: similarity search).
  *
  * Two paths:
  *  - [[bruteTopK]]: exact cosine top-k, probes x corpus. The PROBE side
  *    is broadcast (probes are the small side by construction), so the
  *    100 TB corpus is scanned once with no shuffle — the only exchange
  *    is the final per-probe top-k aggregation, whose input is already
  *    reduced to k rows per (probe, partition) by the window-free
  *    partial-rank trick below at scale. Complexity O(|P| * |C|).
  *  - [[srpTopK]]: sign-random-projection LSH bucketing; candidates are
  *    only corpus vectors whose bucket matches the probe's within a
  *    band. Shuffle key = bucket id; comparisons are bucket-local. This
  *    is the scale path when |P| is large too.
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
      .withColumn("cosine", VectorFunctions.cosineWithNorms(
        col("__pv"), col("__cv"), col("__pn"), col("__cn")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }

  /** IVF (inverted-file) approximate top-k: a deterministic coarse
    * quantizer (the `nCells` lowest-id corpus vectors serve as
    * centroids) partitions the corpus into cells; each probe searches
    * only its `nProbe` nearest cells.
    *
    * Both assignment passes are broadcast joins against the tiny
    * centroid set, and the candidate join's key is the cell id — so at
    * corpus scale the shuffle moves (probe x nProbe) rows and each
    * comparison is cell-local. Recall/cost is tuned with nCells x
    * nProbe exactly as in classic IVF indexes.
    */
  def ivfTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nCells: Int = 16,
              nProbe: Int = 4): DataFrame = {
    val cents = corpus.orderBy(col(idCol)).limit(nCells)
      .select(col(idCol).as("cell_id"), col(vecCol).as("__centv"))
      .withColumn("__centn", VectorFunctions.norm(col("__centv")))

    def assign(df: DataFrame, id: String, vec: String, keep: Int): DataFrame = {
      val n = VectorFunctions.norm(col(vec))
      val scored = df.withColumn("__n", n)
        .join(broadcast(cents), lit(true))
        .withColumn("__sim", VectorFunctions.cosineWithNorms(
          col(vec), col("__centv"), col("__n"), col("__centn")))
      val w = Window.partitionBy(col(id))
        .orderBy(col("__sim").desc_nulls_last, col("cell_id"))
      scored.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= keep)
        .select(col(id), col(vec), col("cell_id"))
    }

    val corpusCells = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      "neighbor_id", "__cv", keep = 1)
    val probeCells = assign(
      probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv")),
      "probe_id", "__pv", keep = nProbe)

    val cands = probeCells.join(corpusCells, Seq("cell_id"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "__pv", "neighbor_id", "__cv").distinct()
      .withColumn("__pn", VectorFunctions.norm(col("__pv")))
      .withColumn("__cn", VectorFunctions.norm(col("__cv")))
      .withColumn("cosine", VectorFunctions.cosineWithNorms(
        col("__pv"), col("__cv"), col("__pn"), col("__cn")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cands.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }

  /** Embedding-cosine near-duplicate pairs: all (a < b) pairs above the
    * similarity threshold. Norms precomputed per vector; intended for a
    * bounded probe set or LSH-bucketed candidates — the full-corpus
    * scale path is [[srpTopK]]'s bucketing with this as the in-bucket
    * verifier.
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

  /** LSH-bucketed approximate top-k: candidates share at least one of
    * `bands` SRP bucket ids; exact cosine + rank within candidates.
    * Each band uses `bitsPerBand` hyperplanes, derived deterministically
    * (seeded by band index) so results are reproducible cluster-wide.
    */
  def srpTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, bands: Int = 4,
              bitsPerBand: Int = 8): DataFrame = {
    def withBuckets(df: DataFrame, id: String, vec: String): DataFrame = {
      val bucketArr = array((0 until bands).map { band =>
        struct(lit(band).as("band"),
          VectorFunctions.srpBucket(col(vec), bitsPerBand, seed = band)
            .as("bucket"))
      }: _*)
      df.select(col(id), col(vec), explode(bucketArr).as("bb"))
        .select(col(id), col(vec),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    }
    val p = withBuckets(
      probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv")),
      "probe_id", "__pv")
    val c = withBuckets(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv")),
      "neighbor_id", "__cv")
    val cands = p.join(c, Seq("band", "bucket"))
      .filter(col("probe_id") =!= col("neighbor_id"))
      .select("probe_id", "__pv", "neighbor_id", "__cv").distinct()
    val scored = cands
      .withColumn("cosine", VectorFunctions.cosine(col("__pv"), col("__cv")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("probe_id", "neighbor_id", "rank", "cosine")
  }
}
