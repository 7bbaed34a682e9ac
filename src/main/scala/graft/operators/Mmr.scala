package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
  * diversity-aware selection from a retrieval candidate list — pick k
  * results that are relevant to the probe but NOT redundant with each
  * other, the standard answer to near-duplicate results in RAG
  * retrieval: score(c) = λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s),
  * greedily, ties to the lower id.
  *
  * Scale design: the distributed work is the candidate search
  * ([[SimilaritySearch.bruteTopK]] here; swap in the IVF/graph tier for
  * large corpora — the re-rank is tier-agnostic). The greedy loop runs
  * on the DRIVER over the candidateK-bounded list (k·candidateK
  * rounded-cosine comparisons over ≤ a few hundred rows — the same
  * bounded-collect contract as the IVF centroid table). Sequential
  * greedy selection is inherently iterative; distributing 50 rows
  * through k Spark jobs would be pure overhead.
  *
  * Float discipline (the oracle-parity rules): candidate selection
  * ranks on the UNROUNDED cosine (identical IEEE doubles in both
  * engines); rel and pairwise sims are then ROUNDED to 6 decimals so
  * the greedy comparisons — λ·rel − (1−λ)·maxSim on rounded inputs —
  * are ulp-safe, with id tie-breaks.
  */
object Mmr {

  /** Greedy MMR over the probe's top-`candidateK` cosine candidates.
    * Returns (rank, neighbor_id, rel) for the k selections.
    */
  def mmrRerank(corpus: DataFrame, idCol: String, vecCol: String,
                probeId: Long, candidateK: Int, k: Int,
                lambda: Double): DataFrame = {
    require(k > 0 && k <= candidateK, s"need 0 < k <= candidateK")
    require(lambda >= 0 && lambda <= 1, s"lambda in [0,1], got $lambda")
    val spark = corpus.sparkSession
    val cand = SimilaritySearch.bruteTopK(
        corpus.filter(col(idCol) === probeId), corpus, idCol, vecCol,
        k = candidateK)
      .select(col("neighbor_id"), round(col("cosine"), 6).as("rel"))
    val withVecs = cand.join(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__v")),
        Seq("neighbor_id"))
      .select("neighbor_id", "rel", "__v")
      .collect()
    final case class C(id: Long, rel: Double, v: Array[Double])
    val cs = withVecs.map { r =>
      C(r.getLong(0), r.getDouble(1),
        r.getSeq[Float](2).toArray.map(_.toDouble))
    }.sortBy(c => (-c.rel, c.id))
    // pairwise cosine, same accumulation order as the engines' dot
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0) 0.0
      else BigDecimal(dot / d) // HALF_UP == Spark/DuckDB round()
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val selected = scala.collection.mutable.ArrayBuffer.empty[C]
    while (selected.length < math.min(k, cs.length)) {
      val remaining = cs.filterNot(c => selected.exists(_.id == c.id))
      val best = remaining.minBy { c =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos(c.v, s.v)).max
        (-(lambda * c.rel - (1 - lambda) * maxSim), c.id)
      }
      selected += best
    }
    val rows = selected.zipWithIndex.map { case (c, i) =>
      Row((i + 1).toLong, c.id, c.rel)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 1),
      StructType(Seq(
        StructField("rank", LongType, nullable = false),
        StructField("neighbor_id", LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false))))
  }
}
