package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SimilaritySearchSpec extends SparkTestBase {
  import spark.implicits._

  // Three orthogonal-ish clusters in 4-d: ids 1,2 aligned; 3 orthogonal.
  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (4L, Array(0.0f, 0.1f, 0.9f, 0.0f)),
    (5L, Array(0.5f, 0.5f, 0.5f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("bruteTopK ranks the aligned vector first") {
    val got = SimilaritySearch.bruteTopK(
      vecs.filter(col("vec_id") === 1), vecs, "vec_id", "embedding", k = 2)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toMap
    assert(got(2L) === 1L, "closest to e1 is (0.9, 0.1, ...)")
  }

  test("bruteTopK cosine values are correct") {
    val got = SimilaritySearch.bruteTopK(
      vecs.filter(col("vec_id") === 1), vecs, "vec_id", "embedding", k = 4)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toMap
    assert(math.abs(got(2L) - 0.9 / math.sqrt(0.81 + 0.01)) < 1e-6)
    assert(math.abs(got(3L)) < 1e-6)
    assert(math.abs(got(5L) - 0.5) < 1e-6)
  }

  test("ivfTopK recall: finds most brute-force top-1 neighbors on real embeddings") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 32)
    val brute = SimilaritySearch.bruteTopK(probes, emb, "vec_id", "embedding", 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val ivf = SimilaritySearch.ivfTopK(probes, emb, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 8)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = brute.count { case (p, n) => ivf.getOrElse(p, Set.empty).contains(n) }
    assert(hits >= brute.size / 2,
      s"IVF recall@top1 too low: $hits/${brute.size}")
  }

  test("ivfTopK with k-means-refined centroids keeps recall on real embeddings") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 32)
    val brute = SimilaritySearch.bruteTopK(probes, emb, "vec_id", "embedding", 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val refined = SimilaritySearch.ivfTopK(probes, emb, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 8, refineIters = 2)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = brute.count { case (p, n) => refined.getOrElse(p, Set.empty).contains(n) }
    assert(hits >= brute.size / 2,
      s"refined-IVF recall@top1 too low: $hits/${brute.size}")
  }

  test("ivfTopK large-probe fallback: identical results, shuffled-hash plan") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 32)
    def run(maxBroadcast: Long) = SimilaritySearch.ivfTopK(
      probes, emb, "vec_id", "embedding",
      k = 5, nCells = 16, nProbe = 4, maxBroadcastBytes = Some(maxBroadcast))
    val broadcastPath = run(Long.MaxValue)
    val fallbackPath = run(1L) // probe estimate always exceeds 1 byte
    // plan shapes: bounded probes broadcast; oversized probes take the
    // salted shuffled-hash join (and never a sort-merge over cell_id)
    val bPlan = broadcastPath.queryExecution.executedPlan.toString
    val fPlan = fallbackPath.queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"), bPlan.take(1500))
    assert(fPlan.contains("ShuffledHashJoin"), fPlan.take(1500))
    assert(!fPlan.contains("SortMergeJoin"),
      "fallback must not sort-merge on the low-cardinality cell key")
    assert(!fPlan.contains("BroadcastHashJoin") ||
      !fPlan.contains("probe_id#"), // no probe-side broadcast remains
      fPlan.take(1500))
    // identical output row sets (rank ties resolved identically: the
    // aggregator's ordering is deterministic on (cosine, neighbor_id))
    val b = broadcastPath.select("probe_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    val f = fallbackPath.select("probe_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(b === f, "the two join strategies must agree exactly")
  }

  test("cosineDupePairsLsh: results are a subset of the exact all-pairs verifier") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 300)
    val exact = SimilaritySearch.cosineDupePairs(emb, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = SimilaritySearch.cosineDupePairsLsh(emb, "vec_id", "embedding",
        0.35, bands = 16, bitsPerBand = 8, maxDim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty, "bucketing found no candidate pairs at all")
    assert(lsh.subsetOf(exact), "in-bucket verification must never over-report")
  }

  test("cosineDupePairsLsh: identical vectors are always found (recall 1 for exact dups)") {
    // an identical pair shares every band bucket, so no parameter
    // choice can miss it
    val withDup = vecs.unionByName(
      vecs.filter(col("vec_id") === 1).withColumn("vec_id", lit(100L)))
    val got = SimilaritySearch.cosineDupePairsLsh(withDup, "vec_id", "embedding",
        0.99, bands = 4, bitsPerBand = 8, maxDim = 64)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 100L)))
  }

  test("SrpBucketArray: one-pass native buckets == per-band literal srpBucket") {
    import graft.functions.{NativeExpressions, VectorFunctions}
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 50)
    val viaArray = emb.select(col("vec_id"),
        posexplode(NativeExpressions.srpBucketArray(col("embedding"), 4, 8, 64)))
      .as[(Long, Int, Long)].collect()
      .map { case (id, band, b) => (id, band) -> b }.toMap
    val viaLiterals = (0 until 4).flatMap { band =>
      emb.select(col("vec_id"),
          VectorFunctions.srpBucket(col("embedding"), 8, seed = band, maxDim = 64))
        .as[(Long, Long)].collect()
        .map { case (id, b) => (id, band) -> b }
    }.toMap
    assert(viaArray === viaLiterals)
  }

  test("srpTopK finds the true nearest neighbor of an identical vector") {
    // identical vectors land in identical buckets in every band
    val probe = vecs.filter(col("vec_id") === 1)
      .withColumn("vec_id", lit(100L))
    val got = SimilaritySearch.srpTopK(probe, vecs, "vec_id", "embedding",
      k = 1, bands = 4, bitsPerBand = 4)
      .select("neighbor_id").as[Long].collect()
    assert(got.headOption === Some(1L))
  }

  test("quantizedTopK with full refine budget equals bruteTopK exactly") {
    // refine large enough that every corpus vector survives candidate
    // generation: the exact rescore stage then IS brute force, so any
    // divergence would be a bug in the quantize/rescore plumbing.
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 16)
    val n = emb.count().toInt
    val brute = SimilaritySearch.bruteTopK(probes, emb, "vec_id", "embedding", 5)
      .select("probe_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val quant = SimilaritySearch.quantizedTopK(probes, emb, "vec_id", "embedding",
      k = 5, refine = n / 5 + 1)
      .select("probe_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(quant === brute)
  }

  test("quantizedTopK recall vs brute at a real refine budget") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 32)
    val brute = SimilaritySearch.bruteTopK(probes, emb, "vec_id", "embedding", 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val quant = SimilaritySearch.quantizedTopK(probes, emb, "vec_id", "embedding",
        k = 5, refine = 4)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = brute.count { case (p, n) => quant.getOrElse(p, Set.empty).contains(n) }
    // int8 on the full corpus is a much tighter sieve than IVF/SRP —
    // the true top-1 should essentially always survive a 4x refine pool
    assert(hits >= brute.size * 9 / 10,
      s"quantized recall@top1 too low: $hits/${brute.size}")
  }

  test("hardNegatives: every neighbor has a different label, ranks dense") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val labels = emb.select("vec_id", "label").as[(Long, Int)].collect().toMap
    val got = SimilaritySearch.hardNegatives(emb, "vec_id", "embedding",
        "label", col("vec_id") < 8, k = 3)
      .select("probe_id", "neighbor_id", "rank").as[(Long, Long, Long)]
      .collect()
    assert(got.length === 8 * 3)
    got.foreach { case (p, n, _) =>
      assert(labels(p) != labels(n), s"same-label pair $p/$n leaked") }
    got.groupBy(_._1).foreach { case (p, rs) =>
      assert(rs.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L), s"probe $p ranks") }
  }

  test("hardNegatives == bruteTopK over the label-filtered corpus") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probe = emb.filter(col("vec_id") === 0)
    val probeLabel = probe.select("label").as[Int].head()
    val byFilter = SimilaritySearch.bruteTopK(probe,
        emb.filter(col("label") =!= probeLabel), "vec_id", "embedding", 5)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toSet
    val byOp = SimilaritySearch.hardNegatives(emb, "vec_id", "embedding",
        "label", col("vec_id") === 0, 5)
      .select("neighbor_id", "rank").as[(Long, Long)].collect().toSet
    assert(byOp === byFilter)
  }
}
