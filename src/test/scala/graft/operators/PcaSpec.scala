package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("recovers a planted dominant direction") {
    // variance concentrated on axis 1: v = (t, 10t, 0, 0) + tiny axis-2
    // noise; the leading component must align with e1 (|x_1| ~ 1)
    val rows = (0 until 400).map { i =>
      val t = (i % 21 - 10).toDouble
      (i.toLong, Array(t.toFloat, (10 * t).toFloat,
        ((i % 3) * 0.01).toFloat, 0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.fitLeading(df, "embedding", dim = 4, iters = 12)
    assert(math.abs(m.component(1)) > 0.99,
      s"component ${m.component.toSeq} must align with the planted axis")
    assert(math.abs(m.component(0) * 10 - m.component(1)) < 0.02,
      "direction must be ~(1, 10)/|.|")
    // eigenvalue ~ variance along (1,10)/sqrt(101): var(t)*101
    val varT = rows.map(r => math.pow((r._1 % 21 - 10).toDouble, 2)).sum / 400
    assert(math.abs(m.eigenvalue - varT * 101) / (varT * 101) < 0.01,
      s"eigenvalue ${m.eigenvalue} vs expected ${varT * 101}")
  }

  test("deterministic under repartition and row order") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val a = Pca.fitLeading(emb, "embedding", dim = 64, iters = 6)
    val b = Pca.fitLeading(
      emb.repartition(13, col("label")).sortWithinPartitions(col("vec_id").desc),
      "embedding", dim = 64, iters = 6)
    assert(a.component.toSeq === b.component.toSeq)
    assert(a.eigenvalue === b.eigenvalue)
    assert(a.mean.toSeq === b.mean.toSeq)
  }

  test("projection is centered and its variance matches the eigenvalue") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val m = Pca.fitLeading(emb, "embedding", dim = 64, iters = 8)
    val stats = Pca.projectLeading(emb, "vec_id", "embedding",
        dim = 64, iters = 8)
      .agg(avg(col("pc1")), avg(col("pc1") * col("pc1")), count(lit(1)))
      .head()
    val (mu, m2, n) = (stats.getDouble(0), stats.getDouble(1), stats.getLong(2))
    assert(math.abs(mu) < 1e-3, s"projection mean $mu must be ~0")
    // E[p²] - E[p]² = x^T C x = eigenvalue (once iteration converged)
    val varP = m2 - mu * mu
    assert(math.abs(varP - m.eigenvalue) / m.eigenvalue < 0.05,
      s"projection variance $varP vs eigenvalue ${m.eigenvalue}")
    assert(n === emb.count())
  }

  test("fitTopK: planted two-direction spectrum, ordered and orthogonal") {
    // axis 1 carries 100x the variance of axis 3; everything else 0
    val rows = (0 until 420).map { i =>
      val t = (i % 21 - 10).toDouble
      val s = ((i / 21) % 5 - 2).toDouble
      (i.toLong, Array(0f, (10 * t).toFloat, 0f, s.toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val ms = Pca.fitTopK(df, "embedding", dim = 4, k = 2, iters = 12)
    assert(ms.size === 2)
    assert(math.abs(ms(0).component(1)) > 0.999, "pc1 must be axis 1")
    assert(math.abs(ms(1).component(3)) > 0.999, "pc2 must be axis 3")
    assert(ms(0).eigenvalue > ms(1).eigenvalue,
      "eigenvalues must come out in decreasing order")
    val dot = (0 until 4).map(i =>
      ms(0).component(i) * ms(1).component(i)).sum
    assert(math.abs(dot) < 1e-3, s"components must be orthogonal, dot=$dot")
  }

  test("projectTopK column variances match the eigenvalues") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val ms = Pca.fitTopK(emb, "embedding", dim = 64, k = 2, iters = 16)
    val stats = Pca.projectTopK(emb, "vec_id", "embedding",
        dim = 64, k = 2, iters = 16)
      .agg(avg(col("pc1") * col("pc1")), avg(col("pc2") * col("pc2")),
        avg(col("pc1") * col("pc2")))
      .head()
    assert(math.abs(stats.getDouble(0) - ms(0).eigenvalue)
      / ms(0).eigenvalue < 0.05)
    assert(math.abs(stats.getDouble(1) - ms(1).eigenvalue)
      / ms(1).eigenvalue < 0.05)
    // near-uncorrelated projections: random embeddings have a FLAT
    // spectrum, so power iteration converges slowly (per-step gain =
    // eigen-gap ratio) — bound the correlation coefficient, not zero
    val corr = stats.getDouble(2) /
      math.sqrt(ms(0).eigenvalue * ms(1).eigenvalue)
    assert(math.abs(corr) < 0.2,
      s"pc1/pc2 correlation $corr too large even for a flat spectrum")
  }

  test("diagnostics: rank-1 corpus reads dominant_ratio ~ dim") {
    val rows = (0 until 210).map { i =>
      val t = (i % 21 - 10).toDouble
      (i.toLong, Array(t.toFloat, (2 * t).toFloat, (3 * t).toFloat, 0f))
    }
    val d = Pca.diagnostics(rows.toDF("vec_id", "embedding"),
      "embedding", dim = 4, iters = 10).head()
    // all variance on one direction: trace = lambda1, ratio = dim
    assert(math.abs(d.getDouble(3) - 4.0) < 0.01,
      s"rank-1 corpus must read ratio ~ dim, got ${d.getDouble(3)}")
    assert(math.abs(d.getDouble(1) - d.getDouble(2)) / d.getDouble(1) < 0.01)
    assert(d.getLong(0) === 210L)
    // the real corpus is near-isotropic: ratio far from collapse
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val r = Pca.diagnostics(emb, "embedding", dim = 64, iters = 6)
      .head().getDouble(3)
    assert(r > 0.9 && r < 8.0, s"random embeddings should be near-isotropic, got $r")
  }

  test("rejects empty input and dim mismatches") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pca.fitLeading(empty, "embedding", dim = 4, iters = 2)
    }
    val wrong = Seq((1L, Array(1f, 2f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Pca.fitLeading(wrong, "embedding", dim = 4, iters = 2)
    }
    assert(e.getMessage.contains("expected dim") ||
      Option(e.getCause).exists(_.getMessage.contains("expected dim")))
  }
}
