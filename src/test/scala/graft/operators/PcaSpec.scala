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
