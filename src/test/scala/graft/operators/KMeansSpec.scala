package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  // two well-separated direction clusters (cosine k-means separates by
  // direction): cluster A along +e0 with small e1 jitter, cluster B
  // along +e1 with small e0 jitter; ids interleaved so the lowest-id
  // init seeds one centroid in each
  private def jitter(i: Int): Double = 0.05 + 0.01 * (i % 7)
  private val vecs = (0 until 60).map { i =>
    val v = new Array[Double](8)
    if (i % 2 == 0) { v(0) = 1.0; v(1) = jitter(i) }
    else { v(1) = 1.0; v(0) = jitter(i) }
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  test("separates direction clusters after refinement") {
    val out = KMeans.assignRounded(vecs, "vec_id", "embedding",
        k = 2, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === 60)
    val a = (0 until 60 by 2).map(i => out(i.toLong)).toSet
    val b = (1 until 60 by 2).map(i => out(i.toLong)).toSet
    assert(a.size === 1 && b.size === 1 && a != b,
      s"each direction cluster must land in one distinct cell: a=$a b=$b")
  }

  test("deterministic across partitioning and repeated runs") {
    val once = KMeans.assignRounded(vecs, "vec_id", "embedding", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val again = KMeans.assignRounded(vecs.repartition(13), "vec_id",
        "embedding", 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(once === again)
  }

  test("iters = 0 is the raw lowest-id quantizer assignment") {
    // k = 2 seeds cell 0 with vec 0's (+e0) direction and cell 1 with
    // vec 1's (+e1) direction: with no refinement, parity decides
    val out = KMeans.assignRounded(vecs, "vec_id", "embedding",
        k = 2, iters = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 60).forall(i => out(i.toLong) == (i % 2).toLong))
  }

  test("an emptied cell keeps its previous centroid (no crash, stable ids)") {
    // k = 3 over the two-direction corpus: at least one seed centroid
    // loses the argmax everywhere after the first update; the run must
    // still assign every vector and keep cell ids in 0..k-1
    val out = KMeans.assignRounded(vecs, "vec_id", "embedding", 3, 3)
      .collect().map(r => r.getLong(1)).toSet
    assert(out.subsetOf(Set(0L, 1L, 2L)) && out.nonEmpty)
  }

  test("rejects bad parameters") {
    intercept[IllegalArgumentException] {
      KMeans.assignRounded(vecs, "vec_id", "embedding", 0, 1)
    }
    intercept[IllegalArgumentException] {
      KMeans.assignRounded(vecs, "vec_id", "embedding", 2, -1)
    }
  }

  test("clusterPurity: mixed cluster scored 2/3, clean cluster 1.0") {
    import spark.implicits._
    // seeds (ids 0 and 1) land one per cluster, so k = 2 converges to
    // the planted split; label 2 on id 3 is the impurity
    val labeled = Seq(
      (0L, Seq(1.0f, 0.0f, 0.05f), 1),
      (1L, Seq(0.0f, 1.0f, 0.05f), 5),
      (2L, Seq(1.0f, 0.1f, 0.0f), 1),
      (3L, Seq(1.0f, 0.0f, 0.1f), 2),
      (4L, Seq(0.1f, 1.0f, 0.0f), 5),
      (5L, Seq(0.0f, 1.0f, 0.1f), 5)
    ).toDF("vec_id", "embedding", "label")
    val got = KMeans.clusterPurity(labeled, "vec_id", "embedding", "label",
        k = 2, iters = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getInt(2), r.getDouble(3))).toMap
    assert(got(0L) === ((3L, 1, 0.666667)), s"mixed cluster: ${got(0L)}")
    assert(got(1L) === ((3L, 5, 1.0)), s"clean cluster: ${got(1L)}")
  }
}
