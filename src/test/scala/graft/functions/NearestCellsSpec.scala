package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins NearestCells (the native IVF assignment loop) to a naive
  * reference implementation of the contract it replaced: nCells
  * cosine similarities, ordered (cosine desc, cell ordinal asc),
  * zero-norm similarities last. Deterministic pseudo-random inputs
  * cover float and double vectors, duplicated centroids (ties),
  * zero vectors on both sides, and a short input vector (the dot
  * runs over min(len, dim), same as ArrayDotProduct).
  */
class NearestCellsSpec extends SparkTestBase {
  import spark.implicits._

  private def refOrder(v: Array[Double], cents: Array[Array[Double]],
                       take: Int): Seq[Long] = {
    val vn = math.sqrt(v.map(x => x * x).sum)
    val keys = cents.map { c =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val d = vn * cn
      val m = math.min(v.length, c.length)
      val s = (0 until m).map(i => v(i) * c(i)).sum
      if (d != 0.0) -(s / d) else 2.0
    }
    keys.zipWithIndex
      .sortBy { case (k, i) => (k, i) }
      .take(take).map(_._2.toLong).toSeq
  }

  private def prng(seed: Int): Iterator[Double] = {
    val r = new scala.util.Random(seed)
    Iterator.continually(r.nextDouble() * 2 - 1)
  }

  test("matches the naive reference on random double vectors, all take sizes") {
    val dim = 8
    val nCells = 13
    val it = prng(42)
    val cents = Array.fill(nCells)(Array.fill(dim)(it.next()))
    val flat = cents.flatten
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val rows = (0 until 50).map(i => (i.toLong, Array.fill(dim)(it.next())))
    val df = rows.toDF("id", "vec")
    for (take <- Seq(1, 4, nCells)) {
      val got = df.select(col("id"),
          NativeExpressions.nearestCells(col("vec"), flat, norms, dim, take))
        .as[(Long, Seq[Long])].collect().toMap
      rows.foreach { case (id, v) =>
        assert(got(id) === refOrder(v, cents, take), s"id=$id take=$take")
      }
    }
  }

  test("float vectors, duplicated centroids (tie -> lower ordinal), zero vectors") {
    val dim = 4
    val c0 = Array(1.0, 0.0, 0.0, 0.0)
    // cents 1 and 2 identical: any vector must rank 1 before 2
    val cents = Array(c0, Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 1.0, 0.0, 0.0), Array(0.0, 0.0, 0.0, 0.0)) // cell 3 zero
    val flat = cents.flatten
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val rows = Seq(
      (1L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // zero probe: all keys 2.0
      (3L, Array(0.0f, 2.0f, 0.0f, 0.0f)))
    val df = rows.toDF("id", "vec")
    val got = df.select(col("id"),
        NativeExpressions.nearestCells(col("vec"), flat, norms, dim, 4))
      .as[(Long, Seq[Long])].collect().toMap
    rows.foreach { case (id, v) =>
      assert(got(id) === refOrder(v.map(_.toDouble), cents, 4), s"id=$id")
    }
    assert(got(3L).take(2) === Seq(1L, 2L), "tie breaks to lower ordinal")
    assert(got(2L) === Seq(0L, 1L, 2L, 3L), "zero probe: ordinal order")
    assert(got(1L).last === 3L, "zero centroid sorts last")
  }

  test("short input vector dots over min(len, dim)") {
    val cents = Array(Array(1.0, 1.0, 1.0), Array(1.0, -1.0, 0.0))
    val flat = cents.flatten
    val norms = cents.map(c => math.sqrt(c.map(x => x * x).sum))
    val df = Seq((1L, Array(1.0, 1.0))).toDF("id", "vec")
    val got = df.select(col("id"),
        NativeExpressions.nearestCells(col("vec"), flat, norms, 3, 2))
      .as[(Long, Seq[Long])].collect().toMap
    assert(got(1L) === refOrder(Array(1.0, 1.0), cents, 2))
  }
}
