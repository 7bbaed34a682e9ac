package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` /
  * `array<double>` columns (SURVEY §2.10: similarity search).
  *
  * Built from higher-order functions (`zip_with`, `aggregate`) — no
  * UDFs, no driver-side math. All arithmetic is double-precision with a
  * left-fold in index order, so results are bit-deterministic and
  * oracle-comparable.
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> (do this once, up front, so
    * all downstream arithmetic is in one precision).
    */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d =!= 0.0, dot(a, b) / d)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Sign-random-projection bucket id: `nBits` hyperplane signs packed
    * into a long. Hyperplane components are pseudo-random but
    * deterministic — derived from `xxhash64(bit, dim)` — so the same
    * vector always lands in the same bucket on any cluster.
    * This is the LSH prefilter for cosine ANN: vectors in the same
    * bucket are candidate neighbors; at 100 TB the bucket id becomes the
    * shuffle/partition key and the quadratic compare happens only within
    * buckets.
    */
  def srpBucket(v: Column, nBits: Int, seed: Int = 0): Column = {
    val dv = toDouble(v)
    val bits = (0 until nBits).map { bit =>
      // plane(seed, bit, j) = hash mapped to [-1, 1)
      val proj = aggregate(
        zip_with(dv, sequence(lit(0), size(dv) - 1), (x, j) =>
          x * (xxhash64(lit(seed), lit(bit), j).cast("double") / lit(Long.MaxValue.toDouble))),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
