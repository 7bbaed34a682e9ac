package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<float>` /
  * `array<double>` columns (SURVEY §2.10: similarity search).
  *
  * The dot product is a native Catalyst expression
  * ([[NativeExpressions.ArrayDotProduct]], codegen'd tight loop) —
  * higher-order `aggregate`/`zip_with` pay one closure dispatch per
  * element, which at (pairs x dimensions) scale dominates the query.
  * All arithmetic is double-precision accumulated in index order, so
  * results are bit-deterministic and oracle-comparable.
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> (only needed when handing
    * vectors to engines that require one precision; the native dot
    * handles float/double inputs directly).
    */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column = NativeExpressions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d =!= 0.0, dot(a, b) / d)
  }

  /** Cosine from precomputed norms — at probe-x-corpus scale the norms
    * must be computed once per VECTOR, not once per PAIR.
    */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column = {
    val d = normA * normB
    when(d =!= 0.0, dot(a, b) / d)
  }

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(toDouble(a), toDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x))

  /** Deterministic Rademacher sign for the random-projection matrix
    * cell (j, d): parity of the first hex digit of md5("j_d") — a
    * definition any engine reproduces (the DuckDB oracle replays it
    * verbatim; RandomProjectionSpec pins this driver evaluation equal
    * to Spark's own `md5` expression so the two can never drift).
    */
  def rademacherSign(j: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"${j}_$d".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xF) % 2 == 0) 1.0 else -1.0
  }

  /** Johnson–Lindenstrauss random projection with a Rademacher (±1)
    * matrix (Achlioptas 2003: ±1 entries preserve pairwise distances
    * in expectation like Gaussians, with no float matrix to ship):
    * out[j] = Σ_d sign(j,d) · v[d] / √outDim. The projection matrix is
    * DERIVED (md5 parity of (j, d)), so no side state rides the plan
    * and every engine — and every executor — rebuilds the same matrix.
    *
    * Built as outDim flat left-associated sum chains over `element_at`
    * (no higher-order lambda: the per-element closure dispatch of
    * `aggregate` is the cost the native-dot migration removed), so the
    * whole projection is ONE codegen'd map-only projection — zero
    * shuffle at any corpus size; cost O(dim · outDim) per row. The
    * fixed association makes results bit-deterministic and
    * oracle-comparable.
    *
    * @return array<double> of length outDim
    */
  def randomProjection(v: Column, outDim: Int, dim: Int): Column = {
    // native loop expression, NOT an unrolled column sum: outDim x dim
    // element_at terms generated Java past the 64 KB method limit at
    // 8 x 64, so codegen failed to compile and the projection ran
    // interpreted per row. Values are bit-identical (same sequential
    // accumulation order; VectorFunctionsSpec's hand-computed pins).
    NativeExpressions.rademacherProject(v, outDim, dim)
  }

  /** Symmetric int8 quantization scale: max(|x|) / 127 (0.0 for the
    * zero vector). Store one scale per vector alongside the quantized
    * array — 4x smaller embeddings mean 4x fewer shuffle/scan bytes for
    * ANN candidate generation at 100 TB, with exact re-ranking done on
    * the full-precision vectors for the few survivors.
    */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double")))) / lit(127.0)

  /** Quantize to int8 range with round-half-up realized as
    * `floor(x/scale + 0.5)` — floor is exactly specified on IEEE
    * doubles, so any engine reproduces the codes bit-for-bit (a
    * `round()` here would hit engine-specific half-even/half-away
    * behavior). Zero-scale (all-zero) vectors quantize to zeros.
    */
  def quantizeInt8(v: Column, scale: Column): Column =
    transform(v, x =>
      when(scale === 0.0, lit(0L))
        .otherwise(greatest(lit(-127L),
          least(lit(127L), floor(x.cast("double") / scale + lit(0.5)))))
        .cast("long"))

  /** Reconstruct approximate values from int8 codes. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)

  /** Deterministic pseudo-random hyperplane component in [-1, 1).
    * Package-visible so the oracle-SQL generator can embed the SAME
    * hyperplanes as literals and recompute buckets externally.
    */
  private[graft] def planeValue(seed: Int, bit: Int, j: Int): Double = {
    val h = NativeExpressions.mix64(
      (seed.toLong << 40) ^ (bit.toLong << 20) ^ j.toLong)
    h.toDouble / Long.MaxValue.toDouble
  }

  /** Sign-random-projection bucket id: `nBits` hyperplane signs packed
    * into a long. Hyperplanes are LITERAL arrays baked into the plan
    * (deterministic from (seed, bit, dim)), so bucketing costs nBits
    * dot products per vector — no per-row hashing. Vectors longer than
    * `maxDim` use the first `maxDim` components (dot truncates to the
    * shorter operand).
    * This is the LSH prefilter for cosine ANN: at 100 TB the bucket id
    * becomes the shuffle key and the quadratic compare happens only
    * within buckets.
    */
  def srpBucket(v: Column, nBits: Int, seed: Int = 0, maxDim: Int = 512): Column = {
    val bits = (0 until nBits).map { bit =>
      val plane = Array.tabulate(maxDim)(j => planeValue(seed, bit, j))
      val proj = dot(v, typedlit(plane.toSeq))
      when(proj >= 0, lit(1L << bit)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }
}
