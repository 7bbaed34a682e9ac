package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Leading principal component by power iteration — the embedding-
  * pipeline diagnostic/dim-reduction primitive (dominant-direction
  * drift, whitening checks, 1-D corpus ordering).
  *
  * Scale shape: the covariance matrix accumulates in ONE pass through
  * a typed Aggregator whose buffer is the dim(dim+3)/2+1 running sums
  * (count, per-dim sums, upper-triangle product sums) — map-side
  * combined, so the shuffle carries O(partitions · dim²) bytes and is
  * CORPUS-SIZE-INDEPENDENT (the same footprint argument as
  * [[KMeans]]'s (cell, dim)-keyed means). The dim×dim matrix is
  * driver-held and power iteration costs O(iters · dim²) there —
  * trivial next to one corpus scan. Projection is a map-only
  * codegen'd dot against the literal component.
  *
  * Oracle replay ([[graft.OracleGen.pcaProjectSql]], q_pca_project):
  * mean and covariance entries are rounded to `decimals` (absorbing
  * distributed-sum order, the same trade [[KMeans.assignRounded]]
  * documents), and every iterate is rounded after normalization; all
  * remaining arithmetic is ascending-index IEEE double on BOTH
  * engines (the SQL forces ordered list folds), so the chain —
  * and therefore the projection — is engine-independent.
  */
object Pca {

  final case class Model(mean: Array[Double], component: Array[Double],
                         eigenvalue: Double)

  /** round-half-away-from-zero at `decimals` — the same semantics as
    * Spark SQL's and DuckDB's `round(x, d)`.
    */
  private def roundAt(x: Double, decimals: Int): Double =
    BigDecimal(x).setScale(decimals, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** One-pass covariance sums: buffer = count +: dimSums +:
    * upperTriangleProductSums.
    */
  private final class CovAggregator(dim: Int)
      extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    private val tri = dim * (dim + 1) / 2
    override def zero: Array[Double] = new Array[Double](1 + dim + tri)
    override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] = {
      require(v.length == dim, s"expected dim $dim, got ${v.length}")
      val a = v.toArray
      b(0) += 1.0
      var i = 0
      var t = 1 + dim
      while (i < dim) {
        b(1 + i) += a(i)
        var j = i
        while (j < dim) { b(t) += a(i) * a(j); t += 1; j += 1 }
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Double]): Seq[Double] = b.toSeq
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  /** Rounded mean vector + covariance matrix in one corpus pass. */
  private def fitCov(df: DataFrame, vecCol: String, dim: Int,
                     decimals: Int): (Array[Double], Array[Array[Double]]) = {
    val (_, mean, cov) = fitCovN(df, vecCol, dim, decimals)
    (mean, cov)
  }

  private def fitCovN(df: DataFrame, vecCol: String, dim: Int,
                      decimals: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val sums: Seq[Double] = df
      .select(VectorFunctions.toDouble(col(vecCol)).as("v"))
      .as[Seq[Double]]
      .select(new CovAggregator(dim).toColumn)
      .head()
    val n = sums(0)
    require(n > 0, "empty corpus")
    val mean = Array.tabulate(dim)(i => roundAt(sums(1 + i) / n, decimals))
    val cov = Array.ofDim[Double](dim, dim)
    var t = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val cij = roundAt(sums(t) / n, decimals) - mean(i) * mean(j)
        cov(i)(j) = cij
        cov(j)(i) = cij
        t += 1
        j += 1
      }
      i += 1
    }
    (n.toLong, mean, cov)
  }

  /** `iters` rounded power steps on `cov` from the all-ones start;
    * returns (component, rounded Rayleigh eigenvalue).
    */
  private def powerIterate(cov: Array[Array[Double]], dim: Int,
                           iters: Int,
                           decimals: Int): (Array[Double], Double) = {
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { r =>
        var s = 0.0
        var c = 0
        while (c < dim) { s += cov(r)(c) * v(c); c += 1 }
        s
      }
    var x = Array.fill(dim)(1.0)
    for (_ <- 1 to iters) {
      val y = matVec(x)
      var ss = 0.0
      var k = 0
      while (k < dim) { ss += y(k) * y(k); k += 1 }
      val nrm = math.sqrt(ss)
      require(nrm > 0, "degenerate covariance: power iterate vanished")
      x = y.map(v => roundAt(v / nrm, decimals))
    }
    val cx = matVec(x)
    var num = 0.0
    var den = 0.0
    var i = 0
    while (i < dim) { num += x(i) * cx(i); den += x(i) * x(i); i += 1 }
    (x, roundAt(num / den, decimals))
  }

  /** Fit the leading component. Deterministic given the data: start
    * vector all-ones, `iters` rounded power steps, eigenvalue =
    * rounded Rayleigh quotient.
    */
  def fitLeading(df: DataFrame, vecCol: String, dim: Int, iters: Int,
                 decimals: Int = 6): Model = {
    require(dim > 0 && iters >= 1, "dim and iters must be positive")
    val (mean, cov) = fitCov(df, vecCol, dim, decimals)
    val (x, eig) = powerIterate(cov, dim, iters, decimals)
    Model(mean, x, eig)
  }

  /** Top-k components by Hotelling deflation — the dim-reduction /
    * whitening form. The covariance is fit ONCE (still the single
    * corpus pass); after each extracted component the driver deflates
    * C ← C − λ·x·xᵀ and re-iterates, so component r is the leading
    * direction of the residual. Deflation arithmetic is plain double
    * on ROUNDED (λ, x) inputs and the residual matrix is re-rounded,
    * keeping the whole k·iters chain engine-replayable
    * (q_pca_top2's oracle).
    */
  def fitTopK(df: DataFrame, vecCol: String, dim: Int, k: Int,
              iters: Int, decimals: Int = 6): Seq[Model] = {
    require(k >= 1 && k <= dim, s"k must be in [1, $dim]")
    require(iters >= 1, "iters must be positive")
    val (mean, cov) = fitCov(df, vecCol, dim, decimals)
    val out = Seq.newBuilder[Model]
    for (_ <- 1 to k) {
      val (x, eig) = powerIterate(cov, dim, iters, decimals)
      out += Model(mean, x, eig)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          cov(i)(j) = roundAt(cov(i)(j) - eig * x(i) * x(j), decimals)
          j += 1
        }
        i += 1
      }
    }
    out.result()
  }

  /** One-row embedding-health diagnostic: total variance (trace of
    * the covariance, ascending-fold of the rounded diagonal), the
    * dominant eigenvalue, and the dominant ratio λ₁·dim/trace — 1.0
    * for a perfectly isotropic corpus, dim for rank-1 collapse. The
    * number a pipeline checks on every new embedding drop before
    * trusting cosine geometry (anisotropy inflates similarity scores).
    * Same single corpus pass as [[fitLeading]].
    */
  def diagnostics(df: DataFrame, vecCol: String, dim: Int, iters: Int,
                  decimals: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (n, _, cov) = fitCovN(df, vecCol, dim, decimals)
    val (_, eig) = powerIterate(cov, dim, iters, decimals)
    var tr = 0.0
    var i = 0
    while (i < dim) { tr += cov(i)(i); i += 1 }
    val trace = roundAt(tr, decimals)
    require(trace > 0, "zero-variance corpus")
    Seq((n, trace, eig, roundAt(eig * dim / trace, decimals)))
      .toDF("n_vectors", "trace", "lambda1", "dominant_ratio")
  }

  /** Map-only projection onto the top-k components: (id, pc1..pck). */
  def projectTopK(df: DataFrame, idCol: String, vecCol: String,
                  dim: Int, k: Int, iters: Int,
                  decimals: Int = 6): DataFrame = {
    val models = fitTopK(df, vecCol, dim, k, iters, decimals)
    val meanLit = typedlit(models.head.mean.toSeq)
    val centered = zip_with(VectorFunctions.toDouble(col(vecCol)), meanLit,
      (a, b) => a - b)
    df.select(col(idCol) +: models.zipWithIndex.map { case (m, i) =>
      round(VectorFunctions.dot(centered, typedlit(m.component.toSeq)),
        decimals).as(s"pc${i + 1}")
    }: _*)
  }

  /** Map-only projection of every vector onto the fitted component:
    * (id, pc1) with pc1 = round(Σ_i (v_i - mean_i) · x_i, decimals),
    * folded in ascending index order (zip_with difference + the native
    * ascending dot), matching the oracle's ordered list fold exactly.
    */
  def projectLeading(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, iters: Int,
                     decimals: Int = 6): DataFrame = {
    val m = fitLeading(df, vecCol, dim, iters, decimals)
    val meanLit = typedlit(m.mean.toSeq)
    val compLit = typedlit(m.component.toSeq)
    df.select(col(idCol),
      round(VectorFunctions.dot(
        zip_with(VectorFunctions.toDouble(col(vecCol)), meanLit,
          (a, b) => a - b),
        compLit), decimals).as("pc1"))
  }
}
