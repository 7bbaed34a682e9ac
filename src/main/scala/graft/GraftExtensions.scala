package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.NativeExpressions

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql` users get them too
  * (`graft_dot`, `graft_minhash`, `graft_simhash`).
  *
  * Usage:
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * }}}
  * or `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach(ext.injectFunction)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinPlan.AsOfJoinStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  /** (identifier, info, builder) triples — the same shape
    * `injectFunction` takes, reusable against a live session.
    */
  val definitions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - double dot product of two numeric arrays"),
      (children: Seq[Expression]) =>
        NativeExpressions.ArrayDotProduct(children(0), children(1))),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "graft_minhash(tokenHashes, k, shingleSize) - MinHash signature"),
      (children: Seq[Expression]) => {
        def intArg(e: Expression, name: String): Int = {
          if (!e.foldable) throw new IllegalArgumentException(
            s"graft_minhash: $name must be a literal integer")
          e.eval() match {
            case i: Int => i
            case l: Long => l.toInt
            case s: Short => s.toInt
            case other => throw new IllegalArgumentException(
              s"graft_minhash: $name must be a literal integer, got $other")
          }
        }
        NativeExpressions.MinHashSignature(children(0),
          intArg(children(1), "numHashes"), intArg(children(2), "shingleSize"))
      }),
    (FunctionIdentifier("graft_simhash"),
      info("graft_simhash", "graft_simhash(tokenHashes) - 64-bit SimHash"),
      (children: Seq[Expression]) =>
        NativeExpressions.SimHash64(children(0))),
    (FunctionIdentifier("graft_srp_buckets"),
      info("graft_srp_buckets",
        "graft_srp_buckets(vec, bands, bitsPerBand, maxDim) - SRP-LSH bucket id per band"),
      (children: Seq[Expression]) =>
        NativeExpressions.SrpBucketArray(children(0),
          literalInt(children(1), "bands", "graft_srp_buckets"),
          literalInt(children(2), "bitsPerBand", "graft_srp_buckets"),
          literalInt(children(3), "maxDim", "graft_srp_buckets"))),
    // graft_redact is a composite built directly as a catalyst tree:
    // registry builders must return analyzable expressions, and the
    // Spark 4 `functions._` combinators produce ColumnNodes that only
    // the DataFrame layer resolves (returning those here leaves an
    // Unevaluable node in the plan). The pattern constants are shared
    // with the Column API (TextFunctions), so the two surfaces cannot
    // drift.
    (FunctionIdentifier("graft_redact"),
      info("graft_redact",
        "graft_redact(text) - mask emails then digit runs (PII scrub)"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Literal, RegExpReplace}
        import graft.functions.{TextFunctions => TF}
        RegExpReplace(
          RegExpReplace(children(0),
            Literal(TF.emailPattern), Literal(TF.emailReplacement)),
          Literal(TF.digitPattern), Literal(TF.digitReplacement))
      }))

  private def literalInt(e: Expression, name: String, fn: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$fn: $name must be a literal integer")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case s: Short => s.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be a literal integer, got $other")
    }
  }

  /** Register on an already-created session (e.g. a shared test
    * session, or a notebook where the builder config is out of reach).
    */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (id, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }
}
