package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector/hash hot paths.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `transform`)
  * are evaluated with one closure dispatch per element — fine for
  * per-row work, ruinous when a query evaluates millions of
  * (vector-pair x dimension) steps. These expressions do the same math
  * in tight JVM loops; the dot product also generates code so it stays
  * inside whole-stage codegen.
  *
  * Numeric parity note: [[ArrayDotProduct]] accumulates left-to-right
  * in double precision — bit-identical to both the higher-order
  * `aggregate` fold it replaces and the DuckDB oracle's `list_sum`,
  * so oracle hash-comparison is unaffected.
  */
object NativeExpressions {

  private def elemKind(dt: DataType): Int = dt match {
    case ArrayType(FloatType, _) => 0
    case ArrayType(DoubleType, _) => 1
    case other => throw new IllegalArgumentException(
      s"expected array<float|double>, got $other")
  }

  /** Sequential-order double dot product of two numeric arrays. */
  case class ArrayDotProduct(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    private lazy val lk = elemKind(left.dataType)
    private lazy val rk = elemKind(right.dataType)

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0
      var i = 0
      while (i < n) {
        val xv = if (lk == 0) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rk == 0) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val s = ctx.freshName("s")
        val getX = if (lk == 0) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getY = if (rk == 0) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $s += $getX * $getY; }
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** xxhash64-style long mixer (xorshift-multiply avalanche; public
    * splitmix64 finalizer constants). Deterministic across JVMs.
    */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** MinHash signature computed from an array of TOKEN hashes: shingle
    * hashes are derived by chain-mixing `shingleSize` consecutive token
    * hashes (no string shingle is ever built — constructing
    * "tok1 tok2 tok3" strings per position costs more than the whole
    * signature), then for seed i in 0..k-1 the minimum of
    * `mix64(shingle + GOLDEN*i)` is maintained in one pass.
    */
  /** Shared loop body for eval and generated code (called statically
    * from codegen via the object's static forwarder).
    */
  def minhashEval(arr: ArrayData, numHashes: Int, shingleSize: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val nShingles = math.max(n - shingleSize + 1, if (n > 0) 1 else 0)
    var i = 0
    while (i < nShingles) {
      // chain-mix the tokens of the shingle starting at i
      var s = 0x2545F4914F6CDD1DL
      var j = 0
      while (j < shingleSize && i + j < n) {
        s = mix64(s ^ arr.getLong(i + j))
        j += 1
      }
      var k = 0
      while (k < numHashes) {
        val h = mix64(s + 0x9E3779B97F4A7C15L * k)
        if (h < mins(k)) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  case class MinHashSignature(child: Expression, numHashes: Int,
                              shingleSize: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      minhashEval(input.asInstanceOf[ArrayData], numHashes, shingleSize)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.minhashEval(" +
          s"$c, $numHashes, $shingleSize);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** LSH band bucket ids from an array of TOKEN hashes in one pass:
    * the minhash signature ([[minhashEval]]) split into `bands` bands
    * of `numHashes / bands` rows, each band chain-mixed into one
    * 64-bit bucket id — the signature array is never materialized into
    * the row and no per-band strings are built. Equality semantics
    * match the string-join banding it replaces: two documents share a
    * band bucket iff that band's signature rows are all equal
    * (cross-band/birthday collisions at 2^-64 are the same class the
    * string hash had).
    */
  def minhashBandsEval(arr: ArrayData, numHashes: Int, shingleSize: Int,
                       bands: Int): ArrayData = {
    val sig = minhashEval(arr, numHashes, shingleSize)
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      // seed folds the band index so identical row values in different
      // bands cannot alias each other's buckets
      var h = mix64(0x9E3779B97F4A7C15L + b)
      var j = 0
      while (j < rows) {
        h = mix64(h ^ sig.getLong(b * rows + j))
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  case class MinHashBandHashes(child: Expression, numHashes: Int,
                               shingleSize: Int, bands: Int)
      extends UnaryExpression {
    require(bands >= 1 && numHashes % bands == 0,
      s"numHashes ($numHashes) must divide into bands ($bands)")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      minhashBandsEval(input.asInstanceOf[ArrayData], numHashes,
        shingleSize, bands)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.minhashBandsEval(" +
          s"$c, $numHashes, $shingleSize, $bands);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Rolling fixed-width gram hashes from an array of token hashes in
    * one pass: out(i) = chain-mix of tokens i..i+width-1, for i in
    * [0, n-width]; empty below `width` tokens. Equal windows hash equal
    * by construction; distinct windows collide at the usual 2^-64.
    * Replaces the `transform(sequence, i -> xxhash64(slice(...)))`
    * formulation, which pays an interpreted higher-order dispatch plus
    * a fresh 8-element array copy per gram — the per-element-closure
    * cost class every other text primitive here already eliminated.
    */
  def gramHashesEval(arr: ArrayData, width: Int): ArrayData = {
    val n = arr.numElements()
    val m = n - width + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      var h = 0x2545F4914F6CDD1DL
      var j = 0
      while (j < width) {
        h = mix64(h ^ arr.getLong(i + j))
        j += 1
      }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  case class GramHashes(child: Expression, width: Int)
      extends UnaryExpression {
    require(width >= 1, s"width must be positive, got $width")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      gramHashesEval(input.asInstanceOf[ArrayData], width)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.gramHashesEval(" +
          s"$c, $width);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Quantile-bucket assignment by binary search over a referenced
    * sorted boundary array: returns the count of boundaries <= v, i.e.
    * the 0-based bucket index. Row-local — the scale-correct
    * replacement for a global ntile() window (which would move the
    * whole table through one partition): boundaries come from a
    * one-pass approxQuantile sketch, assignment is O(log nTiles) per
    * row with the boundary array shared as a codegen reference.
    */
  def searchBucketEval(v: Double, bounds: Array[Double]): Long = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bounds(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  case class SearchBucket(child: Expression, boundaries: Array[Double])
      extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any =
      searchBucketEval(input.asInstanceOf[Double], boundaries)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bRef = ctx.addReferenceObj("bucketBounds", boundaries, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.searchBucketEval(" +
          s"$c, $bRef);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 64-bit SimHash from an array of token hashes: per bit, sum of
    * +/-1 over tokens; sign becomes the fingerprint bit.
    */
  /** Shared loop body for eval and generated code. */
  def simhashEval(arr: ArrayData): Long = {
    val n = arr.numElements()
    val sums = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  case class SimHash64(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any =
      simhashEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.simhashEval($c);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Shannon entropy (base 2) of a string's character distribution —
    * the classic gibberish / low-diversity quality signal. Counted over
    * Unicode CODE POINTS (what an external engine's character split
    * yields), not UTF-16 units; empty string = 0.0. One pass, ASCII
    * fast path through a 128-slot array, code points above ASCII in an
    * overflow map. The per-character probability sum accumulates in
    * ascending character order, so the result is deterministic across
    * partitionings.
    */
  def charEntropyEval(s: org.apache.spark.unsafe.types.UTF8String): Double = {
    val str = s.toString
    val ascii = new Array[Int](128)
    var other: scala.collection.mutable.LongMap[Int] = null
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = scala.collection.mutable.LongMap.empty[Int]
        other.update(cp.toLong, other.getOrElse(cp.toLong, 0) + 1)
      }
      n += 1
      i += Character.charCount(cp)
    }
    if (n == 0L) return 0.0
    val ln2 = math.log(2.0)
    var h = 0.0
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) {
        val p = ascii(c).toDouble / n
        h -= p * (math.log(p) / ln2)
      }
      c += 1
    }
    if (other != null) other.toSeq.sortBy(_._1).foreach { case (_, cnt) =>
      val p = cnt.toDouble / n
      h -= p * (math.log(p) / ln2)
    }
    h
  }

  /** One-pass text canonicalization for dedup/fingerprint pre-keys:
    * Unicode NFC, lowercase, SQL-whitespace runs ([ \t\n\x0B\f\r])
    * collapsed to one space, leading/trailing whitespace stripped. The
    * whitespace class is pinned to the RE2/POSIX `\s` set (NOT
    * `Character.isWhitespace`) so the result is reproducible by any
    * engine's `regexp_replace(lower(nfc(s)), '[ \t\n\x0B\f\r]+', ' ')`
    * — cross-engine identity is the point of a canonical form.
    */
  def normTextEval(s: org.apache.spark.unsafe.types.UTF8String): org.apache.spark.unsafe.types.UTF8String = {
    val raw = s.toString
    val nfc =
      if (java.text.Normalizer.isNormalized(raw, java.text.Normalizer.Form.NFC)) raw
      else java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
    val lower = nfc.toLowerCase(java.util.Locale.ROOT)
    val n = lower.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false
    var started = false
    while (i < n) {
      val ch = lower.charAt(i)
      val isWs = ch == ' ' || ch == '\t' || ch == '\n' || ch == 11.toChar ||
        ch == '\f' || ch == '\r'
      if (isWs) { pendingSpace = true }
      else {
        if (pendingSpace && started) sb.append(' ')
        sb.append(ch)
        started = true
        pendingSpace = false
      }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }

  case class NormalizeText(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType

    override def nullSafeEval(input: Any): Any =
      normTextEval(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.normTextEval($c);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class CharEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(input: Any): Any =
      charEntropyEval(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.charEntropyEval($c);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** All SRP band buckets of a vector in one pass (shared loop body for
    * eval and generated code). Bit-identical to projecting against the
    * per-plane literals: per-element double conversion, left-to-right
    * accumulation, `>= 0` sign test.
    */
  def srpBucketsEval(arr: ArrayData, planes: Array[Double], bands: Int,
                     bitsPerBand: Int, maxDim: Int, isFloat: Boolean): ArrayData = {
    val n = math.min(arr.numElements(), maxDim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var bit = 0
      while (bit < bitsPerBand) {
        val off = (b * bitsPerBand + bit) * maxDim
        var s = 0.0
        var i = 0
        while (i < n) {
          val xv = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          s += xv * planes(off + i)
          i += 1
        }
        if (s >= 0) bucket |= (1L << bit)
        bit += 1
      }
      out(b) = bucket
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Loop body of [[RademacherProject]], shared by eval and generated
    * code. Accumulation order is d = 0..dim-1 sequential — exactly the
    * left fold the unrolled `reduce(_ + _)` column form applied, so
    * doubles come out bit-identical. Returns null (whole value) for a
    * vector shorter than `dim` or carrying a null element — the corner
    * the old form surfaced as per-element nulls; no caller feeds
    * either shape.
    */
  def rademacherProjectEval(arr: ArrayData, signs: Array[Double],
                            outDim: Int, dim: Int, isFloat: Boolean): Any = {
    if (arr.numElements() < dim) return null
    val out = new Array[Any](outDim)
    val invSqrtK = 1.0 / math.sqrt(outDim.toDouble)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      val base = j * dim
      var d = 0
      while (d < dim) {
        if (arr.isNullAt(d)) return null
        val x = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        acc += signs(base + d) * x
        d += 1
      }
      out(j) = acc * invSqrtK
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Johnson–Lindenstrauss Rademacher projection as ONE native
    * expression: the ±1 matrix lives in the expression object and
    * reaches generated code as a reference. The previous column form
    * unrolled outDim x dim element_at terms into the plan — at 8 x 64
    * the generated Java blew the 64 KB method limit, codegen FAILED to
    * compile, and the projection ran interpreted on every row (the
    * bench log's one recurring codegen fallback). Values bit-identical
    * ([[rademacherProjectEval]]'s order note; VectorFunctionsSpec's
    * hand-computed pins cover it).
    */
  case class RademacherProject(child: Expression, outDim: Int, dim: Int)
      extends UnaryExpression {
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    private lazy val isFloat = elemKind(child.dataType) == 0

    @transient private lazy val signs: Array[Double] = {
      val arr = new Array[Double](outDim * dim)
      var idx = 0
      for (j <- 0 until outDim; d <- 0 until dim) {
        arr(idx) = VectorFunctions.rademacherSign(j, d)
        idx += 1
      }
      arr
    }

    override def nullSafeEval(input: Any): Any =
      rademacherProjectEval(input.asInstanceOf[ArrayData], signs,
        outDim, dim, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("rademacherSigns", signs, "double[]")
      val r = ctx.freshName("radProj")
      nullSafeCodeGen(ctx, ev, c => s"""
        Object $r = graft.functions.NativeExpressions.rademacherProjectEval(
          $c, $ref, $outDim, $dim, $isFloat);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $r; }
      """)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** `bands` SRP bucket ids (band index = array position, band = the
    * hyperplane seed) computed in one expression. The hyperplane matrix
    * lives in the expression object and reaches generated code as a
    * REFERENCE — baking bands x bits literal arrays into the plan (the
    * previous form) made multi-band plans megabytes large and dominated
    * query time with codegen compilation at small scale. Values are
    * identical to [[VectorFunctions.srpBucket]] applied per band.
    */
  case class SrpBucketArray(child: Expression, bands: Int, bitsPerBand: Int,
                            maxDim: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val isFloat = elemKind(child.dataType) == 0

    @transient private lazy val planes: Array[Double] = {
      val arr = new Array[Double](bands * bitsPerBand * maxDim)
      var idx = 0
      for (band <- 0 until bands; bit <- 0 until bitsPerBand; j <- 0 until maxDim) {
        arr(idx) = VectorFunctions.planeValue(band, bit, j)
        idx += 1
      }
      arr
    }

    override def nullSafeEval(input: Any): Any =
      srpBucketsEval(input.asInstanceOf[ArrayData], planes, bands,
        bitsPerBand, maxDim, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("srpPlanes", planes, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.srpBucketsEval(" +
          s"$c, $ref, $bands, $bitsPerBand, $maxDim, $isFloat);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Repeated-ngram fraction of a token array: 1 - distinct/total over
    * the n-grams (space-joined, exact string distinct — identical to
    * counting distinct over `ngramsOf` output, including dropping any
    * window with a null token). 0.0 when no n-gram exists. Shared loop
    * body for eval and generated code; replaces a 2(n-1)-deep
    * `zip_with`/`array_distinct` chain that paid a closure dispatch
    * per token.
    */
  def ngramRepRatioEval(arr: ArrayData, n: Int): Double = {
    val toks = decodeTokens(arr)
    val total = toks.length - n + 1
    if (total <= 0) return 0.0
    val seen = new java.util.HashSet[String](total * 2)
    var kept = 0
    var i = 0
    while (i < total) {
      val g = gramAt(toks, i, n)
      if (g != null) {
        kept += 1
        seen.add(g)
      }
      i += 1
    }
    if (kept == 0) 0.0 else 1.0 - seen.size.toDouble / kept
  }

  /** Decode the token array once — interior tokens would otherwise be
    * UTF8->String decoded up to n times, once per window they appear
    * in.
    */
  private def decodeTokens(arr: ArrayData): Array[String] = {
    val n = arr.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      out(i) = if (t == null) null else t.toString
      i += 1
    }
    out
  }

  /** The space-joined window starting at i, or null when any token in
    * it is null — the same contract as the zip_with/concat/filter
    * construction this file's ngram expressions replaced (a null token
    * nulls the gram, and null grams are dropped). Shared by
    * [[ngramsEval]] and [[ngramRepRatioEval]] so their outputs cannot
    * drift.
    */
  private def gramAt(toks: Array[String], i: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j < n) {
      val t = toks(i + j)
      if (t == null) return null
      if (j > 0) sb.append(' ')
      sb.append(t)
      j += 1
    }
    sb.toString
  }

  /** Space-joined token n-grams in one pass (shared loop body for eval
    * and generated code). Bit-identical output to the shifted-zip
    * Column construction it replaces: one string per window whose
    * tokens are all non-null, empty array when the doc is shorter than
    * n tokens.
    */
  def ngramsEval(arr: ArrayData, n: Int): ArrayData = {
    val toks = decodeTokens(arr)
    val total = toks.length - n + 1
    if (total <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[Any](total)
    var i = 0
    while (i < total) {
      val g = gramAt(toks, i, n)
      if (g != null)
        out.add(org.apache.spark.unsafe.types.UTF8String.fromString(g))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class NgramArray(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"ngrams needs n >= 1, got $n")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      ngramsEval(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.ngramsEval($c, $n);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Greedy BPE merge application over a word-token array: each word
    * splits into single UTF-16 characters (the `learnMerges`
    * convention) and the merge table applies in rank order, each rank
    * greedily left-to-right — exactly the training loop's update rule
    * ([[graft.operators.BpeLearn.learnMerges]]), so encoding a corpus
    * with its own learned table reproduces the trainer's final symbol
    * state. O(nMerges x wordLen) per word: production tokenizers use a
    * pair-priority heap, but rank-order scanning is exact and table
    * sizes here are tens of merges. Greedy left-to-right equals
    * sequential non-overlapping `replace` (resume after the merged
    * pair), which is what makes the operation replayable as a
    * separator-joined replace() chain in ANSI SQL (q_bpe_encode's
    * oracle). `merges` is rank-order interleaved [l0, r0, l1, r1, ...]
    * so the codegen reference stays a flat String[].
    */
  def bpeEncodeEval(arr: ArrayData, merges: Array[String]): ArrayData = {
    val nWords = arr.numElements()
    val out = new java.util.ArrayList[Any](nWords * 2)
    var w = 0
    while (w < nWords) {
      if (!arr.isNullAt(w)) {
        val word = arr.getUTF8String(w).toString
        if (word.nonEmpty) {
          val syms = new Array[String](word.length)
          var i = 0
          while (i < word.length) {
            syms(i) = String.valueOf(word.charAt(i))
            i += 1
          }
          var n = word.length
          var m = 0
          while (m < merges.length) {
            val l = merges(m)
            val r = merges(m + 1)
            var src = 0
            var dst = 0
            while (src < n) {
              if (src < n - 1 && syms(src) == l && syms(src + 1) == r) {
                syms(dst) = syms(src) + syms(src + 1)
                src += 2
              } else {
                syms(dst) = syms(src)
                src += 1
              }
              dst += 1
            }
            n = dst
            m += 2
          }
          var t = 0
          while (t < n) {
            out.add(org.apache.spark.unsafe.types.UTF8String
              .fromString(syms(t)))
            t += 1
          }
        }
      }
      w += 1
    }
    new GenericArrayData(out.toArray)
  }

  case class BpeEncode(child: Expression, merges: Array[String])
      extends UnaryExpression {
    require(merges.length % 2 == 0,
      s"merges must interleave [l, r] pairs, got ${merges.length} entries")
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)

    override def nullSafeEval(input: Any): Any =
      bpeEncodeEval(input.asInstanceOf[ArrayData], merges)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBpeMerges", merges,
        "java.lang.String[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.bpeEncodeEval($c, $ref);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class NgramRepetitionRatio(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, s"ngram repetition needs n >= 1, got $n")
    override def dataType: DataType = DoubleType

    override def nullSafeEval(input: Any): Any =
      ngramRepRatioEval(input.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.ngramRepRatioEval($c, $n);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Membership probe against a pre-built
    * `org.apache.spark.util.sketch.BloomFilter` (the public sketch the
    * engine's `df.stat.bloomFilter` produces). Probes the raw UTF-8
    * bytes — byte-identical hashing to the string insertion path
    * (`bloom_filter_agg`'s StringType updater inserts
    * `UTF8String.getBytes` via `putBinary`), with no per-row String
    * allocation. The filter is held DIRECTLY (BloomFilterImpl is
    * Serializable with content-based equals), so structurally equal
    * probes canonicalize together for subexpression elimination and
    * the plan carries exactly one copy of the payload.
    */
  def bloomMightContain(bf: org.apache.spark.util.sketch.BloomFilter,
                        s: org.apache.spark.unsafe.types.UTF8String): Boolean =
    bf.mightContainBinary(s.getBytes)

  case class BloomMightContain(child: Expression,
                               filter: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType

    override def nullSafeEval(input: Any): Any =
      bloomMightContain(filter,
        input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBloom", filter,
        "org.apache.spark.util.sketch.BloomFilter")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.bloomMightContain($ref, $c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** [[BloomMightContain]] for a LongType probe — pairs with the
    * integral insertion path (`bloom_filter_agg`'s LongType updater
    * calls `putLong`). Probing a fixed-width key skips even the byte
    * materialization of the string form.
    */
  case class BloomMightContainLong(child: Expression,
                                   filter: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = BooleanType

    override def nullSafeEval(input: Any): Any =
      filter.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftBloom", filter,
        "org.apache.spark.util.sketch.BloomFilter")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $ref.mightContainLong($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Chained-xxhash64 left fold over a token array (shared loop body
    * for eval and generated code). Bit-identical to
    * `aggregate(toks, 0L, (acc, t) => xxhash64(acc, t))`: each step
    * re-seeds at 42 (the engine's fixed xxhash64 seed), folds the
    * accumulator as a long, then the token bytes — a null token leaves
    * that step's token contribution out, exactly as the variadic
    * xxhash64 skips null children.
    */
  def rollingFpEval(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      var h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(acc, LongType, 42L)
      if (t != null)
        h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(t, StringType, h)
      acc = h
      i += 1
    }
    acc
  }

  case class RollingXxHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(input: Any): Any =
      rollingFpEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.rollingFpEval($c);")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** One-pass per-document token statistics (shared loop body for eval
    * and generated code). Field semantics are bit-compatible with the
    * Column constructions they replace:
    *
    *  - `token_count` = `size(toks)` (null tokens counted),
    *  - `type_count`  = `size(array_distinct(toks))` (null is one
    *    distinct value),
    *  - `len_sum`     = `aggregate(toks, 0L, acc + length(t))` — null
    *    as soon as ANY token is null (null + x = null poisons the
    *    fold), else the sum of `length` (= numChars),
    *  - `stop_count`  = `size(filter(toks, t => array_contains(stop, t)))`
    *    — null tokens never match (`array_contains(_, null)` is null,
    *    which `filter` drops).
    */
  def tokenStatsEval(arr: ArrayData,
                     stop: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String],
                     needTypes: Boolean)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    // the distinct-token set is the expensive part (hash + node alloc
    // per token) — skip it entirely for the many derivations that never
    // read type_count (stopword ratio, mean length, quality, langid)
    val seen = if (needTypes)
      new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](n * 2)
    else null
    var sawNull = false
    var lenSum = 0L
    var stopCount = 0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) sawNull = true
      else {
        if (seen != null) seen.add(t)
        lenSum += t.numChars()
        if (stop.contains(t)) stopCount += 1
      }
      i += 1
    }
    val typeCount =
      if (seen == null) -1 else seen.size + (if (sawNull) 1 else 0)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, typeCount, if (sawNull) null else lenSum, stopCount))
  }

  /** Per-document token stats struct computed in ONE tight loop —
    * replaces the interpreted `filter`/`aggregate` higher-order lambdas
    * (one closure dispatch per token) that previously backed
    * stopword-ratio and mean-token-length. Reference the same instance
    * several times in a projection and whole-stage codegen's
    * subexpression elimination evaluates the loop once per row.
    *
    * `needTypes = false` skips the distinct-token set build and emits
    * `type_count = -1` — for derivations that never read it (langid
    * instantiates one TokenStats per language profile, so the skip is
    * per-profile work saved on every row).
    */
  case class TokenStats(child: Expression, stopwords: Seq[String],
                        needTypes: Boolean = true)
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("token_count", IntegerType, nullable = false),
      StructField("type_count", IntegerType, nullable = false),
      StructField("len_sum", LongType, nullable = true),
      StructField("stop_count", IntegerType, nullable = false)))

    @transient private lazy val stopSet = {
      val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](
        stopwords.size * 2)
      stopwords.foreach { w =>
        s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w))
      }
      s
    }

    override def nullSafeEval(input: Any): Any =
      tokenStatsEval(input.asInstanceOf[ArrayData], stopSet, needTypes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftStopSet", stopSet, "java.util.HashSet")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.tokenStatsEval(" +
          s"$c, $ref, $needTypes);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Shared loop body for [[GramHitCount]]: the number of DISTINCT
    * grams in `arr` whose `xxhash64` (Spark's own seed-42 function, via
    * XxHash64Function so the identity is the engine's, not a
    * reimplementation) appears in the sorted `table`. Null grams never
    * match (`xxhash64(null)` would be the seed itself — a phantom
    * cross-doc collision). Distinctness via a local sort of the hit
    * hashes only — hits are the rare case for a contamination probe, so
    * the common path allocates nothing.
    */
  def gramHitCountEval(arr: ArrayData, table: Array[Long]): Int = {
    val n = arr.numElements()
    var hits: Array[Long] = null
    var nh = 0
    var i = 0
    while (i < n) {
      val g = arr.getUTF8String(i)
      if (g != null) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(g, StringType, 42L)
        if (java.util.Arrays.binarySearch(table, h) >= 0) {
          if (hits == null) hits = new Array[Long](8)
          else if (nh == hits.length)
            hits = java.util.Arrays.copyOf(hits, nh * 2)
          hits(nh) = h
          nh += 1
        }
      }
      i += 1
    }
    if (nh == 0) 0
    else {
      java.util.Arrays.sort(hits, 0, nh)
      var c = 1
      var j = 1
      while (j < nh) { if (hits(j) != hits(j - 1)) c += 1; j += 1 }
      c
    }
  }

  /** Distinct-gram hit count against a broadcast sorted hash table —
    * the row-local exact probe of the streaming contamination tier
    * ([[graft.streaming.StreamingContamination]]): per document,
    * O(grams * log |table|) with no join, no shuffle, no state.
    */
  case class GramHitCount(child: Expression, table: Array[Long])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType

    override def nullSafeEval(input: Any): Any =
      gramHitCountEval(input.asInstanceOf[ArrayData], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftGramTable", table, "long[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.gramHitCountEval($c, $ref);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** [[gramHitCountEval]]'s Bloom form: the same distinct-gram count,
    * membership answered by the filter — an UPPER BOUND on the exact
    * count (no false negatives; ~fpp false positives).
    */
  def gramBloomHitCountEval(
      arr: ArrayData,
      bf: org.apache.spark.util.sketch.BloomFilter): Int = {
    val n = arr.numElements()
    var hits: Array[Long] = null
    var nh = 0
    var i = 0
    while (i < n) {
      val g = arr.getUTF8String(i)
      if (g != null) {
        val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(g, StringType, 42L)
        if (bf.mightContainLong(h)) {
          if (hits == null) hits = new Array[Long](8)
          else if (nh == hits.length)
            hits = java.util.Arrays.copyOf(hits, nh * 2)
          hits(nh) = h
          nh += 1
        }
      }
      i += 1
    }
    if (nh == 0) 0
    else {
      java.util.Arrays.sort(hits, 0, nh)
      var c = 1
      var j = 1
      while (j < nh) { if (hits(j) != hits(j - 1)) c += 1; j += 1 }
      c
    }
  }

  /** [[GramHitCount]] against a Bloom filter instead of the exact
    * table — the streaming contamination tier for eval corpora past
    * the sorted-array guard (the filter is bits-per-gram instead of 8
    * bytes). Flags are a SUPERSET of the exact tier's (no false
    * negatives), the right polarity for an at-the-door probe whose
    * positives get exact batch confirmation downstream.
    */
  case class GramBloomHitCount(child: Expression,
                               bf: org.apache.spark.util.sketch.BloomFilter)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType

    override def nullSafeEval(input: Any): Any =
      gramBloomHitCountEval(input.asInstanceOf[ArrayData], bf)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftGramBloom", bf,
        "org.apache.spark.util.sketch.BloomFilter")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.gramBloomHitCountEval($c, $ref);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // MD5 instances are stateful and not thread-safe; one per executor
  // thread, reset()-by-digest() between tokens
  @transient private lazy val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Shared loop body for [[DsirScore]] eval and generated code: sum of
    * `weights(first md5 byte of token)` over the token array, in array
    * order. Bit-compatible with the Column construction it replaces
    * (`aggregate(toks, 0.0, acc + element_at(map, substring(md5(t),1,2)))`):
    * the first two hex chars of an md5 ARE its first byte, the literal
    * map is total over all 256 buckets so no probe can miss, doubles
    * accumulate left-to-right, and a null token nulls the whole fold
    * (null + x = null poisons `aggregate`) — hence the boxed return.
    */
  def dsirScoreEval(arr: ArrayData, w: Array[Double]): java.lang.Double = {
    val md = md5Local.get()
    val n = arr.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t == null) return null
      sum += w(md.digest(t.getBytes)(0) & 0xff)
      i += 1
    }
    java.lang.Double.valueOf(sum)
  }

  /** DSIR hashed-bucket log-ratio score of a token array in ONE tight
    * loop — replaces the interpreted higher-order `aggregate` whose
    * per-token body was md5 → hex string → substring → literal-map
    * probe (three allocations per token). `weights(b)` = the smoothed
    * target/raw log-ratio of md5 bucket b (see
    * [[graft.operators.CorpusScoring.dsirWeights]]).
    */
  case class DsirScore(child: Expression, weights: Array[Double])
      extends UnaryExpression {
    require(weights.length == 256, s"need 256 bucket weights, got ${weights.length}")
    override def dataType: DataType = DoubleType

    // A null ELEMENT nulls the fold even when the array itself is
    // non-null, so this expression is nullable regardless of the
    // child's nullability. Without this override, a plan that refines
    // the child non-nullable (e.g. behind a pushed IsNotNull filter)
    // makes whole-stage codegen skip the isNull variable declaration
    // the generated body assigns — Janino then rejects the whole stage
    // ("filter_isNull_N is not an rvalue") and the stage silently runs
    // interpreted.
    override def nullable: Boolean = true

    override def nullSafeEval(input: Any): Any =
      dsirScoreEval(input.asInstanceOf[ArrayData], weights)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("graftDsirWeights", weights, "double[]")
      val tmp = ctx.freshName("dsirScore")
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Double $tmp = graft.functions.NativeExpressions.dsirScoreEval($c, $ref);
        if ($tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $tmp.doubleValue(); }""")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Shared loop body for [[NearestCells]] eval and generated code:
    * decode the vector once, one fused dot-product loop per centroid
    * over the flat matrix, then selection-pick the `take` best by
    * (neg-cosine asc, cell ordinal asc).
    *
    * Bit-identical to the Column construction it replaces
    * (`array_sort` over nCells `struct(-coalesce(cosine, -2.0), cid)`
    * entries): dots sum in index order, cosine = dot / (norm * cn)
    * only when the product is nonzero (else the 2.0 sorts-last
    * sentinel), ties break to the lower ordinal, and NaN keys order
    * last exactly as Spark's nan-safe double ordering does. The
    * struct-array form additionally broke down at large nCells: 250
    * cosine subtrees blow past codegen limits, so the hot assignment
    * ran interpreted and allocated a struct array per row just to
    * read back its ids.
    */
  def nearestCellsEval(arr: ArrayData, cents: Array[Double],
                       cellNorms: Array[Double], dim: Int, take: Int,
                       isFloat: Boolean): ArrayData = {
    val nCells = cellNorms.length
    val len = arr.numElements()
    val v = new Array[Double](len)
    var i = 0
    while (i < len) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < len) { ss += v(i) * v(i); i += 1 }
    val vNorm = math.sqrt(ss)
    val keys = new Array[Double](nCells)
    val m = math.min(len, dim)
    var c = 0
    while (c < nCells) {
      val d = vNorm * cellNorms(c)
      var s = 0.0
      val off = c * dim
      var j = 0
      while (j < m) { s += v(j) * cents(off + j); j += 1 }
      keys(c) = if (d != 0.0) -(s / d) else 2.0
      c += 1
    }
    val k = math.min(take, nCells)
    val out = new Array[Long](k)
    val used = new Array[Boolean](nCells)
    var t = 0
    while (t < k) {
      var best = -1
      var c2 = 0
      while (c2 < nCells) {
        if (!used(c2) &&
            (best < 0 || java.lang.Double.compare(keys(c2), keys(best)) < 0))
          best = c2
        c2 += 1
      }
      used(best) = true
      out(t) = best.toLong
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Primitive binary heap over (key: Double, id: Int) entries ordered
    * by (Double.compare, Integer.compare) — allocation-free inner loops
    * for the graph-descent search. `max = true` keeps the WORST entry
    * on top (the bounded-result-set form).
    */
  private final class NodeHeap(cap: Int, max: Boolean) {
    private val ks = new Array[Double](cap)
    private val ids = new Array[Int](cap)
    var size = 0
    private def before(k1: Double, i1: Int, k2: Double, i2: Int): Boolean = {
      val c = java.lang.Double.compare(k1, k2)
      val r = if (c != 0) c else Integer.compare(i1, i2)
      if (max) r > 0 else r < 0
    }
    def topKey: Double = ks(0)
    def topId: Int = ids(0)
    def push(k: Double, id: Int): Unit = {
      var i = size
      size += 1
      while (i > 0 && before(k, id, ks((i - 1) / 2), ids((i - 1) / 2))) {
        ks(i) = ks((i - 1) / 2); ids(i) = ids((i - 1) / 2)
        i = (i - 1) / 2
      }
      ks(i) = k; ids(i) = id
    }
    def pop(): Unit = {
      size -= 1
      val k = ks(size); val id = ids(size)
      var i = 0
      var done = false
      while (!done) {
        var c = 2 * i + 1
        if (c >= size) done = true
        else {
          if (c + 1 < size && before(ks(c + 1), ids(c + 1), ks(c), ids(c)))
            c += 1
          if (before(ks(c), ids(c), k, id)) {
            ks(i) = ks(c); ids(i) = ids(c); i = c
          } else done = true
        }
      }
      ks(i) = k; ids(i) = id
    }
    /** Entries in UNORDERED heap layout (for a final explicit sort). */
    def keysUnordered: Array[Double] = java.util.Arrays.copyOf(ks, size)
    def idsUnordered: Array[Int] = java.util.Arrays.copyOf(ids, size)
  }

  /** Greedy best-first beam search over a small-world graph of sample
    * nodes — the graph-ANN routing primitive. Nodes live in a flat
    * matrix (same layout as [[nearestCellsEval]]); edges in CSR form
    * (adjOff/adj). Search = the standard HNSW search-layer: seed at
    * node 0, expand the best unexpanded candidate, keep the `ef` best
    * visited, stop when the best candidate is worse than the ef-th
    * result. Entirely deterministic: priorities are (key asc, ordinal
    * asc) with key = -cosine (zero-norm pairs keyed 2.0, sorting last,
    * exactly [[nearestCellsEval]]'s convention). With `ef >= nNodes`
    * the search expands the whole (connected) graph and the result is
    * the EXACT argmax over nodes — the oracle-checked configuration.
    *
    * Returns the `take` best node ordinals, best first.
    *
    * Per-row state (visited marks + the two heaps) is REUSED through a
    * thread-local workspace: the naive form allocated ~n ints of heap
    * plus an n-byte visited array per ROW, which at 10 M corpus rows x
    * 1,000 nodes is ~10^11 bytes of allocation churn — the GC pressure
    * showed up as a 4x wall-time loss to IVF and an 8x task-time
    * spread at the stress tier. Visited marks are generation-stamped so
    * reuse needs no clearing pass.
    */
  private final class GraphWorkspace(n: Int, beamCap: Int) {
    val visitedGen = new Array[Int](n)
    var gen = 0
    val cand = new NodeHeap(n, max = false)
    val result = new NodeHeap(beamCap, max = true)
  }
  @transient private lazy val graphWs =
    new ThreadLocal[java.util.HashMap[Long, GraphWorkspace]] {
      override def initialValue(): java.util.HashMap[Long, GraphWorkspace] =
        new java.util.HashMap[Long, GraphWorkspace]()
    }

  def graphNearestEval(arr: ArrayData, nodes: Array[Double], nodeNorms: Array[Double],
                       dim: Int, adjOff: Array[Int], adj: Array[Int],
                       ef: Int, take: Int, isFloat: Boolean): ArrayData = {
    val n = nodeNorms.length
    val len = arr.numElements()
    val v = new Array[Double](len)
    var i = 0
    while (i < len) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    var ss = 0.0
    i = 0
    while (i < len) { ss += v(i) * v(i); i += 1 }
    val vNorm = math.sqrt(ss)
    val m = math.min(len, dim)
    def key(c: Int): Double = {
      val d = vNorm * nodeNorms(c)
      if (d == 0.0) 2.0
      else {
        var s = 0.0
        val off = c * dim
        var j = 0
        while (j < m) { s += v(j) * nodes(off + j); j += 1 }
        -(s / d)
      }
    }
    val beam = math.max(1, math.min(ef, n))
    val wsMap = graphWs.get()
    val wsKey = (n.toLong << 32) | (beam + 1).toLong
    var ws = wsMap.get(wsKey)
    if (ws == null) {
      // bound the per-thread cache: a long-lived session cycling many
      // (graph size, beam) shapes must not retain a workspace for each
      // forever — one shape is hot at a time, so a small cap loses
      // nothing but the re-allocation on a shape switch
      if (wsMap.size >= 8) wsMap.clear()
      ws = new GraphWorkspace(n, beam + 1)
      wsMap.put(wsKey, ws)
    }
    ws.gen += 1
    if (ws.gen == Int.MinValue) { // generation counter wrapped
      java.util.Arrays.fill(ws.visitedGen, 0); ws.gen = 1
    }
    val gen = ws.gen
    val visitedGen = ws.visitedGen
    val cand = ws.cand
    val result = ws.result
    cand.size = 0
    result.size = 0
    val k0 = key(0)
    visitedGen(0) = gen
    cand.push(k0, 0)
    result.push(k0, 0)
    while (cand.size > 0) {
      val ck = cand.topKey; val cid = cand.topId
      // stop when the best remaining candidate cannot improve the
      // full result set (compare (key, id) for determinism)
      if (result.size >= beam && {
            val c = java.lang.Double.compare(ck, result.topKey)
            (if (c != 0) c else Integer.compare(cid, result.topId)) > 0
          }) {
        cand.size = 0
      } else {
        cand.pop()
        var e = adjOff(cid)
        while (e < adjOff(cid + 1)) {
          val nb = adj(e)
          if (visitedGen(nb) != gen) {
            visitedGen(nb) = gen
            val nk = key(nb)
            val admit = result.size < beam || {
              val c = java.lang.Double.compare(nk, result.topKey)
              (if (c != 0) c else Integer.compare(nb, result.topId)) < 0
            }
            if (admit) {
              cand.push(nk, nb)
              result.push(nk, nb)
              if (result.size > beam) result.pop()
            }
          }
          e += 1
        }
      }
    }
    // final ordering: (key asc, ordinal asc), take best
    val rk = result.keysUnordered
    val rid = result.idsUnordered
    val order = Array.range(0, rk.length).sortWith { (a, b) =>
      val c = java.lang.Double.compare(rk(a), rk(b))
      if (c != 0) c < 0 else rid(a) < rid(b)
    }
    val out = new Array[Long](math.min(take, order.length))
    var t = 0
    while (t < out.length) { out(t) = rid(order(t)).toLong; t += 1 }
    new GenericArrayData(out)
  }

  /** Graph-descent node assignment: the `take` nearest sample-node
    * ordinals found by beam search (see [[graphNearestEval]]). The
    * node matrix and adjacency reach generated code as REFERENCES.
    */
  case class GraphNearestNodes(child: Expression, nodes: Array[Double],
                               nodeNorms: Array[Double], dim: Int,
                               adjOff: Array[Int], adj: Array[Int],
                               ef: Int, take: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val isFloat = elemKind(child.dataType) == 0

    override def nullSafeEval(input: Any): Any =
      graphNearestEval(input.asInstanceOf[ArrayData], nodes, nodeNorms,
        dim, adjOff, adj, ef, take, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val nRef = ctx.addReferenceObj("graphNodes", nodes, "double[]")
      val nmRef = ctx.addReferenceObj("graphNodeNorms", nodeNorms, "double[]")
      val oRef = ctx.addReferenceObj("graphAdjOff", adjOff, "int[]")
      val aRef = ctx.addReferenceObj("graphAdj", adj, "int[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.graphNearestEval(" +
          s"$c, $nRef, $nmRef, $dim, $oRef, $aRef, $ef, $take, $isFloat);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** The `take` nearest coarse-quantizer cell ordinals for a vector,
    * best first — the IVF assignment primitive. The centroid matrix
    * reaches generated code as a REFERENCE (one `double[]`), never as
    * plan literals.
    */
  case class NearestCells(child: Expression, centroids: Array[Double],
                          cellNorms: Array[Double], dim: Int, take: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val isFloat = elemKind(child.dataType) == 0

    override def nullSafeEval(input: Any): Any =
      nearestCellsEval(input.asInstanceOf[ArrayData], centroids, cellNorms,
        dim, take, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[]")
      val nRef = ctx.addReferenceObj("ivfCellNorms", cellNorms, "double[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.NativeExpressions.nearestCellsEval(" +
          s"$c, $cRef, $nRef, $dim, $take, $isFloat);")
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ------------------------------------------------------- Column API

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def minhashSig(tokenHashes: Column, numHashes: Int,
                 shingleSize: Int): Column =
    ColumnBridge.column(MinHashSignature(
      ColumnBridge.expression(tokenHashes), numHashes, shingleSize))

  def minhashBands(tokenHashes: Column, numHashes: Int, shingleSize: Int,
                   bands: Int): Column =
    ColumnBridge.column(MinHashBandHashes(
      ColumnBridge.expression(tokenHashes), numHashes, shingleSize, bands))

  def simhash64(tokenHashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokenHashes)))

  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))

  def normalizeText(text: Column): Column =
    ColumnBridge.column(NormalizeText(ColumnBridge.expression(text)))

  def gramHashes(tokenHashes: Column, width: Int): Column =
    ColumnBridge.column(GramHashes(
      ColumnBridge.expression(tokenHashes), width))

  def searchBucket(v: Column, boundaries: Array[Double]): Column =
    ColumnBridge.column(SearchBucket(ColumnBridge.expression(v), boundaries))

  def srpBucketArray(vec: Column, bands: Int, bitsPerBand: Int,
                     maxDim: Int): Column =
    ColumnBridge.column(SrpBucketArray(
      ColumnBridge.expression(vec), bands, bitsPerBand, maxDim))

  def rademacherProject(vec: Column, outDim: Int, dim: Int): Column =
    ColumnBridge.column(RademacherProject(
      ColumnBridge.expression(vec), outDim, dim))

  def ngramRepRatio(toks: Column, n: Int): Column =
    ColumnBridge.column(NgramRepetitionRatio(
      ColumnBridge.expression(toks), n))

  def ngramArray(toks: Column, n: Int): Column =
    ColumnBridge.column(NgramArray(ColumnBridge.expression(toks), n))

  def bpeEncode(toks: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncode(ColumnBridge.expression(toks),
      merges.flatMap { case (l, r) => Seq(l, r) }.toArray))

  def tokenStats(toks: Column, stopwords: Seq[String],
                 needTypes: Boolean = true): Column =
    ColumnBridge.column(TokenStats(
      ColumnBridge.expression(toks), stopwords, needTypes))

  def dsirScore(toks: Column, weights: Array[Double]): Column =
    ColumnBridge.column(DsirScore(ColumnBridge.expression(toks), weights))

  def gramHitCount(grams: Column, table: Array[Long]): Column =
    ColumnBridge.column(GramHitCount(ColumnBridge.expression(grams), table))

  def gramBloomHitCount(grams: Column,
                        bf: org.apache.spark.util.sketch.BloomFilter): Column =
    ColumnBridge.column(GramBloomHitCount(ColumnBridge.expression(grams), bf))

  def rollingXxHash64(toks: Column): Column =
    ColumnBridge.column(RollingXxHash64(ColumnBridge.expression(toks)))

  def mightContain(s: Column,
                   bf: org.apache.spark.util.sketch.BloomFilter): Column =
    ColumnBridge.column(BloomMightContain(ColumnBridge.expression(s), bf))

  def mightContainLong(c: Column,
                       bf: org.apache.spark.util.sketch.BloomFilter): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(c), bf))

  def nearestCells(vec: Column, centroids: Array[Double],
                   cellNorms: Array[Double], dim: Int, take: Int): Column =
    ColumnBridge.column(NearestCells(
      ColumnBridge.expression(vec), centroids, cellNorms, dim, take))

  def graphNearestNodes(vec: Column, nodes: Array[Double],
                        nodeNorms: Array[Double], dim: Int,
                        adjOff: Array[Int], adj: Array[Int],
                        ef: Int, take: Int): Column =
    ColumnBridge.column(GraphNearestNodes(
      ColumnBridge.expression(vec), nodes, nodeNorms, dim, adjOff, adj,
      ef, take))
}
