package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TextFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("charEntropy: hand-computed values, empty = 0, null = null, codegen") {
    val df = Seq(
      (1L, Option("aab")),      // -(2/3 log2 2/3 + 1/3 log2 1/3) = 0.9183
      (2L, Option("abcd")),     // uniform over 4 -> exactly 2 bits
      (3L, Option("aaaa")),     // single symbol -> 0
      (4L, Option("")),         // empty -> 0
      (5L, Option.empty[String])
    ).toDF("id", "t")
    val got = df.select(col("id"),
        round(NativeExpressions.charEntropy(col("t")), 6).as("h"))
      .as[(Long, Option[Double])].collect().toMap
    assert(math.abs(got(1L).get - 0.918296) < 1e-9)
    assert(got(2L).get === 2.0)
    assert(got(3L).get === 0.0)
    assert(got(4L).get === 0.0)
    assert(got(5L).isEmpty, "null text must stay null")
    // codegen check needs a non-local plan (a Seq constant-folds to
    // LocalTableScan with no codegen span to inspect)
    val p = spark.range(4)
      .select(NativeExpressions.charEntropy(concat(lit("x"), col("id"))))
      .queryExecution.executedPlan.toString
    assert(p.contains("*("), s"CharEntropy fell out of codegen:\n$p")
  }

  test("charEntropy counts code points, not UTF-16 units") {
    // U+1D11E (musical G clef) is a surrogate pair in UTF-16; with one
    // 'a' the distribution is uniform over TWO code points -> 1 bit
    val h = Seq(("𝄞" + "a")).toDF("t")
      .select(NativeExpressions.charEntropy(col("t"))).as[Double].head()
    assert(h === 1.0, s"expected 1 bit over two code points, got $h")
  }

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "  spaced   out\ttabs\nand newlines  "),
    (3L, "el perro la casa el gato")
  ).toDF("doc_id", "text")

  private def one[T](c: org.apache.spark.sql.Column, id: Long = 1L)(implicit
      enc: org.apache.spark.sql.Encoder[T]): T =
    docs.filter(col("doc_id") === id).select(c.as[T](enc)).head()

  test("tokens collapses whitespace runs") {
    assert(one[Int](size(TextFunctions.tokens(col("text"))), 2L) === 5)
  }

  test("tokenCount / typeCount") {
    assert(one[Int](TextFunctions.tokenCount(col("text"))) === 9)
    assert(one[Int](TextFunctions.typeCount(col("text"))) === 8) // 'the' twice
  }

  test("stopwordRatio") {
    assert(one[Double](TextFunctions.stopwordRatio(col("text"), Seq("the"))) === 2.0 / 9)
  }

  test("fingerprints are deterministic and order-sensitivity differs") {
    val fp1 = one[String](TextFunctions.bowFingerprint(col("text")))
    val fp1b = one[String](TextFunctions.bowFingerprint(col("text")))
    assert(fp1 === fp1b)
    // bow fingerprint ignores order; rolling fingerprint does not
    val shuffled = Seq((1L, "dog lazy the over jumps fox brown quick the"))
      .toDF("doc_id", "text")
    val bowA = one[String](TextFunctions.bowFingerprint(col("text")))
    val bowB = shuffled.select(TextFunctions.bowFingerprint(col("text")).as[String]).head()
    assert(bowA === bowB)
    val rollA = one[Long](TextFunctions.rollingFingerprint(col("text")))
    val rollB = shuffled.select(TextFunctions.rollingFingerprint(col("text")).as[Long]).head()
    assert(rollA !== rollB)
  }

  test("langId picks the profile with the highest stopword hit rate") {
    val pred = docs.select(col("doc_id"),
      TextFunctions.langIdByStopwords(col("text"),
        Map("en" -> Seq("the", "a"), "es" -> Seq("el", "la"))).as("p"))
      .as[(Long, String)].collect().toMap
    assert(pred(1L) === "en")
    assert(pred(3L) === "es")
    assert(pred(2L) === "und")
  }

  test("bpeishTokens splits words and symbols") {
    val tiny = Seq((1L, "don't stop-me now123")).toDF("doc_id", "text")
    val got = tiny.select(TextFunctions.bpeishTokens(col("text")).as[Seq[String]]).head()
    assert(got.contains("don") && got.contains("'") && got.contains("t"))
    assert(got.contains("now123"))
  }

  test("ngrams: sliding trigrams; short docs yield empty, not bogus descending ranges") {
    val d = Seq((1L, "a b c d"), (2L, "a b"), (3L, "")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), TextFunctions.ngrams(col("text"), 3).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq("a b c", "b c d"))
    assert(got(2L) === Seq.empty)
    assert(got(3L) === Seq.empty)
  }

  test("ngramRepetitionRatio: repeats counted, short docs score 0") {
    val d = Seq(
      (1L, "a b a b a b"),   // bigrams: ab ba ab ba ab -> 2 distinct of 5
      (2L, "x y z"),          // bigrams: xy yz -> no repeats
      (3L, "q"), (4L, "")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextFunctions.ngramRepetitionRatio(col("text"), 2).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - (1.0 - 2.0 / 5.0)) < 1e-12)
    assert(got(2L) === 0.0)
    assert(got(3L) === 0.0)
    assert(got(4L) === 0.0)
  }

  test("ngram natives: null tokens drop their windows, null input scores 0") {
    // windows containing a null token are dropped (the zip_with/concat/
    // filter contract the native expressions replaced)
    val arrs = Seq(
      (1L, Array("a", null, "b")),
      (2L, Array("a", "b", "a", "b"))).toDF("id", "toks")
    val grams = arrs.select(col("id"),
        TextFunctions.ngramsOf(col("toks"), 2).as("g"))
      .as[(Long, Seq[String])].collect().toMap
    assert(grams(1L) === Seq.empty, "null-token windows must be dropped")
    assert(grams(2L) === Seq("a b", "b a", "a b"))
    val ratios = arrs.select(col("id"),
        TextFunctions.ngramRepetitionRatioOf(col("toks"), 2).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(ratios(1L) === 0.0)
    assert(math.abs(ratios(2L) - (1.0 - 2.0 / 3.0)) < 1e-12)
    // null text -> null tokens -> ratio 0.0, not null
    val nullText = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    val r = nullText.select(
        TextFunctions.ngramRepetitionRatio(col("text"), 2).as("r"))
      .as[Double].collect().head
    assert(r === 0.0)
  }

  test("redactPii masks emails before digits, leaves clean text alone") {
    val d = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call 555-1234"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = d.select(col("doc_id"), TextFunctions.redactPii(col("text")))
      .as[(Long, String)].collect().toMap
    // email swallowed whole (digits inside it never leak as ###)
    assert(got(1L) === "contact <EMAIL> or call ###-####")
    assert(got(2L) === "no pii here at all")
  }

  test("TokenStats parity: native stats equal the HOF constructions they replaced") {
    // token arrays with nulls, dups, empties — the edge cases of the
    // size/array_distinct/filter/aggregate contracts TokenStats mirrors
    val arrs = Seq(
      (1L, Array("the", "a", "the", "dog")),
      (2L, Array[String]()),
      (3L, Array("x", null, "x")),
      (4L, Array[String](null, null)),
      (5L, Array(""))).toDF("id", "toks")
    val stop = Seq("the", "a")
    val stopArr = array(stop.map(lit): _*)
    val got = arrs.select(col("id"),
        TextFunctions.textStatsOf(col("toks"), stop).as("st"),
        size(col("toks")).as("n0"),
        size(array_distinct(col("toks"))).as("ty0"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t)).as("ls0"),
        size(filter(col("toks"), t => array_contains(stopArr, t))).as("sc0"))
      .selectExpr("id", "st.token_count", "st.type_count", "st.len_sum",
        "st.stop_count", "n0", "ty0", "ls0", "sc0")
      .as[(Long, Int, Int, Option[Long], Int, Int, Int, Option[Long], Int)]
      .collect()
    got.foreach { case (id, n, ty, ls, sc, n0, ty0, ls0, sc0) =>
      assert(n === n0, s"token_count for id=$id")
      assert(ty === ty0, s"type_count for id=$id")
      assert(ls === ls0, s"len_sum for id=$id")
      assert(sc === sc0, s"stop_count for id=$id")
    }
    // null input array -> null struct (same as size/aggregate on null)
    val nul = Seq(Tuple1(Option.empty[Array[String]])).toDF("toks")
      .select(TextFunctions.textStatsOf(col("toks"), stop).isNull.as[Boolean])
      .head()
    assert(nul)
  }

  test("rollingFingerprint parity: native equals the xxhash64 aggregate fold") {
    val d = Seq((1L, "the quick brown fox"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val got = d.select(col("doc_id"),
        TextFunctions.rollingFingerprint(col("text")).as("fp"),
        aggregate(TextFunctions.tokens(col("text")), lit(0L),
          (acc, t) => xxhash64(acc, t)).as("fp0"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, fp, fp0) => assert(fp === fp0, s"doc $id") }
  }

  test("qualityScore is in [0,1] and penalizes tiny docs") {
    val q = docs.select(TextFunctions.qualityScore(col("text"), Seq("the", "a")).as[Double]).collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
    val tiny = Seq((1L, "hi")).toDF("doc_id", "text")
    val qTiny = tiny.select(TextFunctions.qualityScore(col("text"), Seq("the")).as[Double]).head()
    assert(qTiny < q.max)
  }

  test("normalizeText: NFC + lowercase + SQL-space collapse + trim") {
    val in = Seq(
      "  Hello\t\tWorld  ",          // runs + trim
      "MiXeD Case",
      "a\nb\rc\fde",           // every SQL whitespace char
      "",                            // empty
      " \t ",                        // whitespace-only -> empty
      "Café",                  // NFC: e + combining acute -> é
      "already clean"
    ).toDF("t")
    val got = in.select(TextFunctions.normalizeText(col("t")).as[String]).collect()
    assert(got === Array(
      "hello world", "mixed case", "a b c d e", "", "",
      "café", "already clean"))
  }

  test("normalizeText: null passes through, codegen and interpreted agree") {
    val in = Seq(Option("  A  B "), None).toDF("t")
    val viaCodegen = in.select(TextFunctions.normalizeText(col("t")).as[Option[String]]).collect()
    assert(viaCodegen === Array(Some("a b"), None))
    // interpreted path (eval) via a non-codegen context: filter pushes
    // the expression into a Filter that may run interpreted — just pin
    // the scalar helper directly
    import org.apache.spark.unsafe.types.UTF8String
    assert(NativeExpressions.normTextEval(
      UTF8String.fromString(" XY ")).toString === "x y")
  }
}
