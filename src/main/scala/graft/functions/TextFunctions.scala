package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus processing
  * (SURVEY §2.10 north-star surface): tokenization, quality scoring,
  * fingerprinting, language-ID heuristics.
  *
  * All pure `Column` expressions (no UDFs), and every per-token loop —
  * stats, n-grams, fingerprints — is a native codegen'd expression
  * ([[NativeExpressions]]) rather than a Spark higher-order function,
  * so the hot paths stay inside whole-stage codegen with no per-element
  * closure dispatch and scale linearly with the scan — the difference
  * between a 100 TB pass that is I/O-bound and one that is CPU-bound on
  * deserializing UDF rows.
  */
object TextFunctions {

  /** Whitespace tokenizer (collapses runs of whitespace). */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Canonical text form for dedup keys: NFC + lowercase + SQL-space
    * collapse, one native pass ([[NativeExpressions.NormalizeText]]).
    */
  def normalizeText(text: Column): Column =
    NativeExpressions.normalizeText(text)

  /** BPE-ish subword-aware token split: alphanumeric runs or single
    * non-space symbols — a cheap proxy for tokenizer-cost estimation.
    * The pattern is deliberately RE2-compatible (no lookarounds,
    * explicit whitespace class) so external engines can recompute it
    * verbatim as an oracle.
    */
  val bpeishPattern = "[A-Za-z0-9]+|[^A-Za-z0-9\\t\\n\\f\\r ]"

  def bpeishTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpeishPattern), lit(0))

  /** PII-shaped span scrubbing for corpus prep: emails then digit runs,
    * as pure `regexp_replace` chains (codegen'd, scan-bound — at 100 TB
    * this is a map-only pass with no shuffle). Patterns are
    * RE2-compatible (no lookarounds/backrefs) so external engines can
    * recompute them verbatim. Real PII policy needs NER-grade models;
    * this is the cheap structural layer those pipelines run first.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val digitPattern = "[0-9]"
  val emailReplacement = "<EMAIL>"
  val digitReplacement = "#"

  def redactEmails(text: Column, replacement: String = emailReplacement): Column =
    regexp_replace(text, emailPattern, replacement)

  def redactDigits(text: Column, replacement: String = digitReplacement): Column =
    regexp_replace(text, digitPattern, replacement)

  def redactPii(text: Column): Column = redactDigits(redactEmails(text))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token ("type") count; type/token ratio is a standard
    * quality signal.
    */
  def typeCount(text: Column): Column = size(array_distinct(tokens(text)))

  // `*Of` variants take an already-tokenized array column. Prefer these
  // when computing several stats over one document: tokenize once into a
  // column, then derive every stat from it (the split is the expensive
  // part; the optimizer keeps the two projections separate because the
  // split is non-cheap, so it is evaluated once per row).

  def tokenCountOf(toks: Column): Column = size(toks)

  def typeCountOf(toks: Column): Column = size(array_distinct(toks))

  /** Per-document token-stat struct `(token_count, type_count, len_sum,
    * stop_count)` computed in one native pass
    * ([[NativeExpressions.TokenStats]]). Derive several stats from the
    * SAME struct column and subexpression elimination evaluates the
    * loop once per row — the preferred surface when a query needs more
    * than one of the stats below.
    */
  def textStatsOf(toks: Column, stop: Seq[String]): Column =
    NativeExpressions.tokenStats(toks, stop)

  // derivations that never read type_count skip the distinct-token set
  // build (needTypes = false -> type_count is -1 in that struct)
  private def statsNoTypes(toks: Column, stop: Seq[String]): Column =
    NativeExpressions.tokenStats(toks, stop, needTypes = false)

  def stopwordRatioOf(toks: Column, stop: Seq[String]): Column = {
    val st = statsNoTypes(toks, stop)
    st.getField("stop_count") / greatest(st.getField("token_count"), lit(1))
  }

  /** Fraction of the document's token n-grams that are repeats
    * (1 - distinct/total) — the intra-document repetition signal
    * loop-y machine-generated and boilerplate text trips (the
    * "repetition" family of Gopher-style quality filters). 0.0 for
    * docs too short to have an n-gram, and 0.0 for a null token array
    * (the contract of the Column chain this replaced). A native
    * one-pass expression (NativeExpressions.NgramRepetitionRatio):
    * map-only, no shuffle, no per-token closure dispatch.
    */
  def ngramRepetitionRatioOf(toks: Column, n: Int): Column =
    coalesce(NativeExpressions.ngramRepRatio(toks, n), lit(0.0))

  def ngramRepetitionRatio(text: Column, n: Int): Column =
    ngramRepetitionRatioOf(tokens(text), n)

  def meanTokenLenOf(toks: Column): Column = {
    val st = statsNoTypes(toks, Nil)
    st.getField("len_sum").cast("double") /
      greatest(st.getField("token_count"), lit(1))
  }

  /** Ratio of tokens found in `stop` (lexical stopword ratio). */
  def stopwordRatio(text: Column, stop: Seq[String]): Column =
    stopwordRatioOf(tokens(text), stop)

  /** Fraction of characters that are punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))) /
      greatest(length(text), lit(1))

  /** Mean token length in characters. */
  def meanTokenLen(text: Column): Column = meanTokenLenOf(tokens(text))

  /** Composite document-quality score in [0,1]: rewards mid-length docs
    * with low punctuation and healthy stopword presence. Deterministic,
    * tunable; the shape mirrors published heuristic filters (C4/Gopher
    * rules): length window + symbol ratio + stopword floor.
    */
  def qualityScore(text: Column, stop: Seq[String]): Column =
    qualityScoreOf(text, tokens(text), stop)

  /** [[qualityScore]] over a pre-tokenized array column. */
  def qualityScoreOf(text: Column, toks: Column, stop: Seq[String]): Column = {
    val st = statsNoTypes(toks, stop)
    val n = st.getField("token_count")
    // length window: short docs score n/10 (ramp up), over-long docs
    // score 100000/n (decay) — both sides actually penalize
    val lenScore = when(n < 10, n.cast("double") / lit(10.0))
      .when(n > 100000, lit(100000.0) / n.cast("double"))
      .otherwise(lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5, lit(1.0))
    val stopScore =
      least((st.getField("stop_count") / greatest(n, lit(1))) * 10, lit(1.0))
    lenScore * lit(0.4) + punctScore * lit(0.3) + stopScore * lit(0.3)
  }

  /** Bag-of-words content fingerprint: md5 over the sorted distinct
    * token list. Word-order-insensitive — two shuffled copies of a
    * document collide, which is the property exact-dedup wants.
    */
  /** Token n-grams (space-joined) from a pre-tokenized array: the
    * building block for n-gram LM statistics and shingle-based dedup.
    * Documents shorter than `n` tokens yield an empty array.
    *
    * A native one-pass expression (NativeExpressions.NgramArray) —
    * one output string per window position, no per-token closure
    * dispatch. (History: a per-position `slice` inside `transform`
    * copied O(tokens x n) sub-arrays; a shifted-zip rewrite got it to
    * O(tokens); the native loop removes the remaining per-element
    * higher-order-function overhead.)
    */
  def ngramsOf(toks: Column, n: Int): Column = {
    require(n >= 1, s"ngrams needs n >= 1, got $n")
    NativeExpressions.ngramArray(toks, n)
  }

  def ngrams(text: Column, n: Int): Column = ngramsOf(tokens(text), n)

  def bowFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** 64-bit rolling fingerprint over tokens: `h = xxhash64(h, token)`
    * left-fold — order-sensitive, streaming-computable, cheap. (Chained
    * hashing instead of a `h*31 + x` polynomial so it cannot overflow
    * under ANSI mode.) A native one-pass expression bit-identical to
    * the `aggregate` fold it replaces
    * ([[NativeExpressions.RollingXxHash64]]).
    */
  def rollingFingerprint(text: Column): Column =
    NativeExpressions.rollingXxHash64(tokens(text))

  /** Language-ID by stopword-profile scoring: for each candidate
    * language, score = fraction of tokens in that language's stopword
    * list; argmax wins, "und" (undetermined) if all scores are zero.
    * The classic cheap n-gram/stopword heuristic (CLD-style), expressed
    * as pure columns.
    */
  def langIdByStopwords(text: Column, profiles: Map[String, Seq[String]]): Column =
    langIdByStopwordsOf(tokens(text), profiles)

  /** [[langIdByStopwords]] over a pre-tokenized array column. */
  def langIdByStopwordsOf(toks: Column, profiles: Map[String, Seq[String]]): Column = {
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordRatioOf(toks, words).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }
}
