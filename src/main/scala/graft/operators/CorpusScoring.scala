package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions => NE, TextFunctions => TF}

/** Learned-from-corpus document scoring for training-data selection
  * (SURVEY §2.10): the two standard "fit a cheap model on the corpus,
  * score every document with it" stages of an LLM data pipeline —
  * hashed-feature importance weights (DSIR) for domain-targeted
  * selection, and a token-count Naive Bayes classifier for quality
  * filtering (the fastText-classifier stand-in).
  *
  * Both are fully deterministic — counts, md5 bucketing, and IEEE
  * log/ratio math only, no sampled SGD — so an external engine can
  * replay them exactly; both were chosen over their gradient-trained
  * equivalents precisely because count-based closed forms keep the
  * 100 TB scoring pass reproducible under retries and partition
  * re-computation.
  */
object CorpusScoring {

  /** Number of hashed feature buckets: first two md5 hex chars. Small
    * by design — DSIR's insight is that coarse hashed n-gram counts
    * carry enough signal to rank domain fit, and 256 buckets keep the
    * model collectable to a literal no matter the corpus size.
    */
  val dsirBuckets = 256

  private def bucketOf(tok: Column): Column = substring(md5(tok), 1, 2)

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score every
    * document by how much more likely its tokens are under the TARGET
    * distribution (rows where `isTarget`) than under the RAW
    * distribution (the rest), with features hashed into 256 md5
    * buckets and add-1 smoothing on both sides:
    *
    *   logw(doc) = Σ_tok [ ln((t_b+1)/(T+256)) − ln((r_b+1)/(R+256)) ]
    *
    * where b = md5 bucket of the token, t_b/r_b the bucket's token
    * count in target/raw, T/R the total token counts. Selecting the
    * top-weight (or logw > 0) slice of the raw pool yields a
    * target-domain-like subset.
    *
    * Shape at scale: one aggregation job collapses the corpus to AT
    * MOST 256 (bucket, t_n, r_n) rows — map-side partials make the
    * shuffle 256 rows per partition — which are collected (bounded by
    * construction, same stance as the IVF centroid collect) and folded
    * into a literal lookup map. The scoring pass is then a pure
    * map-only projection over the corpus: a higher-order `aggregate`
    * over the token array probes the literal map per token — ZERO
    * shuffle, embarrassingly parallel at any corpus size.
    *
    * Output: (idCol, n_tokens, logw) for every document, logw rounded
    * to 6 decimals so independent engines agree despite summation
    * order.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column): DataFrame = {
    val counts = docs
      .select(isTarget.as("__t"), explode(TF.tokens(col(textCol))).as("tok"))
      .groupBy(bucketOf(col("tok")).as("bucket"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("t_n"),
        sum(when(col("__t"), 0L).otherwise(1L)).as("r_n"))
      .collect() // ≤ 256 rows by construction
    val tTot = counts.map(_.getLong(1)).sum
    val rTot = counts.map(_.getLong(2)).sum
    val byBucket = counts.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // every possible bucket gets a weight, so unseen-bucket probes hit
    // the smoothed floor instead of null; indexed by the bucket byte
    // (= the first two md5 hex chars parsed as an int)
    val weights: Array[Double] = Array.tabulate(dsirBuckets) { i =>
      val (t, r) = byBucket.getOrElse(f"$i%02x", (0L, 0L))
      math.log((t + 1).toDouble / (tTot + dsirBuckets)) -
        math.log((r + 1).toDouble / (rTot + dsirBuckets))
    }
    // NULL-text docs emit NO row — the same contract UnigramLm documents
    // ("no tokens -> no row") and the one the scoring oracles replay via
    // inner joins; without the filter a NULL text would yield a row with
    // NULL n_tokens/logw and break hash-parity with the oracle.
    // DsirScore is the one-pass native form of
    // `aggregate(toks, 0.0, acc + element_at(map, substring(md5(t),1,2)))`
    // — same md5 bucketing, same left-to-right double fold, no
    // interpreted lambda and no per-token hex-string allocation
    docs.filter(col(textCol).isNotNull)
      .select(col(idCol), TF.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).cast("long").as("n_tokens"),
        round(NE.dsirScore(col("__toks"), weights), 6).as("logw"))
  }

  /** DSIR importance RESAMPLING — the selection step the weights exist
    * for (Xie et al. 2023 §3: sample the raw pool with probability
    * proportional to the importance weight). Deterministic rejection
    * form: document i is kept iff
    *
    *   u_i < min(1, exp(logw_i − shift))
    *
    * with u_i the content-addressed md5 uniform (`seed:id`, first four
    * hex chars — the same 1/65536-quantized acceptance mechanism as
    * [[graft.operators.TrainingOps.hashSample]] and temperatureMix, so
    * the draw is reproducible under retries, corpus growth, and
    * external engines). `shift` tunes the acceptance budget without a
    * corpus-wide normalization pass: exp(logw − shift) needs no global
    * sum-of-weights, so the scoring+selection stays MAP-ONLY after the
    * 256-row model collect — a corpus-wide softmax normalizer would
    * put a sequential window over every document for no semantic gain
    * (docs with logw ≥ shift are always kept; each unit of shift
    * decimates the rest by e).
    *
    * The acceptance probability is computed from the ROUNDED logw (the
    * 6-decimal output contract of [[dsirWeights]]) so independent
    * engines exponentiate bit-identical inputs.
    *
    * Output: the selected (idCol, n_tokens, logw) rows.
    */
  def importanceResample(docs: DataFrame, idCol: String, textCol: String,
                         isTarget: Column, shift: Double = 0.0,
                         seed: String = "dsirsamp"): DataFrame = {
    val weighted = dsirWeights(docs, idCol, textCol, isTarget)
    val th = floor(least(lit(1.0), exp(col("logw") - shift)) * 65536)
      .cast("int")
    // logw >= shift saturates to always-keep explicitly: the threshold
    // 65536 would format as the 5-char "10000", which sorts BELOW most
    // 4-char buckets (same hazard keepFraction documents)
    weighted.filter(
      col("logw") >= shift ||
        substring(md5(concat(lit(seed + ":"), col(idCol).cast("string"))),
          1, 4) < format_string("%04x", th))
  }

  /** Token-count Naive Bayes quality classifier: fit per-class token
    * counts on a deterministic hash-selected seed slice whose labels
    * come from `isGood` (typically a heuristic like
    * [[graft.functions.TextFunctions.qualityScore]] ≥ threshold — the
    * standard bootstrap for a corpus quality model), then score EVERY
    * document with the closed-form NB log-odds:
    *
    *   score(doc) = ln((Dg+1)/(Db+1))
    *              + Σ_tok [ ln((g_t+1)/(Ng+V)) − ln((b_t+1)/(Nb+V)) ]
    *
    * g_t/b_t = occurrences of the token in good/bad seed docs, Ng/Nb =
    * total good/bad seed tokens, V = seed vocabulary size (add-1
    * smoothing denominator), Dg/Db = good/bad seed doc counts (the
    * prior). Tokens unseen in the seed contribute the smoothed floor
    * ln(1/(Ng+V)) − ln(1/(Nb+V)). pred = 1 iff score > 0.
    *
    * Seed membership is content-addressed (md5(seed:id) bucket below
    * floor(65536·seedFrac)) — the same stance as TrainingOps splits:
    * re-runs and corpus growth never move a document in or out of the
    * seed, so the model (and therefore every score) is reproducible.
    *
    * Shape at scale: the model is one (token) aggregation over the
    * seed slice only; scoring joins token occurrences against the
    * vocabulary-sized model — the model side is the smaller input,
    * followed by one (doc) aggregation whose map-side partials
    * collapse to one row per doc per partition. `broadcastModel`
    * picks the join strategy: true (default) force-broadcasts, right
    * whenever the vocabulary fits an executor; pass false for a
    * hashed-subword or web-scale vocabulary and the join runs as a
    * shuffled hash join on `term` instead — never rely on the default
    * for a model you have not sized, a forced broadcast of a
    * multi-GB vocabulary is a driver OOM.
    *
    * Output: (idCol, n_tokens, nb_score, pred).
    */
  def naiveBayesQuality(docs: DataFrame, idCol: String, textCol: String,
                        isGood: Column, seedFrac: Double = 0.3,
                        seed: String = "nbseed",
                        broadcastModel: Boolean = true): DataFrame = {
    require(seedFrac > 0 && seedFrac <= 1.0,
      s"seedFrac must be in (0, 1], got $seedFrac")
    val n = math.floor(65536 * seedFrac).toInt
    val inSeed =
      if (n >= 65536) lit(true)
      else substring(md5(concat(lit(seed + ":"), col(idCol).cast("string"))),
        1, 4) < lit(f"$n%04x")

    val seedToks = docs.filter(inSeed)
      .select(isGood.as("__g"), col(idCol),
        explode(TF.tokens(col(textCol))).as("term"))
    val model = seedToks.groupBy("term").agg(
      sum(when(col("__g"), 1L).otherwise(0L)).as("g_n"),
      sum(when(col("__g"), 0L).otherwise(1L)).as("b_n"))
    // three scalars in one tiny job: token totals + vocab from the
    // model (≤ vocab rows); doc-count priors are collected eagerly so a
    // degenerate seed FAILS FAST — without the guard an empty (or
    // single-class) seed slice would make every nb_score silently NULL
    // (sum over an empty model is NULL) instead of raising
    val tokTotals = model.agg(sum("g_n").as("ng"), sum("b_n").as("nb"),
      count(lit(1)).as("v"))
    // one tiny job over the seed slice: class doc counts AND class
    // token totals — both guards, because both degeneracies produce the
    // same silent all-NULL scores (a class with docs but zero tokens —
    // all NULL/empty text — empties that side of the model just as
    // surely as a missing class)
    val docRow = docs.filter(inSeed).agg(
      sum(when(isGood, 1L).otherwise(0L)).as("dg"),
      sum(when(isGood, 0L).otherwise(1L)).as("db"),
      sum(when(isGood, coalesce(size(TF.tokens(col(textCol))), lit(0)))
        .otherwise(0).cast("long")).as("gt"),
      sum(when(isGood, 0)
        .otherwise(coalesce(size(TF.tokens(col(textCol))), lit(0)))
        .cast("long")).as("bt")).collect()(0)
    def cnt(i: Int): Long = if (docRow.isNullAt(i)) 0L else docRow.getLong(i)
    require(cnt(0) > 0 && cnt(1) > 0 && cnt(2) > 0 && cnt(3) > 0,
      s"degenerate NB seed: need both classes with tokens in the seed " +
        s"slice, got good=${cnt(0)} docs/${cnt(2)} tokens " +
        s"bad=${cnt(1)} docs/${cnt(3)} tokens " +
        s"(seedFrac=$seedFrac too small, isGood degenerate, or seed " +
        "text empty?)")
    val (dgN, dbN) = (cnt(0), cnt(1))
    val consts = broadcast(tokTotals)

    val occurrences = docs.select(col(idCol),
      explode(TF.tokens(col(textCol))).as("term"))
    val modelSide = if (broadcastModel) broadcast(model)
      else model.hint("shuffle_hash")
    val scoredToks = occurrences
      .join(modelSide, Seq("term"), "left_outer")
      .crossJoin(consts)
      .select(col(idCol),
        (log((coalesce(col("g_n"), lit(0L)) + 1).cast("double") /
            (col("ng") + col("v"))) -
          log((coalesce(col("b_n"), lit(0L)) + 1).cast("double") /
            (col("nb") + col("v")))).as("__term"),
        (log(lit((dgN + 1).toDouble)) -
          log(lit((dbN + 1).toDouble))).as("__prior"))
    // Under the shuffled-hash model join the token stream leaves the
    // join TERM-partitioned: a doc's tokens scatter across every
    // partition, so the doc aggregation's map-side partial combines
    // ~nothing while its hash table fills with (rows/partition) doc
    // keys — at the 50 M-doc stress tier that was 19 M entries/task
    // and 56 GB of aggregate spill. Re-keying the skinny (id, score)
    // rows on the doc FIRST costs the same one exchange the groupBy
    // would have paid, but the partial agg then runs over co-located
    // docs (corpus/partitions keys per task) and the final agg reuses
    // the partitioning — zero spill, no extra exchange. The broadcast
    // path keeps the scan's doc-contiguous partitioning, where the
    // default partial-then-exchange shape already combines 12:1.
    val reKeyed = if (broadcastModel) scoredToks
      else scoredToks.repartition(col(idCol))
    reKeyed
      .groupBy(idCol).agg(
        count(lit(1)).as("n_tokens"),
        round(first(col("__prior")) + sum(col("__term")), 6).as("nb_score"))
      .withColumn("pred", (col("nb_score") > 0).cast("int"))
  }

  /** Reliability curve for a classifier score against ground truth —
    * the threshold-selection harness run after every quality-model
    * fit: per FIXED probability bin, how many documents land there and
    * what fraction are actually good. A calibrated model's `frac_good`
    * tracks the bin midpoints; a confident-but-wrong one doesn't, and
    * the bin rows say which score region to distrust before the score
    * gates a 100 TB filter pass.
    *
    * `scoreCol` is a log-odds (the [[naiveBayesQuality]] output);
    * it maps through the logistic 1/(1+e^-s), ROUNDED to 6 decimals
    * (the replayability stance — libm's last ulp never decides a bin),
    * into `nBins` equal-width probability bins. Fixed bins, not
    * ntile: quantile binning needs a global sort or sketch pass, while
    * fixed bins are map-only per row into an `nBins`-row aggregate —
    * nothing about this pass grows with the corpus.
    *
    * Output: (bin, n_docs, avg_p, frac_good), bins that caught no
    * documents absent.
    */
  def calibration(scored: DataFrame, idCol: String, scoreCol: String,
                  truth: DataFrame, truthCol: String,
                  nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    val p = round(lit(1.0) / (lit(1.0) + exp(-col(scoreCol))), 6)
    scored.select(col(idCol), p.as("__p"))
      .join(truth.select(col(idCol), col(truthCol).cast("int").as("__g")),
        Seq(idCol))
      .groupBy(least(floor(col("__p") * nBins), lit(nBins - 1L))
        .cast("int").as("bin"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("__p")), 6).as("avg_p"),
        round(avg(col("__g")), 6).as("frac_good"))
  }
}
