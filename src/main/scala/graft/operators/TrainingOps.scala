package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Dataset-assembly operators for training pipelines (SURVEY §2.10):
  * deterministic splits, sampling, and global shuffling.
  *
  * All three are CONTENT-ADDRESSED — the decision for a row is a pure
  * function of (seed, row id) via md5, never `rand()` or partition
  * position. That is the property that matters at 100 TB:
  *  - re-running the job (or re-computing a lost partition) assigns
  *    every row the same way, so exactly-once sinks and incremental
  *    re-builds stay consistent;
  *  - adding documents later never moves an existing document across
  *    splits (no train/test leakage when the corpus grows);
  *  - any other engine can reproduce the assignment from the same
  *    (seed, id) — md5 is md5 everywhere.
  * Cost: one hash per row, no shuffle for split/sample; the shuffle op
  * is one range-exchange + in-partition sort, Spark's scalable form of
  * a global ORDER BY.
  */
object TrainingOps {

  /** 32-hex-char deterministic key for (seed, id). */
  private def hashKey(idCol: Column, seed: String): Column =
    md5(concat(lit(seed), lit(":"), idCol.cast("string")))

  /** True for ~`fraction` of ids: 4-hex-char bucket below the
    * fraction's threshold. Saturates at fraction 1.0 — the threshold
    * 65536 would format as the 5-char "10000", which sorts below
    * almost every 4-char bucket and would keep ~6% instead of all.
    */
  private def keepFraction(idCol: Column, fraction: Double,
                           seed: String): Column = {
    require(fraction >= 0 && fraction <= 1.0,
      s"fraction must be in [0, 1], got $fraction")
    val n = math.floor(65536 * fraction).toInt
    if (n >= 65536) lit(true)
    else substring(hashKey(idCol, seed), 1, 4) < lit(f"$n%04x")
  }

  /** Add a `split` column ("train" / "val" / "test") with the given
    * fractions (test gets the remainder). Assignment = first two hex
    * chars of md5(seed:id), i.e. 256 uniform buckets; fractions are
    * realized at 1/256 granularity.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  trainFrac: Double = 0.8, valFrac: Double = 0.1,
                  seed: String = "split"): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      "fractions must be non-negative and sum to <= 1")
    val bucket = substring(hashKey(col(idCol), seed), 1, 2)
    // a threshold of >= 256 formats as 3 chars ("100"), which sorts
    // BELOW most 2-char buckets — saturate to always-true instead
    def below(n: Int): Column =
      if (n >= 256) lit(true) else bucket < lit(f"$n%02x")
    df.withColumn("split",
      when(below(math.floor(256 * trainFrac).toInt), "train")
        .when(below(math.floor(256 * (trainFrac + valFrac)).toInt), "val")
        .otherwise("test"))
  }

  /** Leakage-safe split: near-duplicate documents must land in the
    * SAME split — a dup cluster straddling train/eval leaks eval
    * content into training, the contamination [[crossSplitContamination]]
    * exists to catch after the fact. This prevents it at assignment
    * time: the split hash is keyed on the cluster's canonical label
    * (from [[DedupOps.duplicateClusters]]) instead of the doc id;
    * unclustered docs key on their own id. Assignment stays a pure
    * function of (seed, canonical key): adding or removing OTHER
    * documents never moves a doc between splits unless its cluster
    * membership itself changed.
    *
    * The label join is an equi-join on the id — at corpus scale the
    * label table holds only clustered docs (the dup fraction), and the
    * shuffle carries (id, label) pairs, never text.
    */
  def assignSplitByCluster(docs: DataFrame, idCol: String,
                           clusterLabels: DataFrame,
                           trainFrac: Double = 0.8, valFrac: Double = 0.1,
                           seed: String = "split"): DataFrame = {
    val labels = clusterLabels
      .select(col("id").as(idCol), col("label").as("__cluster"))
    val keyed = docs.join(labels, Seq(idCol), "left")
      .withColumn("__split_key", coalesce(col("__cluster"), col(idCol)))
    assignSplit(keyed, "__split_key", trainFrac, valFrac, seed)
      .drop("__split_key", "__cluster")
  }

  /** Keep ~`fraction` of rows, decided per row by hash bucket (65536
    * buckets from the first four hex chars). Unlike `df.sample`, the
    * kept set is a pure function of (seed, id): stable across reruns,
    * task retries, and engines.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 seed: String = "sample"): DataFrame =
    df.filter(keepFraction(col(idCol), fraction, seed))

  /** Stratified deterministic sampling: a different keep-fraction per
    * stratum (e.g. rebalancing a language mix), decided by the same
    * content-addressed hash as [[hashSample]]. Strata missing from
    * `fractions` fall back to `defaultFraction`. Like hashSample this
    * is a map-only filter — no shuffle, stable across reruns, and a
    * row's fate never changes when other rows appear.
    */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
                           fractions: Map[String, Double],
                           defaultFraction: Double = 1.0,
                           seed: String = "sample"): DataFrame = {
    val cond = fractions.toSeq.foldRight(
      keepFraction(col(idCol), defaultFraction, seed)) {
      case ((stratum, f), fallback) =>
        when(col(strataCol) === stratum,
          keepFraction(col(idCol), f, seed)).otherwise(fallback)
    }
    df.filter(cond)
  }

  /** Weighted k-sample WITHOUT replacement (Efraimidis–Spirakis 2006):
    * each row draws a deterministic uniform u from md5(seed:id) and is
    * ranked by ln(u)/w — the top k by that key are a weight-
    * proportional sample, exactly as if rows were drawn sequentially
    * with probability w_i / sum(remaining w). One map-only key
    * computation + a TakeOrderedAndProject (per-partition heaps carry
    * k rows each to the driver merge — no global sort, no shuffle of
    * the corpus) at any scale.
    *
    * The ranking key is ROUNDED to 6 decimals with id tie-breaks, so a
    * cross-engine ln() ulp cannot flip an ordering (the q_topterms
    * parity rule); u = (h48 + 1) / 2^48 where h48 is the first 12 hex
    * chars of the md5 — exact in a double, and never 0 so ln is
    * finite. Rows with non-positive weight are excluded (they can
    * never be drawn).
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: String = "wsamp"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = col(weightCol).cast("double")
    val h = conv(substring(hashKey(col(idCol), seed), 1, 12), 16, 10)
      .cast("double")
    val u = (h + 1) / lit(281474976710656.0) // 2^48
    df.filter(w > 0)
      .withColumn("es_key", round(log(u) / w, 6))
      .orderBy(col("es_key").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic global shuffle: order rows by md5(seed:id). The sort
    * is a range-partitioned exchange + per-partition sort (Spark's
    * distributed ORDER BY) — no single-reducer bottleneck, and writing
    * the result partition-by-partition preserves the global order.
    * Changing `seed` gives an independent permutation (per-epoch
    * reshuffling).
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           seed: String = "epoch0"): DataFrame = {
    require(!df.columns.contains("shuffle_key"),
      "input already has a shuffle_key column; rename it before shuffling")
    df.withColumn("shuffle_key", hashKey(col(idCol), seed))
      .orderBy(col("shuffle_key"))
  }

  /** Source-weighted mixture: realize per-source sampling weights as
    * deterministic document repetition — the mixing step pretraining
    * runs apply to combine sources at different duty cycles. Weight 2.5
    * emits every doc of that source twice plus a deterministic 50%
    * half-sample third copy (`epoch` = 0..copies-1 tags the repeats);
    * weight 0.25 keeps a quarter of the docs; unlisted sources take
    * `defaultWeight`.
    *
    * Map-only — a pure function of (seed, id, source): no shuffle, and
    * re-runs / retries / external engines reproduce the exact same
    * mixture (the fractional part reuses the md5-prefix threshold of
    * [[hashSample]], quantized at 1/65536).
    */
  def sourceWeightedMix(df: DataFrame, idCol: String, sourceCol: String,
                        weights: Map[String, Double],
                        defaultWeight: Double = 1.0,
                        seed: String = "mix"): DataFrame = {
    val all = weights.values ++ Seq(defaultWeight)
    require(all.forall(w => w >= 0 && w <= 1000),
      "weights must be in [0, 1000]")
    Seq("epoch", "__copies").foreach(r => require(!df.columns.contains(r),
      s"column name $r is reserved by sourceWeightedMix"))
    def base(w: Double): Int = math.floor(w).toInt
    def frac(w: Double): Double = w - math.floor(w)
    // per-source constants resolve at plan time -> the whole operator
    // is a literal when-chain over the source column
    val sorted = weights.toSeq.sortBy(_._1)
    val baseExpr = sorted.foldLeft(lit(base(defaultWeight)): Column) {
      case (acc, (s, w)) => when(col(sourceCol) === lit(s), lit(base(w))).otherwise(acc)
    }
    val acceptExpr = sorted.foldLeft(
      keepFraction(col(idCol), frac(defaultWeight), seed): Column) {
      case (acc, (s, w)) =>
        when(col(sourceCol) === lit(s),
          keepFraction(col(idCol), frac(w), seed)).otherwise(acc)
    }
    val copies = (baseExpr + acceptExpr.cast("int")).as("__copies")
    df.withColumn("__copies", copies)
      .withColumn("epoch",
        explode(when(col("__copies") > 0,
          sequence(lit(0), col("__copies") - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("epoch", col("epoch").cast("long"))
      .drop("__copies")
  }

  /** Train/eval contamination report: for every CONTAMINATED non-train
    * document (clean documents emit no row), how
    * many distinct token n-grams it shares with ANY train document —
    * the decontamination signal run before a benchmark-clean training
    * set ships (an eval doc with many shared n-grams is leaked
    * training data, not chance overlap).
    *
    * Shape at scale: explode to (doc, ngram), split the stream by the
    * content-addressed `assignSplit` label, distinct each side, and
    * equi-join on the n-gram — an inverted-index join, never a doc×doc
    * comparison. `maxNgramDf` drops n-grams occurring in more than
    * that many TRAIN docs before the join (boilerplate headers are the
    * n-gram equivalent of stopwords: they dominate join volume and
    * carry no leakage signal). None keeps everything.
    */
  def crossSplitContamination(docs: DataFrame, idCol: String,
                              textCol: String, n: Int = 3,
                              trainFrac: Double = 0.8, valFrac: Double = 0.1,
                              seed: String = "split",
                              maxNgramDf: Option[Long] = Some(1000L)): DataFrame = {
    val grams = splitGrams(docs, idCol, textCol, n, trainFrac, valFrac, seed)
    contaminationReport(grams.filter(col("split") === "train"),
      evalDistinct(grams), maxNgramDf)
  }

  /** Exploded (doc, split, gram) stream with the n-gram identity
    * carried as a 128-bit hash pair instead of the string. This is the
    * contamination family's memory shape at corpus scale: every
    * exchange and aggregation downstream moves two fixed-width longs
    * (UnsafeRow dense fast path) instead of variable-length gram
    * strings several times their size — the restructure that took the
    * 50 M-doc stress tier from ~36 GB of aggregation spill to ~zero.
    * Collisions would need BOTH independent 64-bit hashes to collide
    * (~2^-128 per pair — no corpus reaches the birthday bound), so the
    * report is the same one the string join produces.
    */
  private def splitGrams(docs: DataFrame, idCol: String, textCol: String,
                         n: Int, trainFrac: Double, valFrac: Double,
                         seed: String): DataFrame =
    assignSplit(docs, idCol, trainFrac, valFrac, seed)
      .select(col(idCol).as("doc_id"), col("split"),
        explode(TF.ngrams(col(textCol), n)).as("ngram"))
      .filter(col("ngram").isNotNull)
      .select(col("doc_id"), col("split"),
        xxhash64(col("ngram")).as("__gh1"),
        xxhash64(col("ngram"), lit(1)).as("__gh2"))

  /** Distinct (doc, split, gram-hash) rows of the non-train side,
    * pre-partitioned on the gram hash so the downstream join needs no
    * further exchange of this side.
    */
  private def evalDistinct(grams: DataFrame): DataFrame =
    grams.filter(col("split") =!= "train")
      .repartition(col("__gh1"))
      .select("doc_id", "split", "__gh1", "__gh2").distinct()

  /** The shared df-cap + inverted-index join tail of both contamination
    * operators — ONE implementation, so the Bloom variant's
    * output-identity contract is structural, not a maintained
    * duplicate. `train` may be Bloom-prefiltered; semantics are
    * unchanged either way (the per-ngram df counts of surviving
    * n-grams are unaffected by dropping whole other n-grams).
    *
    * Exchange discipline: each side is repartitioned on `__gh1` ONCE;
    * every aggregation (per-doc distinct, df count, gram distinct) and
    * the inverted-index join itself then satisfy their distribution
    * from that partitioning and run exchange-free in the same stage.
    * Only the final per-doc count re-shuffles, and it carries just the
    * matched pairs. Train doc ids collapse to a 64-bit hash for the df
    * count (the ids never reach the output; a collision would need two
    * same-hash docs sharing the same 128-bit gram).
    */
  private def contaminationReport(train: DataFrame, nonTrain: DataFrame,
                                  maxNgramDf: Option[Long]): DataFrame = {
    val trainPart = train.repartition(col("__gh1"))
    val trainGrams = maxNgramDf match {
      // the per-doc distinct exists only to make the df count right —
      // the uncapped path goes straight to the gram distinct (one
      // aggregation over the exploded stream, not two)
      case Some(cap) => trainPart
        .select(col("__gh1"), col("__gh2"), xxhash64(col("doc_id")).as("__dh"))
        .distinct()
        .groupBy("__gh1", "__gh2").agg(count(lit(1)).as("__df"))
        .filter(col("__df") <= cap).select("__gh1", "__gh2")
      case None => trainPart.select("__gh1", "__gh2").distinct()
    }
    nonTrain
      .join(trainGrams, Seq("__gh1", "__gh2"))
      // plain count: the left side is already distinct per
      // (doc, split, gram) and trainGrams per gram, so the join
      // cannot duplicate pairs — countDistinct would re-pay the dedup
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** [[crossSplitContamination]] with a Bloom-filter pre-filter on the
    * train side — the 100x form. The exact operator's dominant cost at
    * corpus scale is distinct-ing the TRAIN n-gram stream (train is the
    * 80% side); almost none of those n-grams ever match an eval n-gram.
    * This variant builds a Bloom filter over the distinct eval-side
    * n-grams (driver-held sketch, ~1.2 MB per million n-grams at 1% —
    * the same footprint class as the IVF centroid collect) and drops
    * non-matching train n-grams BEFORE the distinct/df aggregation, so
    * the heavy shuffle carries only probable overlaps.
    *
    * Output is IDENTICAL to [[crossSplitContamination]]: a Bloom filter
    * has no false negatives, and its false positives die in the exact
    * equi-join (they have no eval-side partner) — so the same oracle
    * verifies both, and TrainingOpsSpec asserts equality outright.
    *
    * @param expectedEvalNgrams Bloom sizing; 0 (the default) sizes the
    *                           filter from the OBSERVED distinct
    *                           eval-gram count (one count job over the
    *                           already-materialized eval side — honest
    *                           sizing at any scale). A positive value
    *                           forces that size: overestimating costs
    *                           bits (1.2 MB / million at fpp 0.03),
    *                           underestimating costs extra false
    *                           positives — never correctness.
    *                           Scale boundary (honest): one driver-held
    *                           filter is right while eval-side distinct
    *                           n-grams stay ~<=100 M (~120 MB). Beyond
    *                           that, raise fpp (FPs only add join
    *                           volume), shard the filter by
    *                           `hash(ngram) % k`, or use the exact
    *                           operator — eval sets are benchmarks, so
    *                           in practice this side stays small even
    *                           when train is 100 TB.
    */
  def crossSplitContaminationBloom(docs: DataFrame, idCol: String,
                                   textCol: String, n: Int = 3,
                                   trainFrac: Double = 0.8,
                                   valFrac: Double = 0.1,
                                   seed: String = "split",
                                   maxNgramDf: Option[Long] = Some(1000L),
                                   expectedEvalNgrams: Long = 0L,
                                   bloomFpp: Double = 0.03): DataFrame = {
    val grams = splitGrams(docs, idCol, textCol, n, trainFrac, valFrac, seed)
    // the eval side is cached once — it feeds the filter build, the
    // sizing count, and the report join; distinct rows of fixed-width
    // hashes, a fraction of the raw stream. The ContextCleaner drops
    // the cache when the returned plan (its only reference) is GC'd.
    val eval = evalDistinct(grams).persist()
    // sizing: the observed distinct gram count unless overridden —
    // exchange-free over the cached eval side (same partitioning)
    val nEval =
      if (expectedEvalNgrams > 0L) expectedEvalNgrams
      else math.max(eval.select("__gh1", "__gh2").distinct().count(), 1L)
    // the filter inserts the 64-bit gram hash (the 128-bit pair's
    // first half — a gh1 collision just behaves as one more false
    // positive and dies in the exact join). Coalesce the build to a
    // few partitions: bloom_filter_agg ships one serialized filter
    // buffer PER partition through a single-partition exchange, so at
    // wide parallelism the build would move partitions x filter bytes
    // for no correctness gain.
    val bf = eval.select("__gh1")
      .coalesce(8).stat.bloomFilter("__gh1", nEval, bloomFpp)
    val pre = grams.filter(col("split") === "train")
      .filter(graft.functions.NativeExpressions
        .mightContainLong(col("__gh1"), bf))
    contaminationReport(pre, eval, maxNgramDf)
  }

  /** Snapshot diff between two corpus versions: per document id,
    * whether it was `added`, `removed`, `changed` (content hash
    * differs) or `unchanged`. The audit step between dataset releases —
    * what exactly moved, and how much of the training set a re-run
    * actually touches.
    *
    * One full-outer equi-join on the id; content equality by md5 so
    * the compare moves hashes, not documents, through the join.
    */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    // presence flags, not hash nullness, drive the add/remove branches:
    // a document with NULL text has a null md5 but is still present
    val o = oldDocs.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("__old_hash"), lit(true).as("__in_old"))
    val n = newDocs.select(col(idCol).as("doc_id"),
      md5(col(textCol)).as("__new_hash"), lit(true).as("__in_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("__old_hash") <=> col("__new_hash"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Concat-and-chunk sequence packing: place documents end-to-end in a
    * deterministic pseudo-random order and cut the token stream into
    * `capacity`-sized training bins — the packing scheme LLM
    * pretraining actually uses (documents may straddle bin boundaries;
    * `bin_offset` says where each doc starts inside its first bin).
    *
    * Distribution: the stream is sharded by the first `shardHexChars`
    * hex chars of md5(seed:id) (16^chars independent streams), and the
    * running token total is a window cumsum WITHIN shard — so the only
    * shuffle is the shard exchange and no single reducer ever sees the
    * whole corpus. Bin ids are per-shard; (pack_shard, pack_bin) is the
    * global bin key. At 100 TB, raise `shardHexChars` so one shard's
    * token stream fits a task comfortably (2 chars = 256 shards).
    *
    * Everything is a pure function of (seed, ids, token counts):
    * re-runs, task retries, and external engines reproduce the exact
    * same layout.
    *
    * @param tokenCountCol token count per row (e.g.
    *                      `TextFunctions.tokenCount(col("text"))`)
    */
  /** First-fit-decreasing sequence packing: within each shard,
    * documents are placed whole into the first bin with room, largest
    * first — the packing LLM pipelines use when document INTEGRITY
    * matters more than zero padding. Where [[packSequences]] cuts the
    * concatenated stream at bin boundaries (splitting ~1 doc per bin),
    * FFD splits NOTHING that fits: only documents longer than
    * `capacity` are truncated to it (flagged via `pack_tokens` <
    * token count). The trade is padding: bins are full only up to the
    * best first-fit, so FFD emits slightly more bins.
    *
    * Distribution: same shard scheme as [[packSequences]] (md5 prefix,
    * 16^chars independent shards); each shard's FFD is a sequential
    * in-task pass over its size-sorted rows with an open-bin registry.
    * Per-task memory is O(bins in shard); at 100 TB raise
    * `shardHexChars` so one shard's bin registry stays small — the
    * same knob, same reasoning, as the cumsum form. Deterministic: a
    * pure function of (seed, ids, token counts) — the sort key is
    * (size desc, hash, id), so reruns, retries, and permuted inputs
    * produce the identical layout (TrainingOpsSpec pins it).
    *
    * Output: input columns + `pack_shard`, `pack_bin` (creation order
    * within shard), `pack_tokens` (tokens placed = min(count,
    * capacity)).
    */
  def packSequencesFfd(df: DataFrame, idCol: String, tokenCountCol: Column,
                       capacity: Long, shardHexChars: Int = 1,
                       seed: String = "pack"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(shardHexChars >= 1 && shardHexChars <= 8,
      "shardHexChars must be in [1, 8]")
    val reserved = Seq("__hk", "__ntok", "pack_shard", "pack_bin", "pack_tokens")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"column name $r is reserved by packSequencesFfd"))
    val base = df
      .withColumn("__hk", hashKey(col(idCol), seed))
      .withColumn("__ntok", tokenCountCol.cast("long"))
      .withColumn("pack_shard", substring(col("__hk"), 1, shardHexChars))
    val outSchema = org.apache.spark.sql.types.StructType(
      base.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("pack_bin",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("pack_tokens",
          org.apache.spark.sql.types.LongType)))
    val shardI = base.schema.fieldIndex("pack_shard")
    val ntokI = base.schema.fieldIndex("__ntok")
    val cap = capacity
    base
      .repartition(col("pack_shard"))
      .sortWithinPartitions(col("pack_shard"), col("__ntok").desc,
        col("__hk"), col(idCol))
      .mapPartitions { iter =>
        // per-shard open-bin registry: remaining capacity per bin id.
        // Shards arrive contiguously (sorted); reset at the boundary.
        var shard: String = null
        var remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
        iter.map { row =>
          val s = row.getString(shardI)
          if (s != shard) {
            shard = s
            remaining = scala.collection.mutable.ArrayBuffer.empty[Long]
          }
          val ntok = if (row.isNullAt(ntokI)) 0L else math.max(row.getLong(ntokI), 0L)
          val placed = math.min(ntok, cap)
          var b = 0
          while (b < remaining.length && remaining(b) < placed) b += 1
          if (b == remaining.length) remaining += cap
          remaining(b) -= placed
          org.apache.spark.sql.Row.fromSeq(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(
              Array.tabulate[Any](row.length)(row.get) ++
                Array[Any](b.toLong, placed)))
        }
      }(org.apache.spark.sql.Encoders.row(outSchema))
      .drop("__hk", "__ntok")
  }

  def packSequences(df: DataFrame, idCol: String, tokenCountCol: Column,
                    capacity: Long, shardHexChars: Int = 1,
                    seed: String = "pack"): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    require(shardHexChars >= 1 && shardHexChars <= 8,
      "shardHexChars must be in [1, 8]")
    // output names too: a frame ALREADY carrying pack columns (e.g. a
    // re-pack of packed data) must not have them silently overwritten
    val reserved = Seq("__hk", "__ntok", "__cum",
      "pack_shard", "pack_bin", "bin_offset")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"column name $r is reserved by packSequences"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pack_shard").orderBy(col("__hk"), col(idCol))
    df.withColumn("__hk", hashKey(col(idCol), seed))
      .withColumn("__ntok", tokenCountCol.cast("long"))
      .withColumn("pack_shard", substring(col("__hk"), 1, shardHexChars))
      .withColumn("__cum", sum("__ntok").over(w))
      // integer DIV, not floor(double /): cumulative token counts at
      // corpus scale can pass 2^53, where double division goes inexact
      .withColumn("pack_bin",
        expr(s"(__cum - __ntok) DIV ${capacity}L").cast("long"))
      .withColumn("bin_offset",
        pmod(col("__cum") - col("__ntok"), lit(capacity)))
      .drop("__hk", "__ntok", "__cum")
  }

  /** Temperature-based source mixing: per-source sampling rates
    * proportional to `count^alpha` (normalized so the expected output
    * size is `targetFraction` of the input), the standard recipe for
    * rebalancing a multi-source/multilingual corpus — `alpha = 1`
    * keeps natural proportions, `alpha = 0` equalizes all sources,
    * `alpha = 0.5` (the common default) upsamples the tail without
    * letting any head source dominate. Rates above 1 emit multiple
    * epochs per document (same `epoch` column contract as
    * [[sourceWeightedMix]], which this generalizes by deriving the
    * weights from the observed counts instead of a user map);
    * fractional parts are realized by the same content-addressed
    * md5-threshold acceptance, so assignment is deterministic under
    * retries and corpus growth.
    *
    * Shape at scale: one count aggregation (#sources rows), rate
    * derivation on that tiny frame, broadcast join back, explode —
    * the corpus is never shuffled. Determinism across engines: the
    * per-source weight uses `sqrt` for `alpha = 0.5` (IEEE-exact in
    * every engine, unlike `pow`), the cross-source sums are
    * accumulated in sorted-source order via a running window (double
    * addition is order-sensitive; a plain aggregate would sum in
    * partition order), and the fractional rate becomes an integer
    * 16-bit threshold compared against the row hash — the same
    * mechanism the oracle replays in SQL.
    */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String,
                     alpha: Double = 0.5, targetFraction: Double = 1.0,
                     maxRate: Double = 8.0,
                     seed: String = "tmix"): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha must be in [0, 1], got $alpha")
    require(targetFraction > 0 && targetFraction <= 100,
      s"targetFraction must be in (0, 100], got $targetFraction")
    require(maxRate > 0, "maxRate must be positive")
    val reserved = Seq("epoch", "__n", "__wcum", "__psum", "__ntot",
      "__base", "__th", "__copies")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"column name $r is reserved by temperatureMix"))
    val W = org.apache.spark.sql.expressions.Window
    val nD = col("__n").cast("double")
    val wgt =
      if (alpha == 0.5) sqrt(nD)
      else if (alpha == 1.0) nD
      else if (alpha == 0.0) lit(1.0)
      else pow(nD, lit(alpha))
    val seqW = W.orderBy(sourceCol)
      .rowsBetween(W.unboundedPreceding, W.currentRow)
    val allW = W.partitionBy()
      .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    // rate = min(maxRate, targetFraction * ntot * w_s / sum(w) / n_s),
    // written as a left-associated chain so the oracle's SQL performs
    // bit-identical IEEE operations
    val rate = least(lit(maxRate),
      lit(targetFraction) * col("__ntot").cast("double") * wgt /
        col("__psum") / nD)
    val rates = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__wcum", sum(wgt).over(seqW))
      .withColumn("__psum", max(col("__wcum")).over(allW))
      .withColumn("__ntot", sum(col("__n")).over(allW))
      .select(col(sourceCol), floor(rate).cast("int").as("__base"),
        floor((rate - floor(rate)) * 65536).cast("int").as("__th"))
    df.join(broadcast(rates), Seq(sourceCol))
      .withColumn("__copies", col("__base") +
        (substring(hashKey(col(idCol), seed), 1, 4) <
          format_string("%04x", col("__th"))).cast("int"))
      .withColumn("epoch",
        explode(when(col("__copies") > 0,
          sequence(lit(0), col("__copies") - 1))
          .otherwise(array().cast("array<int>"))))
      .withColumn("epoch", col("epoch").cast("long"))
      .drop("__base", "__th", "__copies")
  }

  /** Select the best documents under a global TOKEN BUDGET: order the
    * pool by (score desc, id) and keep the prefix whose cumulative
    * token count stays ≤ `budget` — the "assemble the highest-quality
    * N-token training set" step that turns a per-document quality
    * score into an actual dataset size decision.
    *
    * Shape at scale — a naive `sum(...) over (order by score)` window
    * is a SINGLE-partition sort at 100 TB; this is the distributed
    * prefix-sum instead: one range exchange (Spark's scalable global
    * sort), one bounded per-partition total aggregation (#partitions
    * rows collected — the IVF-centroid-collect stance), and one
    * map-only pass that adds each partition's driver-prefix offset to
    * its local running total. Partitions whose offset already exceeds
    * the budget emit nothing without being scanned. Token counts are
    * LONGS, so the cumulative sum is exact and partition-boundary
    * independent — the kept set is a pure function of (scores, ids,
    * counts) regardless of parallelism.
    *
    * `scoreCol` must be non-null (order ties across engines are broken
    * by the id; null ordering is engine-specific) and `tokenCountCol`
    * non-negative — both hold for the library's score/count functions.
    *
    * Output: the input columns plus `cum_tokens` (the running total
    * INCLUDING the row), for the kept rows in score order.
    */
  def selectUnderTokenBudget(df: DataFrame, idCol: String,
                             tokenCountCol: Column, scoreCol: Column,
                             budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    val reserved = Seq("__ntok", "__score", "cum_tokens")
    reserved.foreach(r => require(!df.columns.contains(r),
      s"column name $r is reserved by selectUnderTokenBudget"))
    val sorted = df
      .withColumn("__score", scoreCol)
      .withColumn("__ntok", tokenCountCol.cast("long"))
      .orderBy(col("__score").desc_nulls_last, col(idCol))
      .persist()
    val ntokI = sorted.schema.fieldIndex("__ntok")
    def ntokOf(row: org.apache.spark.sql.Row): Long =
      if (row.isNullAt(ntokI)) 0L else math.max(row.getLong(ntokI), 0L)
    // one (index, total) per partition, bounded by the shuffle
    // parallelism; the cache makes the totals pass and the output pass
    // see the same materialized sort (the ContextCleaner drops it with
    // the plan). mapPartitionsWithIndex — NOT TaskContext/
    // spark_partition_id: those report the TASK's partition, which is
    // wrong whenever a downstream coalesce computes several sorted
    // partitions inside one task; the index parameter is bound to the
    // RDD partition at build time and survives any such fusion.
    val rdd = sorted.rdd
    val partTotals = rdd
      .mapPartitionsWithIndex((idx, it) =>
        Iterator(idx -> it.foldLeft(0L)(_ + ntokOf(_))))
      .collect().sortBy(_._1)
    val offsets: Map[Int, Long] = partTotals.map(_._1)
      .zip(partTotals.scanLeft(0L)(_ + _._2)).toMap
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
        "cum_tokens", org.apache.spark.sql.types.LongType))
    val b = budget
    val out = rdd.mapPartitionsWithIndex { (idx, iter) =>
      val start = offsets.getOrElse(idx, 0L)
      if (start > b) Iterator.empty
      else {
        var cum = start
        iter.map { row =>
          cum += ntokOf(row)
          org.apache.spark.sql.Row.fromSeq(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(
              Array.tabulate[Any](row.length)(row.get) :+ (cum: Any)))
          // counts are non-negative, so the running total is monotone:
          // once past the budget the rest of the partition is too
        }.takeWhile(_.getLong(outSchema.length - 1) <= b)
      }
    }
    sorted.sparkSession.createDataFrame(out, outSchema)
      .drop("__score", "__ntok")
  }

  /** The end-to-end training-set assembly: quality filter → exact
    * dedup → leakage-safe split → sequence packing, composed from the
    * individually-oracled stages into one declarative plan. The value
    * over calling the stages by hand is that Catalyst sees ONE plan:
    * the quality score and the dedup hash are computed in the same
    * scan pass, the split filter prunes before the packing shuffle,
    * and the whole thing is TWO exchanges end to end (the dedup
    * window and the pack-shard window, both on md5-uniform keys);
    * every other stage is map-only.
    *
    * Every decision is content-addressed (quality from the text,
    * dedup keeper = min id per content hash, split and pack order
    * from md5(seed, id)), so the assembled set is deterministic under
    * retries, partitioning, and corpus growth — the same properties
    * the stages guarantee individually compose here, and the catalog
    * oracle replays all four stages in one SQL pipeline.
    */
  def assembleTrainingSet(df: DataFrame, idCol: String, textCol: String,
                          minQuality: Double = 0.5,
                          stopwords: Seq[String] = Seq("the", "a"),
                          trainFrac: Double = 0.8, valFrac: Double = 0.1,
                          capacity: Long = 512L): DataFrame = {
    Seq("quality", "__keeper", "split").foreach(r =>
      require(!df.columns.contains(r),
        s"column name $r is reserved by assembleTrainingSet"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol)))
    val scored = df.withColumn("quality",
      round(TF.qualityScoreOf(col(textCol), TF.tokens(col(textCol)),
        stopwords), 6))
      .filter(col("quality") >= minQuality)
    val deduped = scored
      .withColumn("__keeper", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__keeper")).drop("__keeper")
    val train = assignSplit(deduped, idCol, trainFrac, valFrac)
      .filter(col("split") === "train").drop("split")
    packSequences(train, idCol, TF.tokenCount(col(textCol)), capacity)
      .select(col(idCol), col("quality"), col("pack_shard"),
        col("pack_bin"), col("bin_offset"))
  }

  /** Per-group document cap — the C4-style "at most N documents per
    * domain/source" downsampling that stops one over-crawled site from
    * dominating the mixture. Selection within a group is deterministic
    * and content-uniform: rows rank by (md5(orderSalt, id), id) — a
    * seeded content-addressed draw, NOT insertion/crawl order, so the
    * kept subset is a pure function of (ids, seed) and is stable under
    * partitioning, retries, and corpus append order.
    *
    * One exchange keyed on the group column; the rank window runs over
    * that same exchange. Per-group row counts at 100 TB are exactly the
    * skew the cap exists to bound — a pathological group's window sort
    * is external-sort-safe, and the output shrinks it to `maxRows`.
    *
    * Output: input columns plus `grp_rank` (1-based), kept rows only.
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
                  maxRows: Int, orderSalt: String = "cap"): DataFrame = {
    require(maxRows >= 1, s"maxRows must be positive, got $maxRows")
    require(!df.columns.contains("grp_rank"),
      "column name grp_rank is reserved by capPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(concat_ws("|", lit(orderSalt), col(idCol))), col(idCol))
    df.withColumn("grp_rank", row_number().over(w).cast("long"))
      .filter(col("grp_rank") <= maxRows)
  }
}
