package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class TrainingOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (1L to 2000L).map(i => (i, s"doc$i")).toDF("id", "name")

  test("assignSplit covers every row, is deterministic, and tracks fractions") {
    val a = TrainingOps.assignSplit(docs, "id", 0.8, 0.1)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(a.keySet === Set("train", "val", "test"))
    assert(a.values.sum === 2000L)
    // 1/256-granular buckets over 2000 uniform hashes: loose bounds
    assert(a("train") > 1400 && a("train") < 1800, s"train=${a("train")}")
    assert(a("val") > 100 && a("val") < 350, s"val=${a("val")}")
    // deterministic: second run identical per row
    val r1 = TrainingOps.assignSplit(docs, "id").select("id", "split")
      .as[(Long, String)].collect().toSet
    val r2 = TrainingOps.assignSplit(docs, "id").select("id", "split")
      .as[(Long, String)].collect().toSet
    assert(r1 === r2)
  }

  test("a grown corpus never reassigns existing rows (no split leakage)") {
    val base = TrainingOps.assignSplit(docs, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    val grown = docs.union(Seq((9001L, "new1"), (9002L, "new2")).toDF("id", "name"))
    val after = TrainingOps.assignSplit(grown, "id").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(base.forall { case (id, s) => after(id) == s })
  }

  test("boundary fractions: full train split and fraction-1.0 sample keep everything") {
    // trainFrac 1.0 -> threshold 256 must saturate, not format as "100"
    val allTrain = TrainingOps.assignSplit(docs, "id", 1.0, 0.0)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(allTrain === Map("train" -> 2000L))
    // train+val = 1.0 -> val absorbs everything non-train, test empty
    val noTest = TrainingOps.assignSplit(docs, "id", 0.9, 0.1)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(!noTest.contains("test"), s"test split must be empty: $noTest")
    assert(noTest.values.sum === 2000L && noTest("val") > 0)
    // fraction 1.0 -> keep all rows, not the '10000'-prefix ~6%
    assert(TrainingOps.hashSample(docs, "id", 1.0).count() === 2000L)
  }

  test("hashSample keeps a stable, roughly-sized subset") {
    val s1 = TrainingOps.hashSample(docs, "id", 0.25).select("id")
      .as[Long].collect().toSet
    val s2 = TrainingOps.hashSample(docs, "id", 0.25).select("id")
      .as[Long].collect().toSet
    assert(s1 === s2)
    assert(s1.size > 400 && s1.size < 600, s"kept ${s1.size} of 2000")
    // a smaller fraction with the same seed is a subset (nested samples)
    val s3 = TrainingOps.hashSample(docs, "id", 0.1).select("id")
      .as[Long].collect().toSet
    assert(s3.subsetOf(s1))
  }

  test("crossSplitContamination flags the planted leak and only the leak") {
    // ids chosen so the splits differ: 1..40 land in various buckets.
    // Doc 1001's text is copied verbatim from doc 1 — if they land in
    // different splits, the copy must be flagged with every trigram hot.
    val texts = (1L to 60L).map(i =>
      (i, s"unique${i}a unique${i}b unique${i}c unique${i}d"))
    val base = texts.toDF("id", "text")
    val splits = TrainingOps.assignSplit(base, "id")
      .select("id", "split").as[(Long, String)].collect().toMap
    val trainDoc = splits.collectFirst { case (id, "train") => id }.get
    val evalDoc = splits.collectFirst { case (id, s) if s != "train" => id }.get
    val planted = base.withColumn("text",
      when(col("id") === evalDoc,
        concat(lit(s"unique${trainDoc}a unique${trainDoc}b unique${trainDoc}c "),
          col("text")))
        .otherwise(col("text")))
    val report = TrainingOps.crossSplitContamination(
        planted, "id", "text", n = 3, maxNgramDf = None)
      .as[(Long, String, Long)].collect()
    // exactly the planted eval doc, with exactly one shared trigram
    // (unique{t}a unique{t}b unique{t}c)
    assert(report.map(_._1).toSeq === Seq(evalDoc), report.mkString(","))
    assert(report.head._3 === 1L)
    // the df cap drops the hot ngram when capped to zero occurrences
    assert(TrainingOps.crossSplitContamination(
      planted, "id", "text", n = 3, maxNgramDf = Some(0L)).count() === 0L)
  }

  test("crossSplitContaminationBloom equals the exact operator (incl. tiny filters)") {
    // same planted-leak corpus as above; richer texts so the train
    // n-gram stream is non-trivial relative to the eval side
    val texts = (1L to 80L).map(i =>
      (i, s"u${i}a u${i}b u${i}c u${i}d shared${i % 7}x shared${i % 7}y"))
    val base = texts.toDF("id", "text")
    def sortedRows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val exact = sortedRows(TrainingOps.crossSplitContamination(
      base, "id", "text", n = 3, maxNgramDf = None))
    // a deliberately UNDERSIZED filter (high false-positive rate) must
    // still be exact — FPs die in the join, FNs cannot exist
    Seq(1000000L, 8L).foreach { sizing =>
      val bloom = sortedRows(TrainingOps.crossSplitContaminationBloom(
        base, "id", "text", n = 3, maxNgramDf = None,
        expectedEvalNgrams = sizing))
      assert(bloom === exact, s"bloom variant diverged at sizing=$sizing")
    }
    // df-cap path goes through the same pre-filter
    assert(TrainingOps.crossSplitContaminationBloom(
      base, "id", "text", n = 3, maxNgramDf = Some(0L)).count() === 0L)
  }

  test("sourceWeightedMix: integer epochs exact, fractional parts deterministic") {
    val docs = (1L to 400L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val mixed = TrainingOps.sourceWeightedMix(docs, "id", "source",
      Map("src0" -> 3.0, "src1" -> 0.5, "src2" -> 0.0))
    val bySrc = mixed.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(bySrc("src0") === 300L, "weight 3.0 = exactly 3 epochs each")
    assert(!bySrc.contains("src2"), "weight 0.0 drops the source entirely")
    assert(bySrc("src3") === 100L, "unlisted source keeps default weight 1.0")
    // fractional: ~half of 100 docs, deterministic across runs
    assert(bySrc("src1") > 25L && bySrc("src1") < 75L, bySrc.toString)
    val again = TrainingOps.sourceWeightedMix(docs, "id", "source",
      Map("src0" -> 3.0, "src1" -> 0.5, "src2" -> 0.0))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again === bySrc, "mixture must be deterministic")
    // epoch tags: weight-3 docs carry epochs 0,1,2
    val epochs = mixed.filter(col("source") === "src0")
      .filter(col("id") === 4L).select("epoch").as[Long].collect().sorted
    assert(epochs.toSeq === Seq(0L, 1L, 2L))
    // a weight-2.5 source emits 2 or 3 copies per doc, never else
    val frac = TrainingOps.sourceWeightedMix(docs, "id", "source",
      Map("src0" -> 2.5))
      .filter(col("source") === "src0")
      .groupBy("id").count().as[(Long, Long)].collect()
    assert(frac.forall(c => c._2 == 2L || c._2 == 3L))
    assert(frac.exists(_._2 == 2L) && frac.exists(_._2 == 3L))
  }

  test("temperatureMix: alpha rebalances toward the tail, deterministically") {
    // 800 head docs vs 100+100 tail docs
    val docs = ((1L to 800L).map(i => (i, "head")) ++
      (801L to 900L).map(i => (i, "tailA")) ++
      (901L to 1000L).map(i => (i, "tailB"))).toDF("id", "source")
    val mixed = TrainingOps.temperatureMix(docs, "id", "source",
      alpha = 0.5, targetFraction = 1.0)
    val bySrc = mixed.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // sqrt weights: 28.28 / 10 / 10 -> rates 1000*w/(48.28*n):
    // head ~0.732, tails ~2.071 — the tail is upsampled, head trimmed
    assert(bySrc("head") < 800L, s"head must be downsampled: $bySrc")
    assert(bySrc("tailA") > 150L && bySrc("tailA") < 250L, bySrc.toString)
    assert(bySrc("tailB") > 150L && bySrc("tailB") < 250L, bySrc.toString)
    // expected total preserved within sampling noise
    val total = bySrc.values.sum
    assert(total > 900L && total < 1100L, s"total=$total")
    // rate ~2.07: every tail doc emits 2 or 3 epochs, never else
    val perDoc = mixed.filter(col("source") === "tailA")
      .groupBy("id").count().as[(Long, Long)].collect()
    assert(perDoc.forall(c => c._2 == 2L || c._2 == 3L), "tail rate band")
    // deterministic across runs
    val again = TrainingOps.temperatureMix(docs, "id", "source",
      alpha = 0.5, targetFraction = 1.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again === bySrc)
    // alpha = 1 keeps natural proportions exactly (rate 1.0 for all)
    val natural = TrainingOps.temperatureMix(docs, "id", "source",
      alpha = 1.0, targetFraction = 1.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(natural === Map("head" -> 800L, "tailA" -> 100L,
      "tailB" -> 100L))
    // alpha = 0 equalizes expected source shares
    val eq = TrainingOps.temperatureMix(docs, "id", "source",
      alpha = 0.0, targetFraction = 1.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    // each source expects 1000/3 ~ 333 rows
    assert(eq.values.forall(c => c > 250L && c < 420L), eq.toString)
    // maxRate caps a vanishing source's blow-up
    val capped = TrainingOps.temperatureMix(docs, "id", "source",
      alpha = 0.0, targetFraction = 3.0, maxRate = 2.0)
      .filter(col("source") === "tailA")
      .groupBy("id").count().as[(Long, Long)].collect()
    assert(capped.forall(_._2 == 2L), "maxRate must cap epochs at 2")
  }

  test("corpusDiff labels added/removed/changed/unchanged correctly") {
    val v1 = Seq((1L, "same"), (2L, "will change"), (3L, "will vanish"))
      .toDF("id", "text")
    val v2 = Seq((1L, "same"), (2L, "changed!"), (4L, "brand new"))
      .toDF("id", "text")
    val got = TrainingOps.corpusDiff(v1, v2, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("corpusDiff: null text means present-with-null-content, not absent") {
    val v1 = Seq((1L, Option.empty[String]), (2L, Option.empty[String]),
      (3L, Some("text"))).toDF("id", "text")
    val v2 = Seq((1L, Option.empty[String]), (3L, Option.empty[String]))
      .toDF("id", "text")
    val got = TrainingOps.corpusDiff(v1, v2, "id", "text")
      .as[(Long, String)].collect().toMap
    // null==null content is unchanged; null-text rows still count as
    // present (2 removed, not 'added'); text->null is a change
    assert(got === Map(1L -> "unchanged", 2L -> "removed", 3L -> "changed"))
  }

  test("packSequencesFfd: capacity invariant, no doc loss, determinism, less splitting") {
    import org.apache.spark.sql.functions._
    val capacity = 100L
    // sizes from tiny to oversized (150 > capacity)
    val docs = (1L to 500L).map(i => (i, 5L + (i * 7919) % 146))
      .toDF("id", "n_tok")
    val packed = TrainingOps.packSequencesFfd(
      docs, "id", col("n_tok"), capacity, shardHexChars = 1)
    val rows = packed.select("id", "n_tok", "pack_shard", "pack_bin", "pack_tokens")
      .as[(Long, Long, String, Long, Long)].collect()

    // no doc lost or duplicated
    assert(rows.map(_._1).sorted.toSeq === (1L to 500L))
    // capacity invariant per (shard, bin)
    rows.groupBy(r => (r._3, r._4)).foreach { case (bin, rs) =>
      assert(rs.map(_._5).sum <= capacity, s"bin $bin over capacity")
    }
    // only oversized docs are truncated, and exactly to capacity
    rows.foreach { case (id, n, _, _, placed) =>
      if (n <= capacity) assert(placed === n, s"doc $id split despite fitting")
      else assert(placed === capacity, s"oversized doc $id not truncated to cap")
    }
    // deterministic under input permutation
    val shuffled = TrainingOps.packSequencesFfd(
      docs.orderBy(rand(42)), "id", col("n_tok"), capacity, shardHexChars = 1)
      .select("id", "pack_shard", "pack_bin", "pack_tokens")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(shuffled === rows.map(r => (r._1, r._3, r._4, r._5)).sortBy(_._1).toSeq)

    // strictly fewer broken documents than concat-and-chunk on the
    // same corpus: chunking splits any doc straddling a bin boundary
    val chunked = TrainingOps.packSequences(
      docs, "id", col("n_tok"), capacity, shardHexChars = 1)
      .select("id", "n_tok", "bin_offset").as[(Long, Long, Long)].collect()
    val chunkSplit = chunked.count { case (_, n, off) => off + n > capacity }
    val ffdSplit = rows.count { case (_, n, _, _, placed) => placed < n }
    assert(ffdSplit < chunkSplit,
      s"FFD split $ffdSplit docs, chunking split $chunkSplit")
  }

  test("packSequences matches a sequential re-pack of each shard") {
    val rnd = new scala.util.Random(7)
    val corpus = (1L to 500L)
      .map(i => (i, rnd.nextInt(200) + 1)).toDF("id", "n_tok")
    val packed = TrainingOps.packSequences(corpus, "id", col("n_tok"),
        capacity = 512, shardHexChars = 1)
      .select("id", "n_tok", "pack_shard", "pack_bin", "bin_offset")
      .as[(Long, Int, String, Long, Long)].collect()

    // reference: per shard, order by (md5 key, id), running total
    val md = java.security.MessageDigest.getInstance("MD5")
    def hk(id: Long): String =
      md.digest(s"pack:$id".getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
    val byShard = packed.groupBy(_._3)
    byShard.foreach { case (shard, rows) =>
      var cum = 0L
      rows.sortBy(r => (hk(r._1), r._1)).foreach {
        case (id, nTok, s, bin, off) =>
          assert(s.length === 1 && hk(id).startsWith(s))
          assert(bin === cum / 512, s"doc $id in shard $shard")
          assert(off === cum % 512, s"doc $id in shard $shard")
          cum += nTok
      }
    }
    // every document packed exactly once
    assert(packed.map(_._1).toSet === (1L to 500L).toSet)
  }

  test("stratifiedHashSample applies per-stratum fractions deterministically") {
    val strata = (1L to 3000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "es" else "fr"))
      .toDF("id", "lang")
    val kept = TrainingOps.stratifiedHashSample(strata, "id", "lang",
        Map("en" -> 0.5, "es" -> 0.1), defaultFraction = 1.0)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(kept("fr") === 1000L, "default fraction 1.0 must keep everything")
    assert(kept("en") > 400 && kept("en") < 600, s"en=${kept("en")}")
    assert(kept("es") > 50 && kept("es") < 160, s"es=${kept("es")}")
    // same hash as hashSample: the en stratum IS hashSample(0.5) on it
    val enOnly = strata.filter(col("lang") === "en")
    val viaPlain = TrainingOps.hashSample(enOnly, "id", 0.5)
      .select("id").as[Long].collect().toSet
    val viaStrat = TrainingOps.stratifiedHashSample(enOnly, "id", "lang",
        Map("en" -> 0.5)).select("id").as[Long].collect().toSet
    assert(viaStrat === viaPlain)
  }

  test("weightedSample: k rows, deterministic, non-positive weights excluded") {
    val w = (1L to 100L).map(i => (i, if (i <= 5) 0L else i)).toDF("id", "w")
    val a = TrainingOps.weightedSample(w, "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    val b = TrainingOps.weightedSample(w, "id", "w", k = 10)
      .select("id").as[Long].collect().toSeq
    assert(a === b, "same seed must reproduce the sample")
    assert(a.length === 10)
    assert(a.forall(_ > 5L), s"zero-weight rows can never be drawn, got $a")
  }

  test("weightedSample draws proportionally to weight (ES property, k=1)") {
    // two rows with weights 3:1 — across independent seeds the heavy
    // row must win ~75% of the time (binomial, 400 trials, ±5 sigma)
    val two = Seq((1L, 3.0), (2L, 1.0)).toDF("id", "w")
    val wins = (1 to 400).count { s =>
      TrainingOps.weightedSample(two, "id", "w", k = 1, seed = s"t$s")
        .select("id").as[Long].head() == 1L
    }
    // E=300, sigma=sqrt(400*0.75*0.25)~8.7 -> [256, 344]
    assert(wins > 256 && wins < 344,
      s"heavy row won $wins/400, expected ~300 — the key is not ln(u)/w")
  }

  test("weightedSample plans as per-partition heaps, never a global sort") {
    val w = (1L to 100L).map(i => (i, i)).toDF("id", "w")
    val p = TrainingOps.weightedSample(w, "id", "w", k = 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("Exchange hashpartitioning"),
      "weighted sampling must not shuffle the corpus")
  }

  test("deterministicShuffle is a stable permutation that varies by seed") {
    val p1 = TrainingOps.deterministicShuffle(docs, "id", "epoch0")
      .select("id").as[Long].collect().toSeq
    val p2 = TrainingOps.deterministicShuffle(docs, "id", "epoch0")
      .select("id").as[Long].collect().toSeq
    val p3 = TrainingOps.deterministicShuffle(docs, "id", "epoch1")
      .select("id").as[Long].collect().toSeq
    assert(p1 === p2)
    assert(p1 !== p3, "different seeds must give different permutations")
    assert(p1.sorted === (1L to 2000L))
    assert(p3.sorted === (1L to 2000L))
  }

  test("assignSplitByCluster: clusters move as one unit, singletons unchanged") {
    val docs = (1L to 500L).toDF("doc_id")
    // two clusters: {10,11,12} (canonical 10) and {200,201} (canonical 200)
    val labels = Seq((10L, 10L), (11L, 10L), (12L, 10L),
      (200L, 200L), (201L, 200L)).toDF("id", "label")
    val got = TrainingOps.assignSplitByCluster(docs, "doc_id", labels)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(Set(got(10L), got(11L), got(12L)).size === 1,
      "cluster members must share a split")
    assert(Set(got(200L), got(201L)).size === 1)
    // the cluster's split is the canonical member's plain assignment
    val plain = TrainingOps.assignSplit((1L to 500L).toDF("doc_id"), "doc_id")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(got(11L) === plain(10L) && got(201L) === plain(200L))
    // unclustered docs are assigned exactly as assignSplit would
    val unclustered = got.keySet -- Set(10L, 11L, 12L, 200L, 201L)
    assert(unclustered.forall(id => got(id) === plain(id)))
  }

  // ------------------------------------------------ token-budget select

  private def budgetPool = Seq(
    // (id, score, n_tokens) — ties on score broken by id
    (1L, 0.9, 100L), (2L, 0.9, 50L), (3L, 0.8, 200L),
    (4L, 0.7, 100L), (5L, 0.6, 300L), (6L, 0.5, 10L)
  ).toDF("id", "score", "n_tokens")

  private def runBudget(b: Long, pool: org.apache.spark.sql.DataFrame = budgetPool) =
    TrainingOps.selectUnderTokenBudget(pool, "id", col("n_tokens"),
      col("score"), budget = b)
      .select("id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1)

  test("selectUnderTokenBudget keeps the exact score-ordered prefix") {
    // order: 1 (cum 100), 2 (150), 3 (350), 4 (450), 5 (750), 6 (760)
    assert(runBudget(450L).toSeq ===
      Seq((1L, 100L), (2L, 150L), (3L, 350L), (4L, 450L)))
    // inclusive boundary: a row landing exactly on the budget is kept
    assert(runBudget(449L).toSeq === Seq((1L, 100L), (2L, 150L), (3L, 350L)))
    assert(runBudget(0L).isEmpty)
    assert(runBudget(100000L).length === 6)
  }

  test("selectUnderTokenBudget is partition- and coalesce-independent") {
    val want = runBudget(450L).toSeq
    // input parallelism must not change the kept set or the cum values
    assert(runBudget(450L, budgetPool.repartition(7)).toSeq === want)
    assert(runBudget(450L, budgetPool.coalesce(1)).toSeq === want)
    // the Verify shape: a DOWNSTREAM coalesce(1) fuses the sorted
    // partitions into one task — partition offsets must still apply
    // (TaskContext.getPartitionId would see a single task here)
    val fused = TrainingOps.selectUnderTokenBudget(budgetPool, "id",
      col("n_tokens"), col("score"), budget = 450L)
      .coalesce(1)
      .select("id", "cum_tokens").as[(Long, Long)].collect().sortBy(_._1)
    assert(fused.toSeq === want)
  }

  test("selectUnderTokenBudget cumulative totals are globally exact") {
    // 2000 docs, token count = id: global cum for id k (score constant,
    // order by id) = k(k+1)/2; budget 500500 keeps exactly 1000 docs
    val pool = (1L to 2000L).map(i => (i, 1.0, i)).toDF("id", "score", "n_tokens")
    val got = runBudget(1000L * 1001L / 2L, pool)
    assert(got.length === 1000)
    assert(got.forall { case (id, cum) => cum === id * (id + 1) / 2 })
  }

  test("capPerGroup keeps exactly maxRows per group, dense ranks") {
    val df = (1L to 100L).map(i => (i, "s" + (i % 3))).toDF("id", "src")
    val got = TrainingOps.capPerGroup(df, "src", "id", maxRows = 10)
      .select("src", "grp_rank").as[(String, Long)].collect()
    assert(got.length === 30)
    got.groupBy(_._1).foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (1L to 10L), s"group $src") }
    // under-cap group passes through whole
    val small = Seq((1L, "only"), (2L, "only")).toDF("id", "src")
    assert(TrainingOps.capPerGroup(small, "src", "id", 10).count() === 2L)
  }

  test("capPerGroup selection is content-addressed: stable under partitioning and append order") {
    val df = (1L to 100L).map(i => (i, "g")).toDF("id", "src")
    def kept(d: org.apache.spark.sql.DataFrame): Set[Long] =
      TrainingOps.capPerGroup(d, "src", "id", 15)
        .select("id").as[Long].collect().toSet
    val base = kept(df)
    assert(base.size === 15)
    assert(kept(df.repartition(13)) === base)
    assert(kept(df.orderBy(org.apache.spark.sql.functions.col("id").desc)) === base)
    // appending new rows cannot evict differently-ordered survivors
    // arbitrarily: the md5 rank of existing ids is unchanged, so the
    // kept set only changes where new ids out-rank old ones
    val more = (1L to 120L).map(i => (i, "g")).toDF("id", "src")
    val grown = kept(more)
    assert(grown.size === 15)
    // seeds differ -> different draw
    val other = TrainingOps.capPerGroup(df, "src", "id", 15, orderSalt = "x")
      .select("id").as[Long].collect().toSet
    assert(other !== base, "salt must re-key the draw")
  }
}
