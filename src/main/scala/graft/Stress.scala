package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness for the 100 TB-posture tier: runs the
  * dedup / ANN / packing operators on a synthetic multi-million-row
  * corpus (deterministically generated from `spark.range` — no test
  * fixture is large enough to exercise these paths) and reports
  * wall-times plus the LARGEST single-stage shuffle, the number that
  * says whether a plan would survive a 100x scale-up.
  *
  * What it proves beyond the sf0.01/sf0.1 oracle gates:
  *  - `minhashCandidatePairs` at 5 M docs produces a >1 M-row pair set,
  *    which pushes `duplicateClusters` past `driverThreshold` and down
  *    the DISTRIBUTED min-label-propagation path (the only tier the
  *    oracled queries never reach) — and that path must CONVERGE.
  *  - `cosineDupePairsLsh` and `ivfTopK` at 1 M vectors: the shuffles
  *    stay keyed on (band, bucket) / cell ids — max stage shuffle must
  *    stay orders of magnitude below corpus-vector volume.
  *  - `packSequences` with `shardHexChars = 2` (256 independent cumsum
  *    shards): the documented knob for keeping one shard's stream
  *    inside a task at scale.
  *
  * Corpus shape: the first `4 * nDocs/16` documents form groups of 4
  * exact duplicates (clusters the CC step must label transitively);
  * the rest are unique. Vectors: the first fifth form identical pairs
  * (near-dup planted signal), the rest are pseudo-random on [-1, 1]^64.
  * Everything derives from xxhash64(id) — re-runs are bit-identical.
  *
  * Output: one JSON line per phase to stdout, full report to
  * `SPARK_GRAFT_STRESS_OUT` (default STRESS.json). Sizing knobs:
  * `SPARK_GRAFT_STRESS_DOCS` (default 5 M), `SPARK_GRAFT_STRESS_VECS`
  * (default 1 M). Run with `SPARK_DRIVER_MEM=48g` (build.sbt wires the
  * env var into -Xmx).
  */
object Stress {

  /** Accumulates, since the last reset: the largest per-stage shuffle
    * read/write, total memory/disk spill, and the per-task duration
    * spread of the heaviest stage (max/median — the number that says
    * whether a hot key serialized the stage). Listener delivery is
    * async; [[snapshot]] sleeps briefly so the final stage's completion
    * event lands first.
    */
  private class PhaseMetricsListener extends SparkListener {
    @volatile var maxWrite = 0L
    @volatile var maxRead = 0L
    @volatile var memSpill = 0L
    @volatile var diskSpill = 0L
    private val taskMs =
      scala.collection.concurrent.TrieMap.empty[Int, scala.collection.mutable.ArrayBuffer[Long]]
    private val stageNames =
      scala.collection.concurrent.TrieMap.empty[Int, String]
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stageNames(e.stageInfo.stageId) = e.stageInfo.name + " || " +
        e.stageInfo.details.linesIterator
          .filter(_.contains("graft")).take(3).mkString(" <- ")
      val m = e.stageInfo.taskMetrics
      if (m != null) {
        maxWrite = math.max(maxWrite, m.shuffleWriteMetrics.bytesWritten)
        maxRead = math.max(maxRead, m.shuffleReadMetrics.totalBytesRead)
        memSpill += m.memoryBytesSpilled
        diskSpill += m.diskBytesSpilled
      }
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      if (e.taskInfo != null)
        taskMs.getOrElseUpdate(e.stageId,
          scala.collection.mutable.ArrayBuffer.empty[Long]) += e.taskInfo.duration
    def reset(): Unit = synchronized {
      maxWrite = 0L; maxRead = 0L; memSpill = 0L; diskSpill = 0L
      taskMs.clear()
      stageNames.clear()
    }
    /** (maxWrite, maxRead, memSpill, diskSpill, maxOverMedian): the
      * spread is the WORST max/median task-time ratio over stages with
      * >= 4 tasks whose slowest task ran >= 1 s — i.e. "did any
      * substantial stage serialize on a hot key". (Taking only the
      * heaviest-total stage would hide a skewed join behind a balanced
      * downstream aggregate of the same phase.)
      */
    /** Worst-spread stage's name, set by [[snapshot]] — lands in the
      * phase JSON so a committed spread number carries its own
      * attribution instead of needing a debug re-run.
      */
    @volatile var spreadStage: String = ""
    def snapshot(): (Long, Long, Long, Long, Double) = {
      Thread.sleep(500)
      val debug = sys.env.contains("SPARK_GRAFT_STRESS_DEBUG")
      var worstStage = ""
      var worst = 1.0
      taskMs
        .filter { case (_, ds) => ds.size >= 4 && ds.max >= 1000L }
        .foreach { case (sid, ds) =>
          val sorted = ds.toArray.sorted
          val med = sorted(sorted.length / 2)
          // a sub-100ms median means the stage was cheap everywhere
          // except scheduling noise — a huge ratio there is not skew
          if (med >= 100L) {
            val ratio = sorted.last.toDouble / med
            if (debug && ratio >= 1.5) println(
              f"[stress-debug] stage $sid%-5d tasks=${ds.size}%-4d " +
                f"med=${med}ms max=${sorted.last}ms ratio=$ratio%.1f  " +
                stageNames.getOrElse(sid, "?"))
            if (ratio > worst) {
              worst = ratio
              worstStage = stageNames.getOrElse(sid, "?")
                .takeWhile(_ != '|').trim
            }
          }
        }
      spreadStage = worstStage
      (maxWrite, maxRead, memSpill, diskSpill, worst)
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_STRESS_DOCS", "5000000").toLong
    val nVecs = sys.env.getOrElse("SPARK_GRAFT_STRESS_VECS", "1000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_STRESS_OUT", "STRESS.json")
    val dim = 64
    // Shuffle partitions scale with the corpus, exactly as a cluster
    // job sizes reducers to the data rather than the core count: a
    // fixed 32 at the 50 M-doc tier put ~15 M exploded n-grams into
    // every final-aggregate partition and turned the contamination
    // distinct and the banded-join sort memory-shaped (~100 GB spill).
    // Tier-1 sizing (5 M docs / 1 M vecs) resolves to `cpus`, keeping
    // the canonical STRESS.json comparable across rounds; AQE (on by
    // default) coalesces the small stages back down.
    val shufflePartitions = math.max(cpus.toInt,
      math.min(2048L, nDocs / 500000L + nVecs / 250000L).toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      // top-k UDAF buffers are k-bounded: keep ObjectHashAggregate
      // hash-based past the 128-key default (see TopKAggregator scaladoc)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("SPARK_GRAFT_OHA_THRESHOLD", "131072"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new PhaseMetricsListener
    spark.sparkContext.addSparkListener(listener)

    // optional comma-separated phase filter (substring match) — lets a
    // rerun isolate or bisect phases without editing the harness.
    // Mild dependencies: contamination_bloom checks against
    // contamination_exact's digest, so select them together
    val onlyPhases = sys.env.get("SPARK_GRAFT_STRESS_PHASES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val report = scala.collection.mutable.ArrayBuffer.empty[String]
    def phase(name: String)(body: => (Long, String)): Unit = {
      if (onlyPhases.exists(ps => !ps.exists(name.contains))) return
      listener.reset()
      val t0 = System.nanoTime()
      val (rows, extra) = body
      val sec = (System.nanoTime() - t0) / 1e9
      // nudge the ContextCleaner: shuffle files of a finished phase are
      // only deleted once their RDDs are GC'd — at tier-2 sizing the
      // accumulated map outputs of three ANN phases can exceed local
      // disk before any of them becomes garbage on its own
      System.gc()
      val (w, r, mem, disk, spread) = listener.snapshot()
      val line = f"""{"phase":"$name","rows":$rows,"sec":$sec%.2f,""" +
        f""""max_stage_shuffle_write_mb":${w / 1e6}%.1f,""" +
        f""""max_stage_shuffle_read_mb":${r / 1e6}%.1f,""" +
        f""""memory_spill_mb":${mem / 1e6}%.1f,""" +
        f""""disk_spill_mb":${disk / 1e6}%.1f,""" +
        f""""task_time_max_over_median":$spread%.1f,""" +
        s""""spread_stage":"${listener.spreadStage.replace("\"", "'")}"""" +
        s"""$extra}"""
      println(s"[stress] $line")
      report += line
    }

    // ---------------------------------------------------- synthesis
    // Documents: 12 hex "words" per doc derived from a content seed.
    // Docs with id < nDupDocs share a seed within groups of 4 (exact
    // duplicates); the rest are unique. Seed ranges cannot collide:
    // group seeds < nDocs/4 <= unique-doc seeds (their own id).
    val nDupDocs = (nDocs / 16) * 4 // groups of 4 -> 6 pairs per group
    val docSeed = when(col("id") < nDupDocs, col("id").divide(4).cast("long"))
      .otherwise(col("id") + 10000000000L)
    val words = (0 until 12).map(i => hex(xxhash64(col("__seed"), lit(i))))
    val docs = spark.range(nDocs).toDF("id")
      .withColumn("__seed", docSeed)
      .withColumn("text", concat_ws(" ", words: _*))
      .drop("__seed")
      .persist()
    // Vectors: pseudo-random doubles on [-1, 1]; id < nVecs/5 share a
    // seed within pairs (identical vectors -> planted cosine-1.0 dups).
    val nDupVecs = (nVecs / 10) * 2
    val vecSeed = when(col("vec_id") < nDupVecs,
        col("vec_id").divide(2).cast("long"))
      .otherwise(col("vec_id") + 10000000000L)
    val vecs = spark.range(nVecs).toDF("vec_id")
      .withColumn("__seed", vecSeed)
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)),
          j => pmod(xxhash64(col("__seed"), j), lit(2000001L))
            .cast("double") / 1000000.0 - 1.0).cast("array<float>"))
      .drop("__seed")
      .persist()
    phase("synth") {
      (docs.count() + vecs.count(), s""","docs":$nDocs,"vecs":$nVecs""")
    }

    // Vector phases run FIRST, then the doc phases. Empirically this
    // JVM-level ordering matters far more than cache residency: after
    // the minhash phase has pushed tens of millions of rows through the
    // shared ArrayData accessor call sites, the JIT treats the ANN hot
    // loops as megamorphic and ivf_ann degrades up to 8x (observed
    // 20-41 s isolated or vectors-first vs 142-191 s when run after
    // minhash, with identical shuffle volumes). A real cluster never
    // sees this — each application/executor JVM profiles its own job —
    // but a one-JVM harness must order around it to report numbers
    // that mean anything.
    // ------------------------------------------- cosine near-dup (LSH)
    // bitsPerBand ~ log2(nVecs) per the operator's own sizing note —
    // computed from the actual corpus size, not hardcoded: at 10 M
    // vectors a 20-bit band holds ~10 random vectors per bucket and the
    // in-bucket quadratic explodes ~40x (the first tier-2 attempt
    // filled local disk exactly this way; the knob IS the scale lever)
    val srpBits = math.max(18,
      (math.log(nVecs.toDouble) / math.log(2.0)).ceil.toInt + 2)
    phase("cosine_lsh") {
      val dupes = operators.SimilaritySearch.cosineDupePairsLsh(
        vecs, "vec_id", "embedding", threshold = 0.95,
        bands = 8, bitsPerBand = srpBits, maxDim = dim)
      (dupes.count(), s""","bits_per_band":$srpBits""")
    }

    // ------------------------------------------------------- IVF ANN
    // nCells grows with the corpus (classic IVF: ~sqrt(N), here
    // corpus/40k capped to [64, 1024]) so per-cell candidate lists —
    // and with them the probe-side scored stream into the top-k —
    // stay bounded as the corpus scales; a fixed 64 cells at 10 M
    // vectors fans 640 M scored rows into the aggregate
    val nCells = math.max(64, math.min(1024, (nVecs / 40000).toInt))
    phase("ivf_ann") {
      val hits = operators.SimilaritySearch.ivfTopK(
        vecs.filter(col("vec_id") < 1024), vecs, "vec_id", "embedding",
        k = 10, nCells = nCells, nProbe = 4)
      (hits.count(), s""","n_cells":$nCells""")
    }

    // ------------------------------------------------------- graph ANN
    // the serving-shape path: routing set sized like an IVF cell count
    // that IVF could no longer brute-scan per row (graph descent costs
    // O(ef*m*dim) per row vs IVF's O(nNodes*dim)); beam-LIMITED ef —
    // the realistic tier, not the oracle's exhaustive one. Planted
    // twins have IDENTICAL vectors, so twin pairs route to the same
    // node regardless of beam width: every probe's top-1 must be its
    // twin, same exactness bar as quantized_ann
    val gNodes = math.max(256, math.min(4096, (nVecs / 10000).toInt))
    phase("graph_ann") {
      val hits = operators.GraphAnn.graphTopK(
        vecs.filter(col("vec_id") < 1024), vecs, "vec_id", "embedding",
        k = 10, nNodes = gNodes, m = 8, nProbe = 4, ef = 64)
      val twinsFound = hits.filter(col("rank") === 1)
        .filter(col("neighbor_id") ===
          col("probe_id").bitwiseXOR(lit(1L))).count()
      require(twinsFound == 1024,
        s"graph top-1 must be the planted twin for all 1024 probes, got $twinsFound")
      (hits.count(), s""","n_nodes":$gNodes,"twins_found":$twinsFound""")
    }

    // -------------------------------------- distributed graph build
    // The corpus-scale NSW index build (GraphAnnDist): 1 M nodes in
    // 1,024 planted clusters, every member of a cluster carrying the
    // IDENTICAL vector — so (a) assignment must route each node to its
    // own cluster's centroid (ids 0..1023, one per cluster, are the
    // lowest-id quantizer), and (b) all within-cell cosines tie at 1
    // and neighbor selection degenerates to pure ordinal tie-breaking:
    // the node at within-cell rank r (id = cell + r*1024) must link
    // forward to EXACTLY ranks 0..min(m,r)-1. That pins the entire
    // 16 M-row edge list in closed form: per-cell forward counts, a
    // zero-violation dst-rank bound, per-source forward degrees, and
    // the stitch tier (entries = the centroids themselves) — any
    // assignment slip, dropped edge, or tie-break drift breaks a bar.
    // The only exchange is the one corpus-sized groupBy; per-cell work
    // is executor-local O(|cell|^2 * dim).
    val gdNodes = sys.env.getOrElse("SPARK_GRAFT_STRESS_GANN_NODES",
      "1000000").toLong
    phase("graph_ann_dist_build") {
      val kc = 1024
      val gm = 8
      val gmc = 2
      val cluster = pmod(col("id"), lit(kc.toLong))
      val corpus = spark.range(gdNodes).toDF("id")
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)), j =>
            (pmod(xxhash64(cluster, j), lit(2000001L)).cast("double")
              / 1000000.0 - 1.0))
          .cast("array<float>"))
      val edges = operators.GraphAnnDist.buildIndex(corpus, "id",
        "embedding", nCells = kc, m = gm, mCells = gmc,
        maxCellSize = 4096).persist()
      // closed-form expectations
      def fwdOf(s: Long, m: Long): Long =
        if (s <= 1) 0L
        else if (s - 1 <= m) (s - 1) * s / 2
        else m * (s - 1) - m * (m - 1) / 2
      val s0 = gdNodes / kc
      val rem = gdNodes % kc
      val expWithin = 2L * (rem * fwdOf(s0 + 1, gm) +
        (kc - rem) * fwdOf(s0, gm))
      val expStitch = 2L * fwdOf(kc.toLong, gmc.toLong)
      val within = pmod(col("src_id"), lit(kc.toLong)) ===
        pmod(col("dst_id"), lit(kc.toLong))
      val a = edges.agg(
        count(lit(1)).as("total"),
        sum(when(!within, 1L).otherwise(0L)).as("stitch"),
        // same-cluster ids order by within-cell rank (id DIV kc):
        // every forward edge must land on a rank < m target
        sum(when(within && col("src_id") > col("dst_id") &&
          expr(s"dst_id DIV $kc") >= gm, 1L).otherwise(0L)).as("bad_rank"),
        // stitch edges connect cell ENTRIES = the centroids (ids < kc)
        sum(when(!within && (col("src_id") >= kc || col("dst_id") >= kc),
          1L).otherwise(0L)).as("bad_entry")).head()
      require(a.getLong(0) == expWithin + expStitch &&
          a.getLong(1) == expStitch && a.getLong(2) == 0L &&
          a.getLong(3) == 0L,
        s"planted NSW structure broken: total=${a.getLong(0)} " +
          s"(want ${expWithin + expStitch}), stitch=${a.getLong(1)} " +
          s"(want $expStitch), bad_rank=${a.getLong(2)}, " +
          s"bad_entry=${a.getLong(3)}")
      // per-source forward degree must be EXACTLY min(m, rank)
      val badDeg = edges.filter(within && col("src_id") > col("dst_id"))
        .groupBy("src_id").agg(count(lit(1)).as("c"))
        .filter(col("c") =!=
          least(lit(gm.toLong), expr(s"src_id DIV $kc"))).count()
      require(badDeg == 0L, s"$badDeg sources with wrong forward degree")

      // --- SEARCH recall bar, beam-LIMITED (the serving shape, not
      // the oracle's exhaustive one): probes are corpus members, so
      // each probe's true neighbor set IS its own planted cluster
      // (identical vectors, cosine 1; every other cluster scores
      // below). Require every returned hit to be a member of the
      // probe's cluster and every probe to fill its k — recall 1.0 by
      // construction; a quantizer slip, a broken adjacency, or a beam
      // that cannot reach k members within ef expansions fails the
      // bar.
      val sHits = operators.GraphAnnDist.searchIndex(corpus, edges,
        corpus.filter(col("id") < 256), "id", "embedding",
        nCells = kc, k = 10, ef = 64, nProbe = 1).persist()
      val nHits = sHits.count()
      val offCluster = sHits.filter(
        pmod(col("neighbor_id"), lit(kc.toLong)) =!=
          pmod(col("probe_id"), lit(kc.toLong))).count()
      require(nHits == 256L * 10 && offCluster == 0L,
        s"beam-limited search recall broken: hits=$nHits (want 2560), " +
          s"off-cluster=$offCluster")
      sHits.unpersist()
      edges.unpersist()

      // --- incremental-append wave over the same planted corpus:
      // appends carry their cluster's IDENTICAL vector, so every
      // within-cell cosine ties and each append must link to EXACTLY
      // the m lowest base ids of its cluster: cell + t*kc, t < m.
      // Any assignment slip or rank drift breaks the closed form.
      val nApp = gdNodes / 10
      val appCluster = pmod(col("id"), lit(kc.toLong))
      val appendVecs = spark.range(gdNodes, gdNodes + nApp).toDF("id")
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)), j =>
            (pmod(xxhash64(appCluster, j), lit(2000001L)).cast("double")
              / 1000000.0 - 1.0))
          .cast("array<float>"))
      val appEdges = operators.GraphAnnDist.appendToIndex(corpus,
        appendVecs, "id", "embedding", nCells = kc, m = gm,
        maxCellSize = 8192).persist()
      val ae = appEdges.agg(
        count(lit(1)).as("total"),
        // forward edge (append -> base): target must be base ordinal
        // t < m of the append's own cluster
        sum(when(col("src_id") >= gdNodes && (
          pmod(col("src_id"), lit(kc.toLong)) =!=
            pmod(col("dst_id"), lit(kc.toLong)) ||
          expr(s"dst_id DIV $kc") >= gm || col("dst_id") >= gdNodes),
          1L).otherwise(0L)).as("bad_fwd"),
        sum(when(col("src_id") >= gdNodes, 1L).otherwise(0L)).as("fwd"))
        .head()
      require(ae.getLong(0) == 2L * gm * nApp &&
          ae.getLong(1) == 0L && ae.getLong(2) == gm * nApp,
        s"append edges broken: total=${ae.getLong(0)} " +
          s"(want ${2L * gm * nApp}), bad=${ae.getLong(1)}, " +
          s"fwd=${ae.getLong(2)}")
      appEdges.unpersist()
      (a.getLong(0) + ae.getLong(0),
        s""","nodes":$gdNodes,"cells":$kc,"m":$gm,"appends":$nApp""" +
          s""","search_hits":$nHits,"search_off_cluster":$offCluster""")
    }

    // ------------------------------------------------------- SRP ANN
    // the third ANN path; bitsPerBand sized ~log2(corpus) per the
    // operator docs, so buckets are near-singleton for random vectors
    phase("srp_ann") {
      val hits = operators.SimilaritySearch.srpTopK(
        vecs.filter(col("vec_id") < 1024), vecs, "vec_id", "embedding",
        k = 10, bands = 4, bitsPerBand = math.max(16, srpBits - 4),
        maxDim = dim)
      (hits.count(), "")
    }

    // ------------------------------------------- quantized-rescore ANN
    // the int8 candidate sieve scans the FULL corpus per probe (that is
    // its contract — a sieve, not an index), so the probe budget scales
    // inversely with the corpus to keep pairs ~2e8 per run; the planted
    // identical pairs give an exact check — every probe's rank-1
    // neighbor must be its twin (probe ids < nDupVecs pair as (2i,2i+1))
    val qProbes = math.max(64L, math.min(256L, 200000000L / nVecs))
    phase("quantized_ann") {
      val hits = operators.SimilaritySearch.quantizedTopK(
        vecs.filter(col("vec_id") < qProbes), vecs, "vec_id", "embedding",
        k = 10, refine = 4)
      val twinsFound = hits.filter(col("rank") === 1)
        .filter(col("neighbor_id") ===
          col("probe_id").bitwiseXOR(lit(1L))).count()
      require(twinsFound == qProbes,
        s"quantized top-1 must be the planted twin for all $qProbes probes, got $twinsFound")
      (hits.count(), s""","twins_found":$twinsFound,"probes":$qProbes""")
    }

    // ----------------------------------------------------------- PQ ANN
    // the memory-bound tier: 64 floats -> m=8 codes per vector, probes
    // score by 8 table lookups per candidate instead of 64 multiplies.
    // Exactness bar is on the ENCODING path (the deterministic half):
    // planted twins are identical vectors, so each pair must carry
    // identical code tuples — checked over the FULL corpus. The ADC
    // scan itself is approximate by contract (codes are coarse), so its
    // bar is shape (rows out, zero spill), not twin ranks.
    phase("pq_ann") {
      val pqModel = operators.ProductQuantization.fit(
        vecs, "vec_id", "embedding", m = 8, kSub = 256, iters = 1)
      val codes = operators.ProductQuantization.encode(
        vecs, "vec_id", "embedding", pqModel).persist()
      // pair-id groupBy over per-row code HASHES, not a self-join: the
      // planted twins occupy the LOW id range, so both a join and a
      // struct-valued countDistinct localized their compare/partial-agg
      // work on the few cache partitions holding that range (task
      // spread 3.8-5.0 at the 10 M tier). Hashing the code tuple per
      // row keeps the map side scan-dominated (uniform) and the hash
      // exchange on pair id spreads the rest over every reducer; a
      // pair agrees iff its two rows collapse to one distinct hash
      // (64-bit xxhash64 — a false agree needs a collision WITHIN one
      // planted pair, ~1e-13 over the corpus, far below the bar's
      // resolution).
      // the hash check below would treat a pair with matching NULL
      // codes as agreeing (xxhash64 hashes nulls deterministically),
      // silently widening the old per-column === bar which rejected
      // them — so pin the "no null codes" invariant explicitly first
      val nullCodes = codes.filter(
        (0 until 8).map(s => col(s"code_$s").isNull).reduce(_ || _)).count()
      require(nullCodes == 0,
        s"PQ encode emitted $nullCodes rows with null codes")
      val agreeing = codes.filter(col("vec_id") < nDupVecs)
        .select(expr("vec_id DIV 2").as("__pair"),
          xxhash64(struct((0 until 8).map(s => col(s"code_$s")): _*))
            .as("__h"))
        .groupBy("__pair")
        .agg(count_distinct(col("__h")).as("__d"), count(lit(1)).as("__n"))
        .filter(col("__n") === 2 && col("__d") === 1)
        .count()
      require(agreeing == nDupVecs / 2,
        s"planted twins must encode identically: ${nDupVecs / 2} pairs " +
          s"expected, $agreeing agree")
      val hits = operators.ProductQuantization.pqTopK(
        vecs.filter(col("vec_id") < 1024), vecs, "vec_id", "embedding",
        pqModel, k = 10)
      val n = hits.count()
      codes.unpersist()
      (n, s""","k_sub":256,"code_pairs_exact":$agreeing""")
    }

    // ------------------------------------------------------- SemDeDup
    // within-cluster cosine dedup over the rounded-Lloyd assignment.
    // The comparison volume is k * (N/k)^2 — the k knob IS the scale
    // lever (the paper sizes k so clusters stay in the tens of
    // thousands); here N/250 caps per-cluster pairs at ~31k. Planted
    // twins are identical vectors, so they always share a cluster and
    // every pair must drop exactly its higher id at tau = 0.99;
    // random 64-dim pairs essentially never reach 0.99, so the drop
    // count is EXACTLY the planted pair count — an exactness bar, not
    // a statistical one.
    val sdCells = math.max(64, math.min(4096, (nVecs / 250).toInt))
    phase("semdedup") {
      val flags = operators.SemDedup.semDedup(
        vecs, "vec_id", "embedding", k = sdCells, iters = 1, tau = 0.99)
      val drops = flags.filter(!col("keep")).count()
      require(drops == nDupVecs / 2,
        s"semdedup must drop exactly the ${nDupVecs / 2} planted " +
          s"higher-id twins, got $drops")
      (flags.count(), s""","n_cells":$sdCells,"drops":$drops""")
    }

    // ------------------------------------------- SemDeDup, SCALE path
    // two-level assignment (coarse Lloyd cell x deterministic SRP
    // signature): the tier the 10 M-vector sizing actually runs, where
    // the flat argmax above is the wall (O(k·dim·N) ≈ 2.6e13 at
    // k = N/250 — see SemDedup.semDedupScale). The bar stays EXACT:
    // planted twins are identical vectors, so both deterministic
    // levels co-locate them and each pair drops exactly its higher id;
    // random 64-dim pairs never reach tau = 0.99, so no false drops.
    val sdCoarse = math.max(64, math.min(512, (nVecs / 40000).toInt))
    phase("semdedup_scale") {
      val flags = operators.SemDedup.semDedupScale(
        vecs, "vec_id", "embedding", kCoarse = sdCoarse, iters = 1,
        srpBits = 8, tau = 0.99)
      val drops = flags.filter(!col("keep")).count()
      require(drops == nDupVecs / 2,
        s"semdedup_scale must drop exactly the ${nDupVecs / 2} planted " +
          s"higher-id twins, got $drops")
      (flags.count(),
        s""","k_coarse":$sdCoarse,"srp_bits":8,"drops":$drops""")
    }

    vecs.unpersist()

    // ------------------------------------- minhash LSH candidate pairs
    // 5 M docs -> banded self-join keyed on (band_idx, band_hash).
    // Expected pairs: 6 per dup group = nDupDocs/4*6 (> driverThreshold
    // by construction, so the CC step below MUST go distributed).
    var nPairs = 0L
    val pairs = operators.DedupOps
      .minhashCandidatePairs(docs, "id", "text").persist()
    phase("minhash_pairs") { nPairs = pairs.count(); (nPairs, "") }

    // -------------------------- connected components, DISTRIBUTED tier
    phase("dup_clusters_distributed") {
      // at full sizing the pair set must exceed the DEFAULT driver
      // threshold, so the plain call goes distributed on its own; a
      // downsized smoke run still exercises the distributed tier by
      // lowering the threshold explicitly
      if (nDocs >= 4000000L) require(nPairs > 1000000L,
        s"stress corpus must push pairs past driverThreshold, got $nPairs")
      val labels = (if (nPairs > 1000000L)
        operators.DedupOps.duplicateClusters(pairs)
      else operators.DedupOps.duplicateClusters(pairs, driverThreshold = 1L))
        .persist()
      val n = labels.count()
      // transitive labeling sanity: every dup group of 4 collapses to
      // one canonical -> labeled vertices = nDupDocs, distinct labels =
      // nDupDocs/4 (throws on non-convergence inside duplicateClusters)
      val distinctLabels = labels.select("label").distinct().count()
      labels.unpersist()
      (n, s""","distinct_labels":$distinctLabels""")
    }
    pairs.unpersist()

    // ----------------------- connected components, CHAIN-DIAMETER tier
    // Min-label propagation needs `diameter` rounds, so a chain-shaped
    // graph is the loop's worst case: near-dup graphs converge in a
    // handful (they're near-cliques), a 100-long chain needs ~100.
    // Planted chains make the labels exact (node i sits in chain
    // i % nChains whose canonical min id IS the chain index), and
    // running diameter 50 before diameter 100 over the SAME node and
    // edge counts gives a flatness bar: per-round cost is
    // size-determined and identical across the two runs, so wall must
    // scale ~linearly with rounds (<= 3x for 2x the rounds). Without
    // the loop's periodic localCheckpoint the round-t plan embeds all
    // t-1 predecessors and analyzer/cache-lookup time grows with t —
    // at 100 rounds that blows the bound (driver-side, so a SMALL
    // corpus exposes it most clearly).
    val chainNodes = sys.env.getOrElse("SPARK_GRAFT_STRESS_CHAIN_NODES",
      "200000").toLong
    phase("dup_chain_cc") {
      def chainRun(len: Long, reliable: Boolean = false): (Long, Long, Double) = {
        val nChains = chainNodes / len
        val n = nChains * len
        val chainPairs = spark.range(n - nChains).toDF("i")
          .select(col("i").as("id_a"), (col("i") + nChains).as("id_b"))
        val t0 = System.nanoTime()
        val labels = operators.DedupOps.duplicateClusters(chainPairs,
          maxIter = len.toInt + 8, driverThreshold = 0L,
          reliableCheckpoint = reliable).persist()
        val bad = labels
          .filter(col("label") =!= pmod(col("id"), lit(nChains))).count()
        val cnt = labels.count()
        labels.unpersist()
        require(bad == 0L && cnt == n,
          s"chain labels broken at len=$len: n=$cnt (want $n), " +
            s"mislabeled=$bad")
        (n, nChains, (System.nanoTime() - t0) / 1e9)
      }
      val (_, _, t50) = chainRun(50L)
      val (n100, chains100, t100) = chainRun(100L)
      require(t100 <= 3.0 * t50,
        f"per-round cost not flat: diameter 100 took $t100%.1fs vs " +
          f"diameter 50 $t50%.1fs (plan-depth blowup)")
      // price the reliable-checkpoint trade at the worst shape (one
      // durable write per round x 100 rounds): same labels required,
      // wall reported next to the local form — the number a spot-fleet
      // deploy reads before flipping the flag
      spark.sparkContext.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-stress-ckpt")
          .toString)
      val (_, _, t100r) = chainRun(100L, reliable = true)
      (n100, f""","chains":$chains100,"sec_d50":$t50%.2f,""" +
        f""""sec_d100":$t100%.2f,"sec_d100_reliable":$t100r%.2f""")
    }

    // ------------------------------ dedup-tier recall eval (q_lsh_recall)
    // exact-copy groups are the ONLY shingle overlap (unique docs draw
    // 16-hex-char words from disjoint seeds), so ground truth at any
    // tau is exactly the 6 within-group pairs per group, the banding
    // catches every one (identical signatures collide in all bands),
    // and random band collisions are the only possible false positive
    // — recall must be exactly 1.0 and precision 1.0 at this corpus.
    // The truth side exercises the shingle inverted index at corpus
    // scale: every shingle lives in <= 4 docs, so the join is linear.
    phase("lsh_recall") {
      val r = operators.DedupOps.lshRecall(docs, "id", "text", tau = 0.5)
        .head()
      val (nt, nc, nh) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val expectTruth = nDupDocs / 4 * 6
      require(nt == expectTruth && nh == nt && nc == nt,
        s"lsh_recall: truth=$nt cand=$nc hit=$nh, expected all $expectTruth")
      (nt, s""","n_cand":$nc,"n_hit":$nh,"recall":${r.getDouble(3)},""" +
        s""""precision":${r.getDouble(4)}""")
    }

    // --------------------------------- per-doc novelty (q_doc_novelty)
    // every dup-group doc shares ALL its grams with its 3 copies
    // (df = 4 -> novelty exactly 0); every unique doc's grams exist
    // nowhere else (df = 1 -> novelty exactly 1). Total coverage: all
    // docs emit a row (12 tokens -> 10 grams each). A clean three-way
    // exactness bar over the whole corpus in one aggregate.
    phase("doc_novelty") {
      val r = operators.CorpusDivergence.docNovelty(docs, "id", "text")
        .agg(count(lit(1)).as("n"),
          sum(when(col("novelty") === 1.0, 1L).otherwise(0L)).as("ones"),
          sum(when(col("novelty") === 0.0, 1L).otherwise(0L)).as("zeros"))
        .head()
      val (n, ones, zeros) = (r.getLong(0), r.getLong(1), r.getLong(2))
      require(n == nDocs && zeros == nDupDocs && ones == nDocs - nDupDocs,
        s"novelty: n=$n ones=$ones zeros=$zeros, " +
          s"expected $nDocs/${nDocs - nDupDocs}/$nDupDocs")
      (n, s""","novelty_one":$ones,"novelty_zero":$zeros""")
    }

    // --------------------------------------- duplicated-span detection
    // every dup-group doc is a verbatim copy, so its full 12-token body
    // is ONE maximal span [1, 12]; unique docs (16-hex-char words from
    // unique seeds) share no 8-gram. Exact expectation: nDupDocs rows,
    // all spanning the whole document. The shuffle is O(corpus gram
    // positions) = 5 rows/doc of (hash, doc, pos) — the operator's
    // documented wordcount-shaped asymptotics, measured here.
    phase("span_dedup") {
      val spans = operators.SpanDedup
        .duplicatedSpans(docs, "id", "text", width = 8).persist()
      val n = spans.count()
      val fullSpans = spans
        .filter(col("span_start") === 1 && col("span_tokens") === 12).count()
      spans.unpersist()
      require(n == nDupDocs && fullSpans == n,
        s"planted spans: got $n rows / $fullSpans full-doc, expected $nDupDocs")
      (n, s""","full_doc_spans":$fullSpans""")
    }

    // -------------------------- decontamination: exact vs Bloom form
    // dup groups span split boundaries (members have different ids, so
    // assignSplit scatters them), giving a large genuine train/eval
    // overlap; the two operators must agree row-for-row, and the Bloom
    // pre-filter's win is the wall-time gap between these two phases.
    // (rows, sum of n_contaminated) in one aggregate — count alone
    // could mask a per-row value drift (every contaminated doc would
    // still emit a row, just with a smaller count)
    def contaminationDigest(r: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val row = r.agg(count(lit(1)), sum("n_contaminated")).head()
      (row.getLong(0), row.getLong(1))
    }
    var exactDigest = (0L, 0L)
    phase("contamination_exact") {
      exactDigest = contaminationDigest(
        operators.TrainingOps.crossSplitContamination(
          docs, "id", "text", n = 3, maxNgramDf = None))
      (exactDigest._1, s""","total_overlap":${exactDigest._2}""")
    }
    phase("contamination_bloom") {
      val d = contaminationDigest(
        operators.TrainingOps.crossSplitContaminationBloom(
          docs, "id", "text", n = 3, maxNgramDf = None))
      require(d == exactDigest,
        s"bloom decontamination diverged: $d vs exact $exactDigest")
      (d._1, s""","total_overlap":${d._2},"matches_exact":true""")
    }

    // ----------------------------------------------- sequence packing
    // 256 shards (shardHexChars = 2): the documented scale posture.
    phase("pack") {
      val sized = docs.select(col("id"),
        (lit(20) + pmod(xxhash64(col("id")), lit(81))).as("n_tok"))
      val packed = operators.TrainingOps.packSequences(
        sized, "id", col("n_tok"), capacity = 2048, shardHexChars = 2)
      // count() would prune the windowed cumsum; aggregate the packing
      // columns so the whole layout is actually computed
      val n = packed.agg(countDistinct(col("pack_shard"), col("pack_bin")))
        .head().getLong(0)
      // split-document comparison: chunking breaks any doc straddling
      // a bin boundary; FFD breaks only docs longer than the capacity
      // (none here), at the cost of some padding
      val chunkSplit = packed
        .filter(col("bin_offset") + col("n_tok") > 2048).count()
      (n, s""","chunk_split_docs":$chunkSplit""")
    }

    phase("pack_ffd") {
      val sized = docs.select(col("id"),
        (lit(20) + pmod(xxhash64(col("id")), lit(81))).as("n_tok"))
      val ffd = operators.TrainingOps.packSequencesFfd(
        sized, "id", col("n_tok"), capacity = 2048, shardHexChars = 2)
        .persist()
      val agg = ffd.agg(
        countDistinct(col("pack_shard"), col("pack_bin")),
        sum((col("pack_tokens") < col("n_tok")).cast("long")),
        sum(col("pack_tokens"))).head()
      val (bins, split, tokens) = (agg.getLong(0), agg.getLong(1), agg.getLong(2))
      ffd.unpersist()
      // every doc fits the capacity, so FFD must split NOTHING; bins
      // carry the padding trade (utilization = tokens / (bins * cap))
      require(split == 0L, s"FFD split $split docs that fit the capacity")
      (bins, f""","ffd_split_docs":$split,""" +
        f""""bin_utilization":${tokens.toDouble / (bins * 2048L)}%.4f""")
    }

    // ------------------------------------------ corpus-scoring tier
    // Vocabulary-biased planted corpus: the target pool (~1% of ids)
    // and 1024 raw "needles" draw their 12 words from a 32-word vocab
    // A; the noise pool draws from a disjoint 65536-word vocab B. A is
    // deliberately SMALL relative to dsir's 256 hash buckets (≤32/256
    // occupied), so a noise document can only fake a needle score by
    // landing all 12 tokens in A-occupied buckets — p ≈ 0.125^12,
    // zero expected even at the 50 M tier. DSIR must then rank every
    // needle above the entire noise pool, and the NB classifier fit
    // on a hash-selected seed labeled by vocab must classify every
    // document by its vocabulary.
    val nNeedles = 1024L
    val nTargets = math.max(nDocs / 100L, 4096L)
    val isA = col("id") < nTargets + nNeedles
    val scoreWords = (0 until 12).map { j =>
      val slot = pmod(xxhash64(col("id"), lit(j)),
        when(isA, lit(32L)).otherwise(lit(65536L)))
      hex(xxhash64(when(isA, lit("A")).otherwise(lit("B")), slot))
    }
    val scoreDocs = spark.range(nDocs).toDF("id")
      .withColumn("text", concat_ws(" ", scoreWords: _*))
      .persist()

    phase("dsir") {
      val scored = operators.CorpusScoring.dsirWeights(
        scoreDocs, "id", "text", col("id") < nTargets)
      // every planted needle must outrank the whole noise pool; the
      // scoring pass is map-only, so re-running it for the two probe
      // jobs is cheaper than persisting 50 M scored rows
      val needleMin = scored
        .filter(col("id") >= nTargets && col("id") < nTargets + nNeedles)
        .agg(min("logw")).head().getDouble(0)
      val noiseAtOrAbove = scored
        .filter(col("id") >= nTargets + nNeedles &&
          col("logw") >= needleMin).count()
      require(noiseAtOrAbove == 0L,
        s"$noiseAtOrAbove noise docs reached the needle score band")
      (nDocs, s""","needles":$nNeedles,""" +
        s""""noise_at_or_above_needles":$noiseAtOrAbove""")
    }

    phase("nb_quality") {
      // labels ARE the vocabulary split; the model must recover it
      // from the seed slice alone. broadcastModel = false exercises
      // the shuffled-hash model join — the web-scale-vocabulary tier
      val scored = operators.CorpusScoring.naiveBayesQuality(
        scoreDocs, "id", "text", isGood = isA, seedFrac = 0.25,
        broadcastModel = false)
      val wrong = scored.filter(
        (col("pred") === 1) =!= (col("id") < nTargets + nNeedles)).count()
      require(wrong == 0L, s"NB misclassified $wrong of $nDocs docs")
      (nDocs, s""","misclassified":$wrong""")
    }
    scoreDocs.unpersist()

    // ------------------------------------------- event-analytics tier
    // 20 events per user. User class (u mod 4) plants exact funnel
    // outcomes — full convert / click-only / EARLY PURCHASE (the
    // strictness case at scale: a purchase timestamped before the
    // click reach must not convert) / view-only — and a +14-day return
    // event for every other user GROUP (u/4 parity, deliberately
    // independent of the class and cohort bits) plants exact weekly
    // retention bars. Cohort = (u mod 4) weeks after the Monday epoch.
    // Both operators key every exchange on the user, so the tier
    // measures exactly the shuffles the design argues for.
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_STRESS_EVENTS",
      "20000000").toLong
    val evUsers = nEvents / 20
    require(evUsers % 8 == 0, s"event tier wants users % 8 == 0, got $evUsers")
    val evBase = 1704067200L // 2024-01-01 00:00:00 UTC, a Monday
    val eu = col("id").divide(20).cast("long")
    val ei = pmod(col("id"), lit(20)).cast("int")
    val cls = pmod(eu, lit(4))
    val evType =
      when(ei === 0, when(cls === 2, lit("purchase")).otherwise(lit("view")))
        .when(ei === 1,
          when(cls === 0 || cls === 1, lit("click"))
            .when(cls === 2, lit("view")).otherwise(lit("error")))
        .when(ei === 2,
          when(cls === 0, lit("purchase"))
            .when(cls === 2, lit("click")).otherwise(lit("error")))
        .otherwise(lit("error"))
    val evOffSec = when(
        ei === 19 && pmod(eu.divide(4).cast("long"), lit(2)) === 0,
        cls.cast("long") * (7L * 86400) + lit(14L * 86400))
      .otherwise(cls.cast("long") * (7L * 86400) + ei.cast("long") * 60)
    val events = spark.range(nEvents).toDF("id")
      .select(eu.as("user_id"),
        timestamp_seconds(lit(evBase) + evOffSec).as("ts"),
        evType.as("event_type"))
      .persist()
    phase("funnel") {
      events.count() // materialize synthesis outside nothing — cheap
      val r = operators.EventAnalytics.funnel(events, "user_id", "ts",
          "event_type", Seq("view", "click", "purchase"))
        .orderBy("stage").collect()
      val ns = r.map(_.getLong(2))
      require(ns.toSeq == Seq(evUsers, evUsers * 3 / 4, evUsers / 4),
        s"funnel counts ${ns.toSeq}, expected " +
          s"${Seq(evUsers, evUsers * 3 / 4, evUsers / 4)}")
      (nEvents, s""","n_view":${ns(0)},"n_click":${ns(1)},""" +
        s""""n_purchase":${ns(2)}""")
    }
    phase("retention") {
      val rows = operators.EventAnalytics
        .retention(events, "user_id", "ts").collect()
      require(rows.length == 8,
        s"expected 4 cohorts x offsets {0,2}, got ${rows.length} rows")
      rows.foreach { r =>
        val (off, n, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
        val (wantN, wantRate) =
          if (off == 0L) (evUsers / 4, 1.0) else (evUsers / 8, 0.5)
        require(off == 0L || off == 2L, s"unexpected offset $off")
        require(n == wantN && rate == wantRate,
          s"cohort ${r.get(0)} offset $off: n=$n rate=$rate, " +
            s"expected $wantN/$wantRate")
      }
      (nEvents, s""","cohorts":4,"offsets":2""")
    }
    events.unpersist()

    // ------------------------------------------- containment dedup tier
    // 2 M docs: every 4th doc is the 8-token PREFIX of its predecessor
    // (so its width-8 gram set is a strict subset -> containment
    // exactly 1.0 against exactly one partner); all other docs are
    // globally unique. Exact bar: nCont pairs at tau = 1.0, each with
    // cont_a or cont_b = 1. Planted gram df = 2, so the default cap
    // never drops a planted pair — what the cap drops is background
    // (there is none), keeping the expectation exact.
    // Sized by its own knob so a tier-2 run can lift the tier-1 cap
    // without touching the other phases' canonical sizes.
    val contDocs = sys.env.get("SPARK_GRAFT_STRESS_CONT_DOCS").map(_.toLong)
      .getOrElse(math.min(nDocs, 2000000L))
    val contSeed = when(pmod(col("id"), lit(4)) === 3, col("id") - 1)
      .otherwise(col("id"))
      .+(lit(20000000000L))
    val contWords = (0 until 12).map(i => hex(xxhash64(col("__seed"), lit(i))))
    val cdocs = spark.range(contDocs).toDF("id")
      .withColumn("__seed", contSeed)
      .withColumn("text",
        when(pmod(col("id"), lit(4)) === 3,
          concat_ws(" ", contWords.take(8): _*))
          .otherwise(concat_ws(" ", contWords: _*)))
      .drop("__seed")
      .persist()
    phase("containment") {
      cdocs.count()
      val pairs = operators.DedupOps.containmentPairs(
        cdocs, "id", "text", tau = 1.0, shingleSize = 8).persist()
      val n = pairs.count()
      val full = pairs.filter(col("cont_a") === 1.0 || col("cont_b") === 1.0)
        .count()
      pairs.unpersist()
      val want = contDocs / 4
      require(n == want && full == n,
        s"containment: $n pairs / $full full, expected $want")
      (n, s""","full_containments":$full""")
    }
    cdocs.unpersist()

    // --------------------------------------------- fuzzy linkage tier
    // 20 M rows over a 10,000-name vocabulary "itemAAA grpBB"
    // (AAA in 000..099, BB = block). Within a block the item field
    // varies only in its last two digits, so EVERY in-block pair is
    // Levenshtein <= 2 and the dist <= 1 pairs are exactly the
    // one-digit edits: 2 positions x 10 fixed x C(10,2) = 900 per
    // block. The point measured: the exchange carries 10k DISTINCT
    // values, never the 20 M rows.
    phase("fuzzy_link") {
      val fuzzyRows = sys.env.get("SPARK_GRAFT_STRESS_FUZZY_ROWS")
        .map(_.toLong).getOrElse(math.min(nDocs * 4, 20000000L))
      val rows = spark.range(fuzzyRows).toDF("id")
        .select(format_string("item%03d grp%02d",
          pmod(col("id"), lit(100)),
          pmod(col("id").divide(100).cast("long"), lit(100))).as("name"))
      val pairs = operators.FuzzyMatch.blockedPairs(rows, "name",
        n => regexp_extract(n, "[^ ]+$", 0), maxDist = 1).persist()
      val n1 = pairs.count()
      val maxD = pairs.agg(max("dist")).head().getInt(0)
      pairs.unpersist()
      require(n1 == 900L * 100 && maxD <= 1,
        s"fuzzy_link: $n1 dist<=1 pairs (want 90000), maxDist $maxD")
      (n1, s""","distinct_names":10000,"blocks":100""")
    }

    // ------------------------------------------------ graph tier
    // Ring graph, nodes 0..G-1 with edge (i, i+1 mod G): 2-regular, so
    // PageRank is EXACTLY uniform — one distinct rounded rank across
    // all G nodes is the bar (any lost or duplicated edge in the
    // per-iteration join/agg breaks it; each node's update is
    // base + d·(r/2 + r/2), IEEE-exact halves, so uniformity survives
    // rounding bit-for-bit). Triangles run on ring ∪ K disjoint chords
    // (3i, 3i+2), each closing exactly one triangle through 3i+1:
    // exactly 3K participating nodes, each count 1 — an exact bar.
    val graphNodes = sys.env.getOrElse("SPARK_GRAFT_STRESS_GRAPH_NODES",
      "2000000").toLong
    val ring = spark.range(graphNodes).toDF("id")
      .select(col("id").as("id_a"),
        pmod(col("id") + 1, lit(graphNodes)).as("id_b"))
    phase("pagerank") {
      // decimals sized to the rank scale: 1/G at tier-2 is ~4e-8, so
      // the catalog's 6-decimal contract would round every rank to 0
      // and the chain would degenerate — the knob IS the scale lever
      val r = operators.PageRank.ranks(ring, iters = 3, decimals = 12)
        .agg(count(lit(1)).as("n"),
          countDistinct(col("rank")).as("nd"),
          max(abs(col("rank") * graphNodes - 1.0)).as("err"))
        .head()
      require(r.getLong(0) == graphNodes && r.getLong(1) == 1L &&
          r.getDouble(2) < 1e-3,
        s"pagerank: n=${r.getLong(0)} distinct=${r.getLong(1)} " +
          s"err=${r.getDouble(2)} — uniformity bar broken")
      (graphNodes, s""","iters":3,"distinct_ranks":${r.getLong(1)}""")
    }
    phase("triangles") {
      val k = graphNodes / 100
      val chords = spark.range(k).toDF("i")
        .select((col("i") * 3).as("id_a"), (col("i") * 3 + 2).as("id_b"))
      val t = operators.GraphMetrics.triangleCounts(
          ring.unionByName(chords))
        .agg(count(lit(1)).as("nodes"), sum("n_triangles").as("total"),
          max("n_triangles").as("mx")).head()
      require(t.getLong(0) == 3 * k && t.getLong(1) == 3 * k &&
          t.getLong(2) == 1L,
        s"triangles: nodes=${t.getLong(0)} total=${t.getLong(1)} " +
          s"max=${t.getLong(2)}, want ${3 * k}/${3 * k}/1")
      (graphNodes + k, s""","planted":$k""")
    }
    phase("bfs_hops") {
      // seeds every 1000th ring node: hop distance on the ring is
      // exactly min |id - seed| (seeds are 6 hops apart at the closest
      // multiple — no interference within maxHops = 3), so the per-hop
      // census is EXACT: nSeeds at hop 0, 2*nSeeds at hops 1..3. A
      // frontier that leaks a visited node, drops a neighbor, or
      // re-admits across seed boundaries breaks the bar.
      val nSeeds = graphNodes / 1000
      require(nSeeds > 0,
        s"graphNodes=$graphNodes too small for the bfs tier (need >= 1000)")
      val seeds = spark.range(nSeeds).toDF("i")
        .select((col("i") * 1000).as("id"))
      val b = operators.GraphMetrics.bfsHops(ring, seeds, maxHops = 3)
        .groupBy("hops").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      require(b.getOrElse(0, 0L) == nSeeds &&
          (1 to 3).forall(h => b.getOrElse(h, 0L) == 2L * nSeeds),
        s"bfs census broken: $b, want hop0=$nSeeds, hops1-3=${2 * nSeeds}")
      (nSeeds * 7, s""","seeds":$nSeeds""")
    }
    phase("bfs_hops_deep") {
      // the deep-traversal tier: same ring and 1000-apart seeds, 8
      // hops, with the deep knobs ON (cached doubled edge list +
      // lineage checkpoint every 3 hops). The census stays exact
      // (nearest seeds 1000 apart — no frontier interference through
      // hop 8), and the FLATNESS bar runs the identical knobs at 4
      // hops first: with bounded lineage and a cached edge scan the
      // per-hop cost is constant, so wall(8) must stay <= 2.5x
      // wall(4); a lineage/replan blowup makes deep hops
      // progressively more expensive and breaks the bound.
      val nSeeds = graphNodes / 1000
      require(nSeeds > 0,
        s"graphNodes=$graphNodes too small for the deep bfs tier")
      val seeds = spark.range(nSeeds).toDF("i")
        .select((col("i") * 1000).as("id"))
      def census(maxHops: Int): (Map[Int, Long], Double) = {
        val t0 = System.nanoTime()
        val b = operators.GraphMetrics.bfsHops(ring, seeds, maxHops,
            cacheEdges = true, checkpointEvery = 3)
          .groupBy("hops").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        (b, (System.nanoTime() - t0) / 1e9)
      }
      val (b4, t4) = census(4)
      val (b8, t8) = census(8)
      require(b8.getOrElse(0, 0L) == nSeeds &&
          (1 to 8).forall(h => b8.getOrElse(h, 0L) == 2L * nSeeds) &&
          (0 to 4).forall(h => b4.getOrElse(h, 0L) == b8(h)),
        s"deep bfs census broken: 8-hop=$b8 4-hop=$b4, " +
          s"want hop0=$nSeeds, hops1-8=${2L * nSeeds}")
      require(t8 <= 2.5 * t4,
        f"per-hop cost not flat: 8 hops $t8%.1fs vs 4 hops $t4%.1fs " +
          "(lineage/replan blowup)")
      (nSeeds * 17, f""","seeds":$nSeeds,"sec_4hop":$t4%.2f,"sec_8hop":$t8%.2f""")
    }

    // ------------------------------------------------ kmeans tier
    // Planted clusters with an EXACT recovery bar: vector i = center
    // (i mod k) + per-dim jitter <= 0.001. Centers are pseudo-random on
    // [-1, 1]^64 (pairwise cosine ~0 +- 1/sqrt(dim)), so the planted
    // argmax dominates every competing centroid by orders of magnitude
    // over the jitter; the lowest-id init picks ids 0..k-1 — one
    // (jittered) prototype per cluster — so after 2 rounded Lloyd
    // iterations EVERY vector must sit in cell (id mod k), all k cells
    // alive. Any assignment drift, mean mis-aggregation, or ordinal
    // shuffle breaks the zero-mismatch bar. Per iteration the only
    // shuffle is the (cell, dim)-keyed mean aggregation — map-side
    // partials collapse to k*dim rows per task regardless of corpus.
    val kmVecs = sys.env.getOrElse("SPARK_GRAFT_STRESS_KMEANS_VECS",
      "2000000").toLong
    phase("kmeans") {
      val k = 64
      val kmDim = 64
      val cluster = pmod(col("id"), lit(k.toLong))
      val kmCorpus = spark.range(kmVecs).toDF("id")
        .withColumn("embedding",
          transform(sequence(lit(0), lit(kmDim - 1)), j =>
            (pmod(xxhash64(cluster, j), lit(2000001L)).cast("double")
                / 1000000.0 - 1.0) +
              (pmod(xxhash64(col("id"), j + 1000), lit(2001L))
                .cast("double") / 1000000.0 - 0.001))
          .cast("array<float>"))
      val a = operators.KMeans
        .assignRounded(kmCorpus, "id", "embedding", k, iters = 2)
        .agg(count(lit(1)).as("n"),
          sum(when(col("cell_id") =!= pmod(col("id"), lit(k.toLong)), 1L)
            .otherwise(0L)).as("mismatch"),
          countDistinct(col("cell_id")).as("cells"))
        .head()
      require(a.getLong(0) == kmVecs && a.getLong(1) == 0L &&
          a.getLong(2) == k.toLong,
        s"kmeans: n=${a.getLong(0)} mismatch=${a.getLong(1)} " +
          s"cells=${a.getLong(2)} — planted recovery broken")
      (kmVecs, s""","k":$k,"iters":2,"mismatch":0""")
    }

    // ------------------------------------------------ pca tier
    // Rank-1 planted covariance with a CLOSED-FORM spectrum: vector
    // i = t_i * (1, 10, 0, ..., 0), t_i = (i mod 21) - 10, so the
    // leading component is exactly (1, 10)/sqrt(101) (all-ones start
    // has positive overlap -> positive sign) and the eigenvalue is
    // var(t) * 101 = (2*385/21) * 101. The interesting metric is the
    // SHUFFLE: the covariance aggregator moves one (1 + dim +
    // dim(dim+1)/2)-double buffer per map partition — corpus-size-
    // independent by construction, and the phase line proves it.
    val pcaVecs = sys.env.getOrElse("SPARK_GRAFT_STRESS_PCA_VECS",
      "10000000").toLong
    phase("pca_fit") {
      val tcol = (pmod(col("id"), lit(21L)) - 10L).cast("double")
      val corpus = spark.range(pcaVecs).toDF("id")
        .withColumn("embedding",
          transform(sequence(lit(0), lit(dim - 1)), j =>
            when(j === 0, tcol).when(j === 1, tcol * 10.0)
              .otherwise(lit(0.0)))
          .cast("array<float>"))
      val m = operators.Pca.fitLeading(corpus, "embedding", dim, iters = 4)
      val expectedEig = (2.0 * 385 / 21) * 101
      val u1 = 10.0 / math.sqrt(101.0)
      require(math.abs(m.component(1) - u1) < 1e-4 &&
          math.abs(m.component(0) - u1 / 10) < 1e-4 &&
          m.component.drop(2).forall(math.abs(_) < 1e-9) &&
          math.abs(m.eigenvalue - expectedEig) < 0.01,
        s"planted spectrum broken: comp=(${m.component(0)}, " +
          s"${m.component(1)}, ...), eig=${m.eigenvalue} " +
          s"(want $expectedEig)")
      (pcaVecs, f""","eigenvalue":${m.eigenvalue}%.4f""")
    }

    // ------------------------------------------------ skew stress tier
    // Hot keys planted at sizes where even the UNPROTECTED run is
    // feasible by construction — the point is to MEASURE the df caps
    // and AQE skew-join engaging (task_time_max_over_median in the
    // phase lines), not to detonate the harness.
    def withConf(kv: (String, String)*)(body: => Unit): Unit = {
      val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // One hot token planted into every (skewDocs/10000)-th doc: token
    // df 10k vs the background df of 4 — a 2500x inverted-index skew.
    // Groups are 4 consecutive ids and the marker lands at most once
    // per group, so the >0.9-Jaccard pair count is IDENTICAL with and
    // without the cap (marked-unmarked in-group pairs score 12/13
    // either way) — the cap changes the plan's skew, not the answer.
    val skewDocs = math.min(nDocs, 2000000L)
    val hotEvery = math.max(skewDocs / 10000L, 4L)
    val sdocs = docs.filter(col("id") < skewDocs)
      .withColumn("text",
        when(pmod(col("id"), lit(hotEvery)) === 0,
          concat(col("text"), lit(" ffhotffhot"))).otherwise(col("text")))
      .persist()
    var uncappedPairs = -1L
    phase("jaccard_skew_uncapped_noaqe") {
      // the naked failure mode: no df cap AND no AQE — the hot token's
      // partition serializes the join stage (the spread number)
      var n = 0L
      withConf("spark.sql.adaptive.enabled" -> "false") {
        n = operators.DedupOps
          .tokenJaccardPairs(sdocs, "id", "text", maxDocFreq = None)
          .filter(col("jaccard") > 0.9).count()
      }
      uncappedPairs = n
      (n, s""","hot_df":${skewDocs / hotEvery}""")
    }
    phase("jaccard_skew_uncapped") {
      // AQE's skew split rebalances the tasks but still PAYS for the
      // hot token's quadratic pair stream — cap beats split
      val n = operators.DedupOps
        .tokenJaccardPairs(sdocs, "id", "text", maxDocFreq = None)
        .filter(col("jaccard") > 0.9).count()
      require(uncappedPairs < 0 || n == uncappedPairs,
        s"AQE changed the answer: $n vs $uncappedPairs")
      (n, s""","hot_df":${skewDocs / hotEvery},"matches_noaqe":true""")
    }
    phase("jaccard_skew_capped") {
      val n = operators.DedupOps
        .tokenJaccardPairs(sdocs, "id", "text") // default df cap 1000
        .filter(col("jaccard") > 0.9).count()
      require(uncappedPairs < 0 || n == uncappedPairs,
        s"df cap changed the confirmed-pair answer: $n vs $uncappedPairs")
      (n, s""","cap":${operators.DedupOps.DefaultMaxDocFreq},"matches_uncapped":true""")
    }
    sdocs.unpersist()

    // One SRP bucket holding 3k identical vectors (every band maps them
    // to the same bucket): the candidate self-join has one hot
    // (band, bucket) key carrying C(3k,2) ~ 4.5M pairs. Broadcast is
    // disabled so the join is shuffle-shaped (the skew-able case);
    // "before" pins AQE off, "after" lets AQE's skew-join split the hot
    // partition. The planted answer (exactly C(3k,2) cosine-1 pairs)
    // must be identical in both.
    val skewVecs = math.min(nVecs, 300000L)
    val hotVecs = 3000L
    val expectedHotPairs = hotVecs * (hotVecs - 1) / 2
    val svecs = spark.range(skewVecs).toDF("vec_id")
      .withColumn("__seed", when(col("vec_id") < hotVecs, lit(424242L))
        .otherwise(col("vec_id") + 20000000000L))
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)),
          j => pmod(xxhash64(col("__seed"), j), lit(2000001L))
            .cast("double") / 1000000.0 - 1.0).cast("array<float>"))
      .drop("__seed")
      .persist()
    svecs.count()
    def srpSkewCount(): Long = operators.SimilaritySearch.cosineDupePairsLsh(
      svecs, "vec_id", "embedding", threshold = 0.95,
      bands = 4, bitsPerBand = 18, maxDim = dim).count()
    phase("srp_skew_noaqe") {
      var n = 0L
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") { n = srpSkewCount() }
      require(n == expectedHotPairs,
        s"planted hot-bucket pairs: got $n, expected $expectedHotPairs")
      (n, s""","hot_bucket_vecs":$hotVecs""")
    }
    phase("srp_skew_aqe") {
      var n = 0L
      withConf(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.enabled" -> "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4m",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") { n = srpSkewCount() }
      require(n == expectedHotPairs,
        s"AQE skew split changed the answer: $n vs $expectedHotPairs")
      (n, s""","hot_bucket_vecs":$hotVecs,"matches_noaqe":true""")
    }
    svecs.unpersist()
    docs.unpersist()

    // -------------------------------------- changelog time-travel tier
    // A LONG upsert history — seed + (clBatches-1) delta batches with
    // checkpoints every 64 — measured four ways on the SAME log:
    //  (1) snapshotAt ANCHORED on a checkpoint vs (2) the PURE REPLAY
    //      (checkpoints hidden by renaming _ckpt away — identical fold,
    //      identical rows, different read bound),
    //  (3) the storage a prune retires and that reads survive it,
    //  (4) the tail-bounded CDC diff.
    // This is the capture that backs the PlanHygieneSpec structural pin
    // with production-shaped numbers: the anchored read opens O(state +
    // cadence) files while replay opens the whole history's.
    val clKeys = sys.env.getOrElse("SPARK_GRAFT_STRESS_CL_KEYS",
      "200000").toLong
    val clBatches = sys.env.getOrElse("SPARK_GRAFT_STRESS_CL_BATCHES",
      "256").toInt
    val clDelta = 2000L
    val clCkptEvery = 64
    phase("changelog_tt") {
      // the probe (clBatches - 6) must sit past at least one
      // checkpoint or the "anchored" read IS the replay and the
      // fewer-files invariant can't hold — refuse the misconfiguration
      // up front instead of aborting mid-drive with a confusing error
      require(clBatches - 6 >= clCkptEvery,
        s"SPARK_GRAFT_STRESS_CL_BATCHES=$clBatches too small: the " +
          s"probe batch (clBatches-6) needs a checkpoint below it " +
          s"(cadence $clCkptEvery) — use at least ${clCkptEvery + 7}")
      def dirMb(d: String): Double = {
        def walk(f: java.io.File): Long = {
          val fs = f.listFiles()
          if (fs == null) f.length() else fs.map(walk).sum
        }
        walk(new java.io.File(d)) / 1e6
      }
      val tmp = java.nio.file.Files.createTempDirectory("graft-stress-cl")
        .toString
      val logDir = s"$tmp/log"
      val sink = new streaming.UpsertJoin.ParquetUpsertSink(spark,
        s"$tmp/state", nBuckets = 64, changelogDir = Some(logDir),
        changelogCheckpointEvery = clCkptEvery)
      val tDrive0 = System.nanoTime()
      sink.upsert("k", spark.range(clKeys).select(col("id").as("k"),
        lit(0L).as("ts"), hex(xxhash64(col("id"), lit(0L))).as("p")))
      (1 until clBatches).foreach { b =>
        // 97 is coprime with every power-of-10 key count, so the batch
        // carries clDelta DISTINCT keys spread over the whole key space
        val delta = spark.range(clDelta).select(
          ((col("id") * 97L + lit(b * 13331L)) % clKeys).as("k"),
          lit(b.toLong).as("ts"),
          hex(xxhash64(col("id"), lit(b.toLong))).as("p"))
        sink.upsert("k", delta)
      }
      val driveSec = (System.nanoTime() - tDrive0) / 1e9
      val probe = clBatches - 6L // 250: anchor ckpt 191 + a 59-batch tail
      def timedRead(): (Double, Long, Long, Int) = {
        val t0 = System.nanoTime()
        val df = streaming.UpsertJoin.snapshotAt(spark, logDir, "k", probe)
        val rows = df.collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val files = plans.PlanFiles.filesRead(df.queryExecution.executedPlan)
        val sum = rows.foldLeft(0) { (acc, r) =>
          acc + scala.util.hashing.MurmurHash3.productHash(
            (r.getLong(0), r.getLong(1), r.getString(2)))
        }
        (sec, rows.length.toLong, files, sum)
      }
      val (ancSec, ancRows, ancFiles, ancSum) = timedRead()
      // hide the checkpoints: the same call now folds the full prefix
      val ckptDir = new java.io.File(s"$logDir/_ckpt")
      val hidden = new java.io.File(s"$logDir/_ckpt_off")
      require(ckptDir.renameTo(hidden), "could not hide _ckpt")
      val (repSec, repRows, repFiles, repSum) =
        try timedRead() finally { require(hidden.renameTo(ckptDir)): Unit }
      require(repRows == ancRows && repSum == ancSum,
        s"replay and anchored reads diverged: $repRows/$repSum vs $ancRows/$ancSum")
      require(ancFiles < repFiles,
        s"anchored read must open fewer files: $ancFiles vs $repFiles")
      val mbBefore = dirMb(logDir)
      val floor = streaming.UpsertJoin.pruneChangelogBefore(logDir, probe)
        .getOrElse(sys.error("prune found no checkpoint"))
      val mbAfter = dirMb(logDir)
      val (postSec, postRows, _, postSum) = timedRead()
      require(postRows == ancRows && postSum == ancSum,
        "post-prune anchored read diverged")
      val t0d = System.nanoTime()
      val diffRows = streaming.UpsertJoin.changelogChangesBetween(
        spark, logDir, "k", probe - 32L, probe).count()
      val diffSec = (System.nanoTime() - t0d) / 1e9
      (ancRows,
        f""","keys":$clKeys,"batches":$clBatches,"ckpt_every":$clCkptEvery,""" +
        f""""delta_rows":$clDelta,"drive_sec":$driveSec%.1f,""" +
        f""""anchored_sec":$ancSec%.2f,"anchored_files":$ancFiles,""" +
        f""""replay_sec":$repSec%.2f,"replay_files":$repFiles,""" +
        f""""reads_equal":true,"prune_floor":$floor,""" +
        f""""log_mb_before_prune":$mbBefore%.1f,"log_mb_after_prune":$mbAfter%.1f,""" +
        f""""post_prune_sec":$postSec%.2f,"post_prune_equal":true,""" +
        f""""diff_sec":$diffSec%.2f,"diff_rows":$diffRows""")
    }

    val json = report.mkString("[", ",\n", "]\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"[stress] report written to $outPath")
    spark.stop()
  }
}
