package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus deduplication operators (SURVEY §2.10): exact, MinHash-LSH,
  * SimHash, and n-gram-Jaccard near-dup detection over a document table.
  *
  * Scale design: every variant is shuffle-bounded by a SMALL key —
  * content hash, LSH band bucket, or simhash — never by pairwise
  * comparison of the full corpus. The only quadratic work is within a
  * bucket, which LSH keeps tiny.
  */
object DedupOps {

  /** Exact dedup by content hash: keeps the lowest-id row per distinct
    * text. One map-side-combinable aggregation — a single shuffle on the
    * 128-bit hash, never on the document body.
    *
    * NULL-text documents emit NO group: GROUP BY treats nulls as equal,
    * so without the filter a crawl's null docs would collapse into ONE
    * "duplicate" group and a drop-the-losers pass would delete them
    * all — the same policy [[minhashCandidatePairs]] documents for the
    * near-dup tier.
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** MinHash signatures: `numHashes` minimum `xxhash64(seed, shingle)`
    * values over the document's token shingles. Pure column expressions
    * (aggregate over the shingle array) — no UDF, no ML-lib vector
    * conversion, stays in codegen.
    */
  def minhashSignature(docs: DataFrame, textCol: String,
                       numHashes: Int, shingleSize: Int): DataFrame = {
    // Each token string is hashed exactly once; shingle hashes are
    // chain-mixed from consecutive token hashes and the k minima are
    // maintained in one native-expression pass — no string shingles,
    // no per-element closure dispatch (NativeExpressions
    // .MinHashSignature). This is the difference between a CPU-bound
    // and an I/O-bound dedup pass at corpus scale.
    val tokenHashes =
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
    docs.withColumn("minhash_sig",
      graft.functions.NativeExpressions.minhashSig(
        tokenHashes, numHashes, shingleSize))
  }

  /** LSH banding: split the signature into `bands` bands of
    * `rows = numHashes / bands` hashes; hash each band; documents
    * sharing ANY band bucket are candidate near-duplicates.
    * Returns candidate pairs (id_a < id_b) — the shuffle key is
    * (band_idx, band_hash), so cluster cost is bucket-local.
    */
  def minhashCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                            numHashes: Int = 32, bands: Int = 8,
                            shingleSize: Int = 3): DataFrame = {
    // tokens -> band bucket ids in ONE native pass (signature computed
    // and banded inside the expression — no per-band slice/cast/join
    // string building, which dominated this operator's scan cost at
    // multi-million-doc scale). Band EQUALITY is preserved from the
    // signature exactly, so candidate pairs are unchanged for non-null
    // documents. NULL-text docs emit NO pairs (the null expression
    // drops their banded rows) — deliberate: the previous string-join
    // banding accidentally hashed every null doc into the same buckets
    // and emitted all-null-pairs, which no dedup pipeline wants.
    // Pinned by DedupOpsSpec.
    val tokenHashes =
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
    val banded = docs.select(
      col(idCol),
      posexplode(graft.functions.NativeExpressions.minhashBands(
        tokenHashes, numHashes, shingleSize, bands)))
      .toDF(idCol, "band_idx", "band_hash")
    val a = banded.select(col(idCol).as("id_a"), col("band_idx"), col("band_hash"))
    val b = banded.select(col(idCol).as("id_b"), col("band_idx"), col("band_hash"))
    // shuffle_hash, not sort-merge: the join feeds an unordered
    // distinct, so SMJ's sort of BOTH banded sides (corpus x bands
    // rows each) is pure loss — it was the operator's only spill at
    // the 50 M-doc stress tier (31 GB). A hash build per partition is
    // bounded by rows/partition, which the partition count controls.
    a.join(b.hint("shuffle_hash"), Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** 64-bit SimHash over tokens: per bit, sum +1/-1 of each token-hash's
    * bit; the sign becomes the fingerprint bit. Near-dups differ in few
    * bits (Hamming distance). Single pass, no shuffle until the
    * fingerprint groupBy.
    */
  def simhash(docs: DataFrame, textCol: String): DataFrame = {
    // Token strings are hashed once; the 64 per-bit tallies and the
    // final sign-pack run in one native-expression loop
    // (NativeExpressions.SimHash64).
    val tokenHashes =
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
    docs.withColumn("simhash",
      graft.functions.NativeExpressions.simhash64(tokenHashes))
  }

  /** Default document-frequency cap for [[tokenJaccardPairs]]: a token
    * in d documents contributes d^2 candidate pairs, so an uncapped hot
    * token (stop word) detonates the inverted-index join at corpus
    * scale. The capped default is the safe operator; pass `None` only
    * for bounded probe sets where exact Jaccard over ALL tokens is
    * required (e.g. an oracle-matched verification query).
    */
  val DefaultMaxDocFreq: Int = 1000

  /** Distinct-token (unigram) Jaccard similarity for all pairs within a
    * probe set — the exact verifier behind MinHash candidates. The join
    * key is the token, so the shuffle is token-partitioned (inverted
    * index), not a cross join.
    */
  def tokenJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("tok"))
    val sizes = tok.groupBy("doc").agg(count(lit(1)).as("n_tok"))
    // Optional document-frequency cap: a token appearing in d documents
    // contributes d^2 candidate pairs, so one stop-word in a 100 TB
    // corpus detonates the inverted-index join. Capped tokens are
    // excluded from the intersection (standard near-dup practice); the
    // oracle-matched exact mode passes None.
    val joinable = maxDocFreq match {
      case Some(cap) =>
        val rare = tok.groupBy("tok").agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= cap).select("tok")
        tok.join(rare, Seq("tok"))
      case None => tok
    }
    val common = joinable.select(col("doc").as("doc_a"), col("tok"))
      .join(joinable.select(col("doc").as("doc_b"), col("tok")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc").as("doc_a"), col("n_tok").as("n_a")), Seq("doc_a"))
      .join(sizes.select(col("doc").as("doc_b"), col("n_tok").as("n_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  /** SimHash near-dup candidate pairs via 16-bit band bucketing
    * (Charikar 2002 / the Manku-Jain-Sarma web-dedup recipe): two
    * fingerprints within Hamming distance `maxHamming` <= bands - 1
    * must agree EXACTLY on at least one of the `bands` disjoint bit
    * blocks (pigeonhole), so bucketing each block and equi-joining
    * surfaces every such pair with recall 1.0 — the only candidates
    * paying a verification probe are same-block collisions, never
    * all-pairs. The exchange carries (band, 16-bit key, id): small
    * fixed-width keys at any corpus size.
    *
    * Output: (id_a, id_b, hamming) for verified pairs, hamming counted
    * over the full 64 bits.
    */
  def simhashBandPairs(docs: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int = 3, bands: Int = 4): DataFrame = {
    require(bands > 0 && 64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming < bands,
      s"pigeonhole guarantee needs maxHamming < bands, got $maxHamming/$bands")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val fp = simhash(docs, textCol)
      .select(col(idCol).as("doc"), col("simhash"))
    val banded = fp.select(col("doc"), col("simhash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          (shiftright(col("simhash"), b * width)
            .bitwiseAND(lit(mask))).as("key"))): _*)).as("bk"))
      .select(col("doc"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded
      .select(col("doc").as("id_a"), col("simhash").as("__sa"),
        col("band"), col("key"))
      .join(banded.select(col("doc").as("id_b"), col("simhash").as("__sb"),
        col("band"), col("key")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sa").bitwiseXOR(col("__sb"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram (shingle) Jaccard for all pairs — the ground truth the
    * MinHash sketch approximates, in the sketch's OWN similarity space
    * (distinct token shingles), unlike [[tokenJaccardPairs]]'s unigram
    * sets. Inverted-index join keyed on `xxhash64(shingle)` so the
    * exchange carries 8-byte keys, never shingle strings (a 2^-64
    * collision would merge two shingles; at any realistic distinct-
    * shingle count that term is below the noise of the data itself).
    * Same document-frequency cap contract as [[tokenJaccardPairs]]:
    * `None` = exact mode for oracle-matched verification.
    */
  def shingleJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                          shingleSize: Int = 3,
                          maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq))
      : DataFrame = {
    require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")
    // Shingle identity = the one-pass native gram hash over token
    // hashes — the SAME identity construction the MinHash banding and
    // the contamination grams use (no string shingles, no interpreted
    // higher-order transform; the first formulation here built
    // "t1 t2 t3" strings through a per-shingle lambda and cost ~6x).
    // Per-doc set sizes ride THROUGH the explode as a column instead of
    // a separate aggregation branch: that removes one full recompute of
    // the explode subtree plus the two size joins at the end — Spark
    // has no DAG-level CSE, so every extra reference to the exploded
    // table is a full re-scan (the two self-join sides canonicalize to
    // one exchange and ARE reused).
    val tokenHashes =
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
    val grams = array_distinct(graft.functions.NativeExpressions
      .gramHashes(tokenHashes, shingleSize))
    val sh = docs
      .select(col(idCol).as("doc"), grams.as("__grams"))
      .select(col("doc"), size(col("__grams")).cast("long").as("n_sh"),
        explode(col("__grams")).as("tok"))
    // df cap via a count window OVER THE JOIN'S OWN tok exchange — not
    // a groupBy+semi-join, which would re-run the explode and shuffle
    // the posting list twice more. The window's hashpartitioning(tok)
    // output satisfies the self-join's distribution requirement, so the
    // whole cap costs one local sort, and the two join sides
    // canonicalize to the same subplan (one exchange, reused).
    val joinable = maxDocFreq match {
      case Some(cap) =>
        sh.withColumn("__df",
            count(lit(1)).over(Window.partitionBy("tok")))
          .filter(col("__df") <= cap).drop("__df")
      case None => sh
    }
    joinable.select(col("doc").as("doc_a"), col("n_sh").as("n_a"), col("tok"))
      .join(joinable.select(col("doc").as("doc_b"), col("n_sh").as("n_b"),
        col("tok")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"),
        max("n_a").as("n_a"), max("n_b").as("n_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  /** Directional shingle-containment pairs — Broder's containment
    * c(A,B) = |S(A) ∩ S(B)| / |S(A)|, the asymmetric near-dup signal
    * symmetric Jaccard misses: a short document quoted verbatim inside
    * a long one scores containment 1.0 while its Jaccard is only
    * ~|A|/|B| (the quote/template/subset-dup detector). A pair is kept
    * when max(c(A,B), c(B,A)) = n_common / min(n_a, n_b) >= `tau`;
    * both directions are emitted so the caller can tell container from
    * contained.
    *
    * Plan is [[shingleJaccardPairs]]' verbatim (native gram-hash
    * shingle identity, per-doc set sizes carried through the explode,
    * df cap as a count window over the join's own exchange, one reused
    * posting-table exchange) — only the final scoring projection
    * differs. Counts are hash-identity-independent, so the SQL oracle
    * replays with string shingles.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       tau: Double, shingleSize: Int = 3,
                       maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq))
      : DataFrame = {
    require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    val tokenHashes =
      transform(TextFunctions.tokens(col(textCol)), t => xxhash64(t))
    val grams = array_distinct(graft.functions.NativeExpressions
      .gramHashes(tokenHashes, shingleSize))
    val sh = docs
      .select(col(idCol).as("doc"), grams.as("__grams"))
      .select(col("doc"), size(col("__grams")).cast("long").as("n_sh"),
        explode(col("__grams")).as("tok"))
    val joinable = maxDocFreq match {
      case Some(cap) =>
        sh.withColumn("__df",
            count(lit(1)).over(Window.partitionBy("tok")))
          .filter(col("__df") <= cap).drop("__df")
      case None => sh
    }
    joinable.select(col("doc").as("doc_a"), col("n_sh").as("n_a"), col("tok"))
      .join(joinable.select(col("doc").as("doc_b"), col("n_sh").as("n_b"),
        col("tok")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_common"),
        max("n_a").as("n_a"), max("n_b").as("n_b"))
      .filter(col("n_common").cast("double") /
        least(col("n_a"), col("n_b")) >= tau)
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") / col("n_a")).as("cont_a"),
        (col("n_common").cast("double") / col("n_b")).as("cont_b"))
  }

  /** LSH candidate-recall evaluation — the dedup-tier counterpart of
    * `AnnEval.recallAtK`: how much of the exact shingle-Jaccard >= tau
    * ground truth does the MinHash banding surface, and at what
    * precision? One summary row: truth/candidate/hit counts, recall
    * (hits over truth) and precision (hits over candidates).
    *
    * Both inputs are pair sets ALREADY bounded by their own operators
    * (banding buckets / the df-capped inverted index), so the full outer
    * join and the final aggregation are O(pairs), never O(corpus^2).
    * Run it on a sampled slice when tuning band counts at 100 TB — the
    * measurement transfers, the exact-truth join cost does not.
    */
  def lshRecall(docs: DataFrame, idCol: String, textCol: String,
                tau: Double, numHashes: Int = 32, bands: Int = 16,
                shingleSize: Int = 3,
                maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq))
      : DataFrame = {
    val cand = minhashCandidatePairs(docs, idCol, textCol,
        numHashes = numHashes, bands = bands, shingleSize = shingleSize)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
        lit(1).as("__c"))
    val truth = shingleJaccardPairs(docs, idCol, textCol, shingleSize,
        maxDocFreq)
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), lit(1).as("__t"))
    cand.join(truth, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        count(col("__t")).as("n_truth"),
        count(col("__c")).as("n_cand"),
        count(when(col("__t").isNotNull && col("__c").isNotNull, 1)).as("n_hit"))
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        round(col("n_hit") / col("n_truth"), 6).as("recall"),
        round(col("n_hit") / col("n_cand"), 6).as("precision"))
  }

  /** Greedy cluster-dedup from candidate pairs: every doc that appears
    * as the larger id in a confirmed near-dup pair is dropped, keepers
    * are the rest. (Union-find-free approximation: keeps canonical =
    * smallest id reachable in one hop; good enough for near-dup removal
    * where clusters are small. For chained clusters use
    * [[dropNearDuplicateClusters]].)
    */
  def dropNearDuplicates(docs: DataFrame, idCol: String,
                         confirmedPairs: DataFrame): DataFrame = {
    val losers = confirmedPairs.select(col("id_b").as(idCol)).distinct()
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Driver-side union-find with min-id roots (path compression +
    * union-by-min): linear in |edges|, exact.
    */
  private def unionFindLabels[T](edges: Array[(T, T)])
                                (implicit ord: Ordering[T]): Seq[(T, T)] = {
    val parent = scala.collection.mutable.Map.empty[T, T]
    def add(x: T): Unit = if (!parent.contains(x)) parent(x) = x
    def find(x: T): T = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      add(a); add(b)
      val ra = find(a)
      val rb = find(b)
      if (ra != rb) {
        if (ord.lt(ra, rb)) parent(rb) = ra else parent(ra) = rb
      }
    }
    parent.keys.toSeq.map(k => k -> find(k))
  }

  /** Connected components over confirmed near-dup pairs: every vertex
    * is labeled with the MINIMUM id reachable in its cluster
    * (transitive closure — handles a~b, b~c chains where the one-hop
    * rule would treat a and c as unrelated canonicals).
    *
    * Tiered execution, the shape real systems use:
    *  - pair sets up to `driverThreshold` rows (the NORMAL case —
    *    verified near-dup pairs are tiny relative to the corpus)
    *    collect to the driver and run exact union-find: one job, no
    *    iteration.
    *  - larger graphs run iterative min-label propagation: each round
    *    joins the label table to the (symmetrized, deduped) edge list
    *    and takes the per-vertex min — rounds needed = graph diameter,
    *    which for near-dup clusters is tiny (dup groups are
    *    near-cliques). Cost O(diameter x |edges| shuffle); refuses to
    *    return silently-truncated labels if maxIter is hit.
    *
    * @return (id, label) — label is the cluster's canonical (min) id.
    *   On the distributed tier the returned frame is MATERIALIZED (an
    *   eager local checkpoint — its lineage would otherwise be the
    *   whole convergence loop); the blocks are released by the
    *   ContextCleaner once the frame drops out of scope.
    */
  /** @param reliableCheckpoint distributed-tier rounds checkpoint to
    *   the reliable store instead of executor-local blocks
    *   ([[Checkpoints.materialize]]) — survives executor loss at the
    *   cost of one distributed write per round. Results identical.
    */
  def duplicateClusters(pairs: DataFrame, maxIter: Int = 20,
                        driverThreshold: Long = 1000000L,
                        reliableCheckpoint: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    val spark = pairs.sparkSession
    import spark.implicits._
    val idType = pairs.schema("id_a").dataType
    // a driver collect() is capped at Int.MaxValue rows anyway — clamp
    // the threshold so the probe below cannot misclassify (or overflow
    // on threshold + 1) for absurdly large thresholds
    val thr = math.min(driverThreshold, (Int.MaxValue - 1).toLong)
    val cached = pairs.cache()
    try {
      val smallEnough = thr > 0 &&
        cached.limit((thr + 1).toInt).count() <= thr
      if (smallEnough) idType match {
        case ByteType | ShortType | IntegerType | LongType =>
          val edges = cached.select(col("id_a").cast("long"), col("id_b").cast("long"))
            .as[(Long, Long)].collect()
          unionFindLabels(edges).toDF("id", "label")
            .select(col("id").cast(idType).as("id"),
              col("label").cast(idType).as("label"))
        case StringType =>
          val edges = cached.select(col("id_a"), col("id_b"))
            .as[(String, String)].collect()
          unionFindLabels(edges).toDF("id", "label")
        case _ => distributedClusters(cached, maxIter, reliableCheckpoint)
      } else distributedClusters(cached, maxIter, reliableCheckpoint)
    } finally cached.unpersist()
  }

  private def distributedClusters(pairs: DataFrame, maxIter: Int,
                                  reliable: Boolean): DataFrame = {
    val spark = pairs.sparkSession
    // AQE re-plans every exchange of every iteration as its own query
    // stage with runtime stats — the right call for one 100 GB join,
    // pure per-iteration driver latency for a convergence loop that
    // schedules the same three small exchanges `diameter` times. Turn
    // it off for the loop's jobs only (results are unaffected; AQE is
    // a physical-planning concern) and restore the caller's setting.
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.getOption(aqeKey)
    spark.conf.set(aqeKey, "false")
    try distributedClustersLoop(pairs, maxIter, reliable)
    finally prevAqe match {
      case Some(v) => spark.conf.set(aqeKey, v)
      case None => spark.conf.unset(aqeKey)
    }
  }

  private def distributedClustersLoop(pairs: DataFrame, maxIter: Int,
                                      reliable: Boolean): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().cache()
    // The label table starts as a MATERIALIZED LEAF and stays one:
    // every round eagerly localCheckpoints its result, so the plan
    // entering round t is always join(leaf, leaf) -> agg, never the
    // t-round history. A cache-only loop materializes the DATA but
    // leaves the logical tree growing THREE references per round
    // (propagation join + union + changed-join) — exponential
    // analysis/canonicalization work that near-clique dup graphs (2-3
    // rounds) never expose; the 100-diameter chain stress caught it
    // blowing past 50x per-round cost by round ~12. Superseded
    // checkpoint generations are freed by the ContextCleaner as they
    // drop out of scope.
    //
    // FAULT-TOLERANCE (multi-executor deploys): the default
    // localCheckpoint blocks are UNREPLICATED executor-local RDD
    // blocks with truncated lineage — losing an executor mid-loop
    // fails the job (acceptable: the loop restarts from the pairs
    // input, which IS recomputable). Where that retry cost matters,
    // pass reliableCheckpoint=true (+ setCheckpointDir) and each round
    // persists to the reliable store instead — Checkpoints.materialize
    // documents the trade.
    var labels = Checkpoints.materialize(
      edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")), reliable)
    // ONE action per round (r13, guide §2.6: fewer actions, not fewer
    // iterations): the old-label rides the propagation union as an
    // extra column (labels is unique per id and — edges being
    // symmetrized — every id is its own src, so max(__old) recovers
    // exactly the pre-round label), and the round's change count rides
    // the materialization itself through an accumulator instead of a
    // separate join+count job. Accumulator semantics are safe here
    // because only changed==0 is decision-relevant: a retried or
    // speculative task can only INFLATE the count (never suppress an
    // increment from a successful pass), and inflation just runs one
    // more (idempotent) round.
    val changedAcc =
      pairs.sparkSession.sparkContext.longAccumulator("graft.cc.changed")
    val bumpChanged = udf { c: Boolean => if (c) changedAcc.add(1L); c }
      .asNondeterministic()
    // the materialized LEAF of the current generation (labels is a
    // projection of it); release() must see the leaf itself
    var leaf = labels
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val before = changedAcc.value
      val prop = Checkpoints.materialize(
        edges.join(labels, edges("src") === labels("id"))
          .select(col("dst").as("id"), col("label"),
            lit(null).cast(labels.schema("label").dataType).as("__old"))
          .unionByName(labels.withColumn("__old", col("label")))
          .groupBy("id").agg(min("label").as("label"),
            max("__old").as("__old"))
          .withColumn("__chg",
            bumpChanged(col("label") =!= col("__old"))), reliable)
      changed = changedAcc.value - before
      // the superseded generation is dead once `prop` is a leaf and
      // the accumulator consumed the round — free its reliable-store
      // files now (retention is then 2 tables, not one per round)
      val prev = leaf
      leaf = prop
      labels = prop.select(col("id"), col("label"))
      Checkpoints.release(prev)
      iter += 1
    }
    edges.unpersist()
    // silent truncation would hand wrong canonicals to the drop step —
    // refuse instead (near-dup clusters are near-cliques, so hitting
    // this means either maxIter is unreasonably low or the pair graph
    // is not a dup graph)
    if (changed > 0) {
      throw new IllegalStateException(
        s"duplicateClusters did not converge in $maxIter iterations " +
          s"($changed labels still changing); raise maxIter")
    }
    labels
  }

  /** Cluster-aware near-dup drop: keeps exactly one doc (the minimum
    * id) per connected duplicate cluster, docs in no pair survive.
    */
  def dropNearDuplicateClusters(docs: DataFrame, idCol: String,
                                confirmedPairs: DataFrame): DataFrame = {
    val losers = duplicateClusters(confirmedPairs)
      .filter(col("id") =!= col("label"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Canonical-document selection: within each duplicate cluster keep
    * the BEST member by `scoreCol` (ties to the smaller id), not the
    * smallest-id member — the keep-longest / keep-highest-quality
    * policy real dedup pipelines apply (dropping by id throws away the
    * best copy of a template family). Docs in no cluster are their own
    * canonical.
    *
    * Plan shape: one broadcast-or-shuffle join of the doc ids/scores
    * against the (bounded: one row per clustered doc) label table,
    * then ONE window keyed on the cluster label — no text rides any
    * exchange, and the window partitions are cluster-sized (near-dup
    * clusters are small by construction; a pathological mega-cluster
    * skews exactly one partition and AQE splits it). At 100 TB the
    * join input is (id, score) pairs only.
    *
    * @param clusters (id, label) as produced by [[duplicateClusters]]
    * @return (idCol, canonical_id, keep) — keep = this doc IS its
    *   cluster's canonical
    */
  def canonicalPerCluster(docs: DataFrame, idCol: String, scoreCol: String,
                          clusters: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val labeled = docs.select(col(idCol), col(scoreCol))
      .join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("__lbl", coalesce(col("label"), col(idCol)))
    val w = Window.partitionBy(col("__lbl"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    labeled
      .withColumn("canonical_id", first(col(idCol)).over(w))
      .select(col(idCol), col("canonical_id"),
        (col(idCol) === col("canonical_id")).as("keep"))
  }
}
