package graft

/** Plan-shape regression guards: the queries' physical plans must keep
  * the properties that make them scale (broadcast dims, single-shuffle
  * dedup, pushed filters). A refactor that silently turns the 9-way
  * join into sort-merge shuffles would pass row-level tests and
  * detonate at 100 TB — this spec fails instead.
  */
class PlanHygieneSpec extends SparkTestBase {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf("sf0.001")).queryExecution.executedPlan.toString

  test("q_multijoin: all eight dims broadcast, no sort-merge join") {
    val p = plan("q_multijoin")
    assert("BroadcastHashJoin".r.findAllIn(p).size === 8, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dims must not shuffle-join")
  }

  test("q_dedup_latest: exactly one shuffle exchange, no join") {
    val p = plan("q_dedup_latest")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
    assert(!p.contains("Join"), "window-max dedup must not plan a join")
  }

  test("q_asof: one shuffle over the union, filters pushed to scans") {
    val p = plan("q_asof")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]")
      || p.contains("EqualTo(event_type,purchase)"), "probe filter must reach the scan")
  }

  test("q1_agg: partial aggregation before the exchange") {
    val p = plan("q1_agg")
    val firstHashAgg = p.indexOf("HashAggregate")
    val exchange = p.indexOf("Exchange")
    assert(firstHashAgg >= 0 && exchange >= 0)
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "map-side partial aggregate missing")
  }

  test("q_simsearch: map-side top-k truncation, no window over the pair stream") {
    val p = plan("q_simsearch")
    assert(!p.contains("Window"), "brute top-k must not rank with a window")
    assert(p.contains("partial_topk"),
      "map-side partial top-k missing — the exchange would carry every scored pair")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("q_ivf_ann: row-local cell assignment — no exchange before the candidate join") {
    val p = plan("q_ivf_ann")
    assert(!p.contains("Window"), "IVF must not rank cells with a window")
    assert(p.contains("partial_topk"), "map-side partial top-k missing")
    // the grouped top-k's exchange is the ONLY shuffle: assignment is a
    // row-local argmax over literal centroids, the candidate join
    // broadcasts the probe side
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("q_cosine_dupes: bucketed candidates, never an all-pairs nested loop") {
    val p = plan("q_cosine_dupes")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "LSH dupe pairs must not plan an all-pairs join")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.forall(k => !k.contains("__v")),
      s"candidate dedup must shuffle ids, not vectors: $exchangeKeys")
  }

  test("q_srp_ann: exchanges keyed on ids/buckets only, vectors never shuffle keys") {
    val p = plan("q_srp_ann")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.nonEmpty)
    assert(exchangeKeys.forall(k => !k.contains("__pv") && !k.contains("__cv")
      && !k.contains("embedding")),
      s"exchange keys must be ids, not embeddings: $exchangeKeys")
    assert(p.contains("partial_topk"), "map-side partial top-k missing")
  }

  test("q_interval_join: bucketed equi-join, never a nested loop") {
    val p = plan("q_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "interval join must decompose to an equi-join on (key, bucket)")
  }

  test("q_quantize: map-only — no shuffle anywhere in the plan") {
    val p = plan("q_quantize")
    assert(!p.contains("Exchange"),
      s"quantization must stay scan-bound, no exchange:\n${p.take(2000)}")
  }

  test("q_redact / q_split / q_sample / q_source_mix: map-only corpus passes") {
    Seq("q_redact", "q_split", "q_sample", "q_source_mix").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q must not shuffle:\n${p.take(1000)}")
    }
  }

  test("q_shuffle: range partitioning, not a single-reducer global sort") {
    val p = plan("q_shuffle")
    assert(p.contains("Exchange rangepartitioning"),
      s"global shuffle must range-partition:\n${p.take(2000)}")
  }

  test("q_tfidf: corpus size rides as a broadcast, not a driver literal") {
    val p = plan("q_tfidf")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      s"N must be a broadcast single-row aggregate:\n${p.take(2000)}")
    // tf/df aggregations keep map-side partials
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "partial aggregation missing in tf/df computation")
  }

  test("q_contamination: inverted-index equi-joins only, partial aggs kept") {
    val p = plan("q_contamination")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "contamination must join on the ngram, never doc x doc")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "map-side partial aggregation missing")
  }

  test("q_approx_percentile / q_approx_distinct: sketches keep map-side partials") {
    val pp = plan("q_approx_percentile")
    // mergeable sketch state through one exchange — no per-group sort
    assert(pp.contains("partial_percentile") || pp.contains("partial_approx"),
      s"q_approx_percentile lost its partial aggregation:\n${pp.take(2000)}")
    assert("Exchange hashpartitioning".r.findAllIn(pp).size === 1,
      s"q_approx_percentile must shuffle exactly once:\n${pp.take(2000)}")
    // the HLL side must keep its canonical shape: scan-side partial
    // sketches grouped by the GROUP key only (never keyed per value,
    // which is what fusing into the count-distinct expand would do)
    val pd = plan("q_approx_distinct")
    assert(
      "HashAggregate\\(keys=\\[l_returnflag[^\\]]*\\], functions=\\[partial_approx_count_distinct"
        .r.findAllIn(pd).nonEmpty,
      s"HLL partials must be grouped by l_returnflag only:\n${pd.take(3000)}")
  }

  test("q_json_extract_variant: map-only scan, single parse") {
    val p = plan("q_json_extract_variant")
    assert(!p.contains("Exchange"),
      s"variant extraction must stay scan-bound:\n${p.take(2000)}")
    assert("parse_json".r.findAllIn(p).size <= 1,
      "the document must be parsed once, not per field")
  }

  test("q_text_stats: native one-pass stats, no interpreted lambda in the plan") {
    val p = plan("q_text_stats")
    assert(!p.contains("Exchange"), "per-doc stats must not shuffle")
    assert(!p.contains("LambdaFunction") && !p.contains("ArrayAggregate") &&
      !p.contains("ArrayFilter"),
      s"token stats fell back to higher-order functions:\n${p.take(2000)}")
  }

  test("q_dsir: native one-pass scoring, no lambda and no shuffle") {
    val p = plan("q_dsir")
    assert(!p.contains("Exchange"),
      s"DSIR scoring must stay a map-only projection:\n${p.take(2000)}")
    assert(!p.contains("LambdaFunction") && !p.contains("ArrayAggregate"),
      s"DSIR scoring fell back to the interpreted per-token fold:\n${p.take(2000)}")
    assert(p.toLowerCase.contains("dsirscore"),
      s"expected the native DsirScore expression in the plan:\n${p.take(2000)}")
  }

  test("q_contamination_stream: row-local probe — no join, no shuffle") {
    val p = plan("q_contamination_stream")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"the arrival-time probe must stay map + filter only:\n${p.take(2000)}")
    assert(p.toLowerCase.contains("gramhitcount"),
      s"expected the native GramHitCount probe in the plan:\n${p.take(2000)}")
  }

  test("q_kmeans: final assignment is map-only with the native argmax") {
    val p = plan("q_kmeans")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"the assignment scan must not shuffle or join:\n${p.take(2000)}")
    assert(p.toLowerCase.contains("nearestcells"),
      s"expected the native NearestCells assignment:\n${p.take(2000)}")
  }

  test("q_gopher_rules: map-only scan, no interpreted per-token lambda") {
    val p = plan("q_gopher_rules")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"rule filtering must stay a single map-only pass:\n${p.take(2000)}")
    assert(!p.contains("LambdaFunction") && !p.contains("ArrayFilter") &&
      !p.contains("ArrayAggregate"),
      s"a rule fell back to higher-order functions:\n${p.take(2000)}")
  }

  test("q_bigram_lm: native bigram expansion, no lambda in the hot path") {
    val p = plan("q_bigram_lm")
    assert(p.toLowerCase.contains("ngramarray"),
      s"expected the native NgramArray bigram expansion:\n${p.take(2000)}")
    assert(!p.contains("LambdaFunction") && !p.contains("ArrayAggregate"),
      s"bigram expansion fell back to interpreted HOFs:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct"),
      s"model join must stay an equi-join:\n${p.take(2000)}")
  }

  test("q_pq_ann: native encoding, broadcast ADC probe, map-side top-k") {
    val p = plan("q_pq_ann")
    assert(p.toLowerCase.contains("nearestcells"),
      s"expected the native NearestCells subspace encoding:\n${p.take(2000)}")
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the probe/table set must broadcast against the encoded corpus:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"candidate streaming must not shuffle the corpus:\n${p.take(2000)}")
    assert(p.contains("ObjectHashAggregate"),
      s"top-k must truncate map-side via the typed aggregator:\n${p.take(2000)}")
  }

  test("q_heavy_hitters: sketch aggregates map-side, no term matrix shuffle") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("ObjectHashAggregate"),
      s"the MG sketch must plan as ObjectHashAggregate:\n${p.take(2000)}")
    assert(!p.contains("Window") && !p.contains("SortAggregate"),
      s"ranking must come from the sketch, not a window over the matrix:\n${p.take(2000)}")
  }

  test("q_grouping_sets: one Expand + one aggregation, no per-set rescan") {
    val p = plan("q_grouping_sets")
    assert(p.contains("Expand"),
      s"grouping sets must plan through Expand:\n${p.take(2000)}")
    assert(!p.contains("Union"),
      s"grouping sets must not rescan per set:\n${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size <= 4, // partial+final
      s"expected a single partial+final aggregation pair:\n${p.take(2000)}")
  }

  test("q_bpe_pairs: both aggregations keep map-side partials") {
    val p = plan("q_bpe_pairs")
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      s"word-type and pair counts must both aggregate partially:\n${p.take(2000)}")
    assert(!p.contains("Join"), "pair counting must not plan a join")
  }

  test("q_contamination_bloom: bloom probe sits on the train scan side") {
    val p = plan("q_contamination_bloom")
    assert(p.toLowerCase.contains("bloommightcontain"),
      s"train n-grams must pass the Bloom pre-filter before aggregation:\n${p.take(2000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "must stay an inverted-index equi-join")
  }

  test("q_dup_clusters tiers: driver tier is a local scan, dist tier provably iterates") {
    // the default tier collects the (tiny) pair graph and runs exact
    // union-find on the driver — its result frame is a materialized
    // local relation, no distributed join left in the plan
    val driver = plan("q_dup_clusters")
    assert(!driver.contains("Join"),
      s"driver union-find tier must not leave a distributed join:\n${driver.take(2000)}")
    // driverThreshold = 0 must force the iterative min-label
    // propagation, and the returned frame must be the MATERIALIZED
    // LEAF of the convergence loop (eager local checkpoint — the
    // chain-diameter fix: a result plan that still embedded the join
    // history grew exponentially with rounds). The iteration itself
    // is bar-checked by DedupOpsSpec and the dup_chain_cc stress.
    val dist = SparkEntry.queries("q_dup_clusters_dist")(spark, sf("sf0.001"))
      .queryExecution.analyzed.toString
    assert(dist.contains("LogicalRDD"),
      s"distributed tier must return a checkpointed leaf:\n${dist.take(2000)}")
    assert(!dist.contains("Join"),
      "distributed tier's RESULT lineage must be truncated — a Join " +
        s"here means the convergence loop leaked its history:\n${dist.take(2000)}")
  }

  test("q_graph_ann_dist: one cell-keyed exchange, no join, row-local assignment") {
    // the distributed NSW build's scale contract: assignment is a
    // row-local expression over the broadcast-sized centroid matrix
    // (never a join), the ONE exchange is the corpus groupBy on
    // cell_id feeding the executor-local per-cell builds (MapGroups),
    // and the stitch edges ride a local relation — no second shuffle
    val p = plan("q_graph_ann_dist")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      p.take(3000))
    assert(!p.contains("Join"),
      "assignment/stitch must not plan a join")
    assert(p.contains("MapGroups"),
      "per-cell NSW build must run as executor-local MapGroups")
  }

  test("q_dup_spans: exchanges carry (hash, doc, pos) — never document text") {
    val p = plan("q_dup_spans")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.nonEmpty)
    assert(exchangeKeys.forall(k => !k.contains("text")),
      s"span dedup must shuffle gram hashes, not text: $exchangeKeys")
    assert(!p.contains("Join"), "span detection is window-based, no self-join")
  }

  test("q_quantized_ann: both ranking stages keep map-side partial top-k") {
    val p = plan("q_quantized_ann")
    assert(!p.contains("Window"), "quantized ANN must not rank with a window")
    assert("partial_topk".r.findAllIn(p).size >= 2,
      "both the candidate sieve and the exact rescore must truncate map-side")
  }

  test("q_scd2: one window pass, no self-join") {
    val p = plan("q_scd2")
    assert(!p.contains("Join"), "SCD2 must not join the change log to itself")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("q_mix_temperature: rates broadcast back, corpus never shuffle-joins") {
    val p = plan("q_mix_temperature")
    assert(p.contains("BroadcastHashJoin"),
      s"per-source rate table must broadcast:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must not shuffle for the tiny rate join")
  }

  test("q_pipeline: two exchanges end to end, no join anywhere") {
    val p = plan("q_pipeline")
    assert(!p.contains("Join"),
      s"quality/dedup/split/pack compose without any join:\n${p.take(2000)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 2,
      s"exactly the dedup window + pack-shard window exchanges:\n${p.take(2000)}")
  }

  test("q_bm25: broadcast df/stats, heap top-k — no global sort, no window") {
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must plan as per-partition heaps, not a global sort:\n${p.take(2000)}")
    assert(!p.contains("Window"), "BM25 must not rank with a window")
    assert(p.contains("BroadcastExchange"),
      "the |query|-row df table and single-row stats must broadcast")
  }

  test("q_semdedup: pairs are cell-bucketed equi-joins, never all-pairs") {
    val p = plan("q_semdedup")
    assert(!p.contains("CartesianProduct") &&
           !p.contains("BroadcastNestedLoopJoin"),
      s"within-cluster pairing must key on cell_id:\n${p.take(2000)}")
    assert(!p.contains("Window"),
      "assignment is the row-local native argmax, not a ranking window")
  }

  test("q_knn_classify: neighbor search truncates map-side") {
    val p = plan("q_knn_classify")
    assert(p.contains("partial_topk"),
      "map-side partial top-k missing — the exchange would carry every scored pair")
    assert(!p.contains("CartesianProduct"),
      "probe x corpus scoring must be the broadcast pair generator")
  }

  test("q_window_lag: one shuffle keyed on user_id, no join") {
    val p = plan("q_window_lag")
    assert(p.contains("Window"), p.take(2000))
    assert(!p.contains("Join"), "lag must not plan a self-join")
    val exchanges = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchanges.size === 1, s"lag needs exactly one shuffle: $exchanges")
    assert(exchanges.head.contains("user_id"),
      s"the shuffle must key on the partition column: ${exchanges.head}")
  }

  test("q_dataset_card: single scan, no join — one pass builds the card") {
    val p = plan("q_dataset_card")
    assert(!p.contains("Join"), "the dataset card must not self-join the corpus")
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"one corpus scan only:\n${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "map-side partial aggregation missing — every doc row would hit one reducer")
  }

  test("q_lsh_recall: inverted-index joins only, keys are hashes not shingles") {
    val p = plan("q_lsh_recall")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"truth pairing must invert on the shingle key, never all-pairs:\n${p.take(2000)}")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.forall(k => !k.contains("shingle")),
      s"exchanges must carry 8-byte shingle hashes, not strings: $exchangeKeys")
  }

  test("q_oov_rate: scoring is map-only — vocab rides as a literal") {
    val p = plan("q_oov_rate")
    assert(!p.contains("Exchange"), s"OOV scoring must not shuffle:\n${p.take(2000)}")
    assert(!p.contains("Join"), "OOV scoring must not join")
  }

  test("q_winsorize: thresholds broadcast back, fact table never re-shuffles for the clamp") {
    val p = plan("q_winsorize")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "per-group thresholds must broadcast")
  }

  test("q_length_buckets: one shuffle on the bucket key, partial agg first") {
    val p = plan("q_length_buckets")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "map-side partial aggregation missing")
  }

  test("q_weighted_sample: map-only key + top-k heaps, corpus never shuffles") {
    val p = plan("q_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
    assert(!p.contains("Exchange hashpartitioning"),
      "weighted sampling must not shuffle the corpus")
  }

  test("q_simhash_pairs: band-bucketed equi-join, never all-pairs") {
    val p = plan("q_simhash_pairs")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"simhash pairing must bucket on (band, key):\n${p.take(2000)}")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.forall(k => !k.contains("text")),
      s"exchanges must carry band keys, not documents: $exchangeKeys")
  }

  test("q_lexical_diversity: map-only — no shuffle, no join") {
    val p = plan("q_lexical_diversity")
    assert(!p.contains("Exchange"), s"must not shuffle:\n${p.take(2000)}")
    assert(!p.contains("Join"), "must not join")
  }

  test("q_source_kl: exchanges keyed on source/term aggregates, never text") {
    val p = plan("q_source_kl")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.nonEmpty)
    assert(exchangeKeys.forall(k => !k.contains("text")),
      s"exchange keys must be source/term, not documents: $exchangeKeys")
    assert(!p.contains("CartesianProduct"),
      "the corpus-total join must be a single-row broadcast")
  }

  test("q_doc_novelty: hash-agg over the gram exchange, no window, skinny join back") {
    // the r6 spill fix replaced the count-window (WindowExec fully
    // sorts every exploded partition — 56 GB spill at tier-2) with a
    // (count, min) hash aggregation on the gram key; df=1 survivors
    // re-aggregate per owner doc and join back to the per-doc gram
    // counts on the id — every exchange carries bounded skinny rows
    val p = plan("q_doc_novelty")
    assert(!p.contains("Window"),
      "novelty must aggregate gram df, not window over the gram stream")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the count join-back must stay id-keyed")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.size <= 3,
      s"gram repartition + owner agg + id join-back = at most three shuffles: $exchangeKeys")
    assert(exchangeKeys.forall(k => !k.contains("text")),
      s"exchanges must carry gram hashes/ids, not documents: $exchangeKeys")
  }

  test("q_calibration: fixed-bin reliability — no global-order window, id-keyed joins only") {
    val p = plan("q_calibration")
    assert(!p.contains("Window"),
      "binning must be fixed-width map-only, never ntile/global sort")
    // (the NB chain's single-row constant cross rides a broadcast
    // nested loop by design — the q_source_kl stance)
    assert(!p.contains("CartesianProduct"),
      s"truth join must stay id-keyed:\n${p.take(2000)}")
  }

  test("q_bfs_hops: frontier joins stay id-keyed equi-joins") {
    val p = plan("q_bfs_hops")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"every hop must be an equi-join on node ids:\n${p.take(2000)}")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.forall(k => !k.contains("text")),
      s"exchanges carry node ids only: $exchangeKeys")
  }

  test("q_adamic_adar: wedge equi-joins on middle ids, never all-pairs") {
    val p = plan("q_adamic_adar")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"wedge generation must equi-join on the middle node:\n${p.take(2000)}")
    assert(!p.contains("Window"), "pair aggregation must hash, not rank")
    // drift-watch for the r7 regression (bench 3.66 -> 5.97 s): the
    // existing-edge anti-join must NEVER plan as a shuffled join over
    // the raw Σ deg² wedge stream. Healthy shape: the anti-join is a
    // BROADCAST (canon is edge-bounded, orders smaller than wedges),
    // and the wedge stream is reduced by a map-side partial aggregate
    // BEFORE its single pair-keyed exchange.
    assert("BroadcastHashJoin [^\\n]*LeftAnti".r.findAllIn(p).size === 1,
      s"existing-edge anti-join must broadcast, not shuffle:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "no join may shuffle the wedge stream")
    assert(
      "HashAggregate\\(keys=\\[a#\\d+L?, b#\\d+L?\\], functions=\\[partial_count"
        .r.findAllIn(p).nonEmpty,
      s"pair scores must partial-aggregate map-side:\n${p.take(2000)}")
    // the weighted wedge stream (__w) itself never rides an exchange:
    // every pair-keyed exchange sits above an aggregate, not above the
    // raw wedge projection
    val rawWedgeExchange =
      "Exchange hashpartitioning[^\\n]*\\n[^\\n]*Project [^\\n]*__w".r
    assert(rawWedgeExchange.findFirstIn(p).isEmpty,
      s"raw weighted wedges must not shuffle:\n${p.take(2000)}")
  }

  test("q_zipf: regression runs over the bounded top-k frame, not the vocabulary") {
    val p = plan("q_zipf")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-100 must plan as per-partition heaps:\n${p.take(2000)}")
    assert(!p.contains("Join"), "zipf fit must not join")
  }

  test("q_chunk_overlap: row-local windowing — no shuffle, no join") {
    val p = plan("q_chunk_overlap")
    assert(!p.contains("Exchange"), s"chunking must not shuffle:\n${p.take(2000)}")
    assert(!p.contains("Join"), "chunking must not join")
  }

  test("q_dup_mass_by_source: exchanges carry hashes and source keys, not text") {
    val p = plan("q_dup_mass_by_source")
    assert(!p.contains("Join"), "dup attribution must not join")
    val exchangeKeys = "Exchange hashpartitioning\\([^)]*".r.findAllIn(p).toList
    assert(exchangeKeys.size === 2,
      s"hash window + source agg = exactly two shuffles: $exchangeKeys")
    assert(exchangeKeys.forall(k => !k.contains("text")),
      s"exchange keys must be hashes/sources, not documents: $exchangeKeys")
  }

  test("q_normalize: map-only — no exchange, native expression in codegen span") {
    val p = plan("q_normalize")
    assert(!p.contains("Exchange"), s"normalization must not shuffle:\n${p.take(2000)}")
    assert(p.contains("*("), "NormalizeText fell out of whole-stage codegen")
  }

  test("q_hard_negatives: probes broadcast, map-side top-k, one exchange") {
    val p = plan("q_hard_negatives")
    assert(p.contains("partial_topk"), "map-side top-k truncation missing")
    assert(!p.contains("SortMergeJoin"), "probe side must broadcast")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
  }

  test("q_fuzzy_match: every join an equi-join — no cartesian/nested loop") {
    val p = plan("q_fuzzy_match")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "block key must plan as an equi-join key")
  }

  test("q_source_cap: one exchange keyed on the group column") {
    val p = plan("q_source_cap")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
    assert(!p.contains("Join"), "cap is a window, not a join")
  }

  test("q_funnel / q_retention: no nested-loop joins, aggregates partial") {
    Seq("q_funnel", "q_retention").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: ${p.take(1500)}")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: ${p.take(1500)}")
    }
  }

  test("q_unpivot: map-only Expand — no exchange") {
    val p = plan("q_unpivot")
    assert(p.contains("Expand"), "unpivot should plan as Expand")
    assert(!p.contains("Exchange"), s"melt must not shuffle:\n${p.take(2000)}")
  }

  test("q_session_ids: ONE user-keyed exchange for both window passes") {
    val p = plan("q_session_ids")
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1,
      s"lag flag and running sum must share the user exchange:\n${p.take(2000)}")
  }

  test("q_zscore: group stats broadcast — fact table never shuffles") {
    val p = plan("q_zscore")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "stats must broadcast")
  }

  test("q_pagerank: iterations are equi-joins + aggregations; the only " +
      "nested loop is the 1-row n scalar attach") {
    val p = plan("q_pagerank")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // rank propagation and degree attach stay equi-joins
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    // r13: n rides the plan as a broadcast 1-row aggregate instead of
    // a driver count() action (PageRank.scala) — the MarketBasket
    // crossJoin(n) pattern. Each reference plans a
    // BroadcastNestedLoopJoin whose BUILD side is that single row
    // (O(rows), never a cartesian): at most one per iteration plus the
    // rank init, and the scalar column must be present.
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(bnl <= 4 && p.contains("__n"), p.take(2000))
  }

  test("q_cluster_purity: post-assignment work is windows over the bounded (cell,label) frame") {
    val p = plan("q_cluster_purity")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the assignment itself is the row-local NearestCells expression —
    // no join against a centroid table
    assert(p.contains("nearestcells") || p.toLowerCase.contains("nearestcells"),
      "cell assignment must be the row-local native expression")
  }

  test("changelog snapshotAt: one exchange, no dedup pass, shard pruning " +
      "bounds the scan to the history touched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan-tt").toString
    val sink = new graft.streaming.UpsertJoin.ParquetUpsertSink(spark,
      s"$tmp/out", nBuckets = 4, changelogDir = Some(s"$tmp/cl"))
    // 18 batches span two shard dirs (ShardEvery = 16): cl_shard=0
    // holds batches 0..15, cl_shard=1 holds 16..17
    (0 until 18).foreach { i =>
      sink.upsert("k", Seq(("a", i.toLong, s"v$i")).toDF("k", "ts", "p"))
    }
    val df = sink.snapshotAt("k", 1L)
    val p = df.queryExecution.executedPlan.toString
    // exactly ONE exchange: the key-partitioned window. The old
    // log.distinct() cost a second, full-width one (plus an aggregate)
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
    assert(!p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"no dedup aggregate — row_number()=1 already collapses retries:\n${p.take(2000)}")
    // the shard predicate must reach the scan as a PARTITION filter
    assert(p.contains("PartitionFilters") && p.contains("cl_shard"),
      s"shard predicate missing from partition filters:\n${p.take(2000)}")
    // and empirically: only shard 0's files are opened
    assert(df.collect().nonEmpty)
    val scans = graft.plans.PlanFiles.fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "expected a FileSourceScan in the final plan")
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    val shard0Files = new java.io.File(s"$tmp/cl/cl_shard=0").listFiles()
      .count(_.getName.endsWith(".parquet"))
    val shard1Files = new java.io.File(s"$tmp/cl/cl_shard=1").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(shard1Files > 0, "test setup: shard 1 must exist to be prunable")
    assert(filesRead === shard0Files,
      s"pruning must skip shard 1: read $filesRead, shard0=$shard0Files shard1=$shard1Files")
  }

  test("checkpointed snapshotAt: the log scan is bounded by checkpoint " +
      "cadence — prefix shards before the anchor are never opened") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan-ckpt").toString
    val sink = new graft.streaming.UpsertJoin.ParquetUpsertSink(spark,
      s"$tmp/out", nBuckets = 4, changelogDir = Some(s"$tmp/cl"),
      changelogCheckpointEvery = 16)
    // 40 batches span three shard dirs (0: 0..15, 1: 16..31, 2: 32..39);
    // cadence 16 lands checkpoints at batches 15 and 31
    (0 until 40).foreach { i =>
      sink.upsert("k", Seq(("a", i.toLong, s"v$i")).toDF("k", "ts", "p"))
    }
    val df = sink.snapshotAt("k", 37L)
    assert(df.collect().nonEmpty)
    val filesRead = graft.plans.PlanFiles
      .filesRead(df.queryExecution.executedPlan)
    def files(dir: String) = {
      val fs = new java.io.File(dir).listFiles()
      if (fs == null) 0 else fs.count(_.getName.endsWith(".parquet"))
    }
    val bound = files(s"$tmp/cl/_ckpt/ckpt=31") +
      files(s"$tmp/cl/cl_shard=1") + files(s"$tmp/cl/cl_shard=2")
    val shard0 = files(s"$tmp/cl/cl_shard=0")
    assert(shard0 > 0, "test setup: the prunable prefix shard must exist")
    // anchor = ckpt 31; tail shards >= 31/16 = 1. Shard 0 — 16 of the
    // 40 batches, and every pre-anchor batch — is never opened, so the
    // fold's read cost is set by the CADENCE, not total history length
    assert(filesRead === bound,
      s"read $filesRead files, expected ckpt31+shards1,2 = $bound " +
        s"(prefix shard0 holds $shard0 files that must stay unread)")
  }

  test("changelogChangesBetween: one aggregate exchange, shard dirs " +
      "pruned from BOTH ends of the window") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-plan-diff").toString
    val sink = new graft.streaming.UpsertJoin.ParquetUpsertSink(spark,
      s"$tmp/out", nBuckets = 4, changelogDir = Some(s"$tmp/cl"))
    // 40 batches span three shard dirs (0: 0..15, 1: 16..31, 2: 32..39)
    (0 until 40).foreach { i =>
      sink.upsert("k", Seq(("a", i.toLong, s"v$i")).toDF("k", "ts", "p"))
    }
    // window (17, 30]: wholly inside shard 1 — shards 0 and 2 must
    // never be opened (lower bound 17/16 = 1, upper 30/16 = 1)
    val df = graft.streaming.UpsertJoin.changelogChangesBetween(
      spark, s"$tmp/cl", "k", 17L, 30L)
    // plan-shape assertions on the PRE-execution string: once AQE
    // finalizes, AdaptiveSparkPlanExec.toString prints Final AND
    // Initial plans, double-counting every substring
    val p = df.queryExecution.executedPlan.toString
    assert(df.collect().nonEmpty)
    // ONE key exchange: the min_by/max_by hash aggregate (map-side
    // partials merge on it); no window sort, no join in the plan
    assert("Exchange hashpartitioning".r.findAllIn(p).size === 1, p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"),
      s"diff must be a single aggregation, not a join/window:\n${p.take(2000)}")
    assert(p.contains("PartitionFilters") && p.contains("cl_shard"),
      s"shard predicates missing:\n${p.take(2000)}")
    val filesRead = graft.plans.PlanFiles
      .filesRead(df.queryExecution.executedPlan)
    def files(dir: String) = {
      val fs = new java.io.File(dir).listFiles()
      if (fs == null) 0 else fs.count(_.getName.endsWith(".parquet"))
    }
    assert(files(s"$tmp/cl/cl_shard=0") > 0 && files(s"$tmp/cl/cl_shard=2") > 0,
      "test setup: both prunable shards must exist")
    assert(filesRead === files(s"$tmp/cl/cl_shard=1"),
      s"window (17,30] must read ONLY shard 1: read $filesRead vs " +
        s"shard1=${files(s"$tmp/cl/cl_shard=1")}")
  }

  test("native dot product is codegen-capable (starred projection)") {
    // the tokenizing queries are bounded by ArrayTransform (a
    // CodegenFallback higher-order function), but ArrayDotProduct
    // itself must not break a codegen span
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFunctions
    val df = spark.range(4).select(
      VectorFunctions.dot(
        typedlit(Seq(1.0, 2.0)), typedlit(Seq(3.0, 4.0))).as("d"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), s"dot projection fell out of codegen:\n$p")
    assert(df.head().getDouble(0) === 11.0)
  }
}
