package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.operators._
import graft.functions.{FreqItemsAggregator, TextFunctions => TF, VectorFunctions => VF}

/** Driver contract: one `queries` entry per implemented operator from
  * SURVEY.md §2 (+ §2.10 north-star ops), with a DuckDB-equivalent
  * oracle SQL where the semantics are SQL-expressible.
  *
  * Every query is built from the graft operator/function library — this
  * file is the catalog, not the implementation.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** Guide §2.5 unsplittable-input mitigation. The driver test tables
    * are single-row-group parquet files, and a row group is the
    * parquet split atom — so every scan is ONE task and everything
    * between the scan and the first exchange (tokenize/explode,
    * multi-distinct expand, percentile partials, join probes against
    * broadcast dims) runs on one core no matter how many the session
    * has. When the scan yields fewer partitions than the session's
    * parallelism, repartition right after the read — hash on a
    * high-cardinality column when given (deterministic, no
    * sort-before-repartition), round-robin otherwise (for queries
    * whose plan pins count key exchanges). A NO-OP whenever the input
    * already carries enough splits, which is exactly the production /
    * 100 TB case — the extra exchange exists only when it buys the map
    * side its parallelism back (r12; measured 1.5-2x on the profile /
    * containment / shingle families at sf0.1 on local[32]).
    */
  private def spread(df: DataFrame, by: String*): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= n) df
    else if (by.nonEmpty) df.repartition(n, by.map(col): _*)
    else df.repartition(n)
  }

  /** Shared driver for the q_changelog_* rows: a FRESH 4-batch upsert
    * history over the 1/5 orders sample — batch b carries the
    * key-unique max-orderkey row per custkey among `o_orderkey%20==b`
    * — written through a changelog-enabled sink. Fresh per call (a
    * bench pass re-running a row must not append batches 4..7 on top;
    * epoch recovery would keep counting), one tmp namespace per row so
    * concurrent rows never collide. Returns the sink and its log dir.
    * All three consumers (snapshotAt pure-replay, snapshotAt
    * checkpoint-anchored, changesBetween) share ONE history shape so
    * their oracle SQL texts stay derivable from the same fold.
    */
  private def changelogHistory(s: SparkSession, dir: String, tag: String,
                               checkpointEvery: Int = 0)
      : (graft.streaming.UpsertJoin.ParquetUpsertSink, String) = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-$tag-" +
      s.sparkContext.applicationId
    def rm(f: java.io.File): Unit = {
      val fs = f.listFiles(); if (fs != null) fs.foreach(rm)
      f.delete(): Unit
    }
    rm(new java.io.File(base))
    val sink = new graft.streaming.UpsertJoin.ParquetUpsertSink(
      s, s"$base/state", 4, changelogDir = Some(s"$base/log"),
      changelogCheckpointEvery = checkpointEvery)
    val orders = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .filter(col("o_orderkey") % 20 < 4)
    // AQE off for the history build (restored after): each per-batch
    // merge is 2-3 tiny exchanges that AQE re-plans as separate query
    // stages with runtime stats — pure per-action driver latency on a
    // 4-bucket state, the same call DedupOps.distributedClusters makes
    // for its convergence loop (results unaffected; physical-planning
    // concern only)
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = s.conf.getOption(aqeKey)
    s.conf.set(aqeKey, "false")
    try (0 to 3).foreach { b =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderkey").desc)
      val batch = orders.filter(col("o_orderkey") % 20 === b)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      // prepared-unique path (r13): each batch is key-unique by
      // construction and spans the whole custkey space, so every
      // bucket is touched — passing the full bucket set skips the
      // per-batch touched-discovery collect job (a superset is always
      // safe: an untouched bucket just rewrites its own rows), and the
      // batch schema skips the state read's footer-inference job. The
      // batch is cached because the merge stage and the changelog
      // emitter are separate actions over it (the discovery path
      // cached it for the same reason).
      val cached = batch.cache()
      try sink.upsertPreparedUnique("o_custkey", cached,
        0 until sink.bucketCount.getOrElse(4))
      finally cached.unpersist()
    } finally prevAqe match {
      case Some(v) => s.conf.set(aqeKey, v)
      case None => s.conf.unset(aqeKey)
    }
    (sink, s"$base/log")
  }

  /** Flagship: the reference's 11-way role-aliased left-join shape
    * (CRMLSJoiner.scala:471-487) over the star schema. Driver
    * smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    multiJoin(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- joins

  /** J1/J7: multi-way LEFT OUTER equi-join with re-aliased role dims
    * (nation & region each joined twice: customer-role and
    * supplier-role), dims broadcast.
    */
  private def multiJoin(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = t(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    val nat = t(s, dir, "nation")
    val reg = t(s, dir, "region")
    val supp = t(s, dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    val prt = t(s, dir, "part").select("p_partkey", "p_name")
    val cn = nat.select(col("n_nationkey").as("cn_nationkey"),
      col("n_name").as("cust_nation"), col("n_regionkey").as("cn_regionkey"))
    val cr = reg.select(col("r_regionkey").as("cr_regionkey"),
      col("r_name").as("cust_region"))
    val sn = nat.select(col("n_nationkey").as("sn_nationkey"),
      col("n_name").as("supp_nation"), col("n_regionkey").as("sn_regionkey"))
    val sr = reg.select(col("r_regionkey").as("sr_regionkey"),
      col("r_name").as("supp_region"))
    import MultiJoin.Dim
    MultiJoin.leftJoinAll(li, Seq(
      Dim(ord, _ => col("l_orderkey") === col("o_orderkey"), broadcastDim = false),
      Dim(cust, _ => col("o_custkey") === col("c_custkey")),
      Dim(cn, _ => col("c_nationkey") === col("cn_nationkey")),
      Dim(cr, _ => col("cn_regionkey") === col("cr_regionkey")),
      Dim(prt, _ => col("l_partkey") === col("p_partkey")),
      Dim(supp, _ => col("l_suppkey") === col("s_suppkey")),
      Dim(sn, _ => col("s_nationkey") === col("sn_nationkey")),
      Dim(sr, _ => col("sn_regionkey") === col("sr_regionkey"))))
      .select("l_orderkey", "l_linenumber", "c_name", "p_name", "s_name",
        "cust_nation", "cust_region", "supp_nation", "supp_region")
  }

  // -------------------------------------------------------------- catalog

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1/A4-family: grouped aggregation (TPC-H Q1 shape)
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum("l_extendedprice").as("sum_base_price"),
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          avg("l_quantity").as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // A2 tuple-IN argmax dedup (keeps ties) — the signature operator
    "q_dedup_latest" -> ((s, dir) =>
      LatestVersion.latestAll(t(s, dir, "events"), "user_id", "ts")),

    // A2/W2 row_number()=1 dedup variant with deterministic tiebreak
    "q_dedup_one" -> ((s, dir) =>
      LatestVersion.latestOne(t(s, dir, "events"), "user_id", "ts", "event_id")),

    // J1 (reduced): 4-way star left join orders->customer->nation->region
    "q_starjoin" -> ((s, dir) => {
      import MultiJoin.Dim
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = t(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey")
      val nat = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val reg = t(s, dir, "region").select("r_regionkey", "r_name")
      MultiJoin.leftJoinAll(ord, Seq(
        Dim(cust, _ => col("o_custkey") === col("c_custkey")),
        Dim(nat, _ => col("c_nationkey") === col("n_nationkey")),
        Dim(reg, _ => col("n_regionkey") === col("r_regionkey"))))
        .select("o_orderkey", "o_totalprice", "c_name", "n_name", "r_name")
    }),

    // J1/J7 full shape: 8 chained left joins, role-aliased dims
    "q_multijoin" -> ((s, dir) => multiJoin(s, dir)),

    // J3: inner equi-join
    "q_innerjoin" -> ((s, dir) => {
      val ord = t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val cust = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
    }),

    // J5/J6: as-of (temporal) join — each purchase joined to the latest
    // prior click of the same user (union + last-value scale plan)
    "q_asof" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val probe = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val build = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value", "event_id")
      AsOfJoin.asOf(probe, build, key = "user_id", probeTs = "ts",
        buildTs = "ts", buildCols = Seq("ts", "value"),
        tiebreak = "event_id", prefix = "clk_")
    }),

    // J5 via the custom physical operator (plans/AsOfJoinPlan:
    // LogicalPlan + SparkStrategy + sort-merge exec) — same semantics
    // and oracle as q_asof
    "q_asof_native" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val probe = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val build = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value", "event_id")
      plans.AsOfJoinPlan.asOf(probe, build, key = "user_id",
        probeTs = "ts", buildTs = "ts", tiebreak = "event_id",
        buildCols = Seq("ts", "value"), prefix = "clk_")
    }),

    // range/interval join: per purchase, the same user's clicks within
    // the preceding hour — equi-join on (user, time-bucket), never a
    // nested loop (operators/RangeJoin)
    "q_interval_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val probe = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val build = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value")
      RangeJoin.windowAggregate(probe, build, key = "user_id",
          probeId = "event_id", probeTs = "ts", buildTs = "ts",
          lookbackMs = 3600000L, lookaheadMs = 0L,
          aggs = Seq(count(lit(1)).as("__n"), sum("b_value").as("sum_click_value")))
        .select(col("event_id"), col("user_id"), col("ts"),
          coalesce(col("__n"), lit(0L)).as("n_clicks"),
          col("sum_click_value"))
    }),

    // P2/P3/P4: JSON field extraction + null-safe default + cast.
    // ONE from_json parse feeds both fields — per-field
    // get_json_object would re-parse the document per extraction,
    // doubling scan-side CPU at corpus scale (the per-field form
    // remains exercised by the CRMLS EntitySpec join-key extraction).
    // k is parsed as STRING then SQL-cast: extract-then-cast is the
    // oracle's semantics (a quoted "5" still yields 5), where a
    // LongType schema field would null out string-typed numbers
    "q_json_extract" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("k", StringType), StructField("missing", StringType)))
      t(s, dir, "events")
        .select(col("event_id"), from_json(col("props"), schema).as("__p"))
        .select(
          col("event_id"),
          col("__p.k").cast("long").as("k_val"),
          coalesce(col("__p.missing"), lit("")).as("missing_val"))
    }),

    // P2 at scale, Spark 4 path: the same extraction through
    // VariantType (parse_json once -> shredded binary variant;
    // field access is a cheap typed probe instead of a text re-parse).
    // Semantics pinned to q_json_extract: extract as string, then
    // SQL-cast — so the two paths must stay value-identical and share
    // one oracle shape.
    "q_json_extract_variant" -> ((s, dir) =>
      t(s, dir, "events")
        .select(col("event_id"), parse_json(col("props")).as("__v"))
        .select(
          col("event_id"),
          try_variant_get(col("__v"), "$.k", "string").cast("long").as("k_val"),
          coalesce(try_variant_get(col("__v"), "$.missing", "string"),
            lit("")).as("missing_val"))),

    // VariantType STORAGE leg: the shredded binary variant column is
    // written to parquet and read back before field extraction — the
    // round-trip must be value-identical to the in-memory path (same
    // oracle as q_json_extract_variant; VariantStorageSpec pins
    // in-memory == round-trip row-for-row). This is the lakehouse
    // shape: parse once at ingest, store the variant, probe fields at
    // query time without ever re-parsing text.
    "q_variant_roundtrip" -> ((s, dir) => {
      val out = s"${System.getProperty("java.io.tmpdir")}/graft-variant-rt-" +
        Integer.toHexString(dir.hashCode)
      t(s, dir, "events")
        .select(col("event_id"), parse_json(col("props")).as("props_v"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out).select(
        col("event_id"),
        try_variant_get(col("props_v"), "$.k", "string").cast("long").as("k_val"),
        coalesce(try_variant_get(col("props_v"), "$.missing", "string"),
          lit("")).as("missing_val"))
    }),

    // W1: running aggregate over unbounded-preceding frame
    "q_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("ts"),
        sum("value").over(w).as("running_sum"))
    }),

    // W2-family: rank + lag window functions
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").desc, col("event_id"))
      t(s, dir, "events").select(
        col("event_id"), col("user_id"), col("value"),
        rank().over(w).cast("long").as("value_rank"),
        lag(col("value"), 1).over(w).as("prev_value"))
    }),

    // T10-family: sliding window (1 hour, 30 min slide — each event in 2 windows)
    "q_sliding" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))),

    // T10-family: session window (10 min inactivity gap) per user
    "q_session" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("session_window.start").as("sess_start"), col("user_id"),
          col("n"), col("sum_value"))),

    // grouping-set aggregation: ROLLUP with subtotal + grand-total rows
    "q_rollup" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))),

    // grouping-set aggregation: CUBE (all 4 grouping combinations)
    "q_cube" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"),
          avg("l_discount").as("avg_disc"), count(lit(1)).as("n"))),

    // §2.8 OLAP: explicit GROUPING SETS — the general form cube/rollup
    // specialize; one Expand + one aggregation, no per-set re-scan
    "q_grouping_sets" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_returnflag")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))),

    // §2.8 windows: explicit lead/lag — per-user consecutive deltas
    // (the event-sequence feature extraction shape)
    "q_window_lag" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        round(col("value") - lag("value", 1).over(w), 6).as("delta_value"))
    }),

    // §2.10 corpus reporting: the single-row "dataset card" — corpus
    // size, token volume, language/source coverage, exact-dup mass,
    // and the quality-gate pass rate, in ONE scan + one aggregation
    "q_dataset_card" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(
          TF.tokenCount(col("text")).as("__nt"),
          col("lang"), col("source"), col("n_chars"),
          md5(col("text")).as("__h"),
          (TF.qualityScore(col("text"), Seq("the", "a")) >= 0.5)
            .cast("long").as("__q"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum("__nt").cast("long").as("n_tokens"),
          countDistinct(col("lang")).as("n_langs"),
          countDistinct(col("source")).as("n_sources"),
          (count(lit(1)) - countDistinct(col("__h"))).as("n_dup_docs"),
          round(avg("n_chars"), 4).as("avg_chars"),
          round(avg("__q"), 6).as("quality_keep_rate"))),

    // §2.10 text analysis: per-language heavy hitters via the mergeable
    // Misra–Gries sketch — each partition ships <= capacity counters
    // per group to the exchange, never the vocabulary (capacity far
    // above the test vocab => exact regime, the oracle-checkable bound)
    "q_heavy_hitters" -> ((s, dir) =>
      FreqItemsAggregator.frequentTerms(
        t(s, dir, "documents")
          .select(col("lang"), explode(TF.tokens(col("text"))).as("term")),
        "lang", "term", capacity = 4096, k = 10)),

    // pivot: one column per l_linestatus value (wide-format reshaping)
    "q_pivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum("l_quantity"))),

    // skew-defused join: salted inner join must equal the plain join
    // (operators/SkewJoin — the explicit fallback when AQE's runtime
    // skew split cannot apply)
    "q_skewjoin" -> ((s, dir) => {
      val fact = t(s, dir, "events")
        .select("event_id", "user_id", "event_type")
      val dim = t(s, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_name"))
      SkewJoin.saltedJoin(fact, dim, "user_id", saltBuckets = 4,
          joinType = "inner", saltExpr = Some(col("event_id")))
        .select("event_id", "user_id", "event_type", "c_name")
    }),

    // exact interpolated percentiles per group — sort-based within
    // each group, which is the right call at dashboard scale and for
    // oracle parity; at 100 TB swap `percentile` for
    // `approx_percentile(col, p, accuracy)` (t-digest sketch,
    // map-side combinable, no per-group sort)
    "q_percentile" -> ((s, dir) =>
      spread(t(s, dir, "lineitem"), "l_orderkey")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"))),

    // robust aggregation: per-group winsorized means — exact [p05, p95]
    // thresholds (one row per group, broadcast back), map-only clamp
    "q_winsorize" -> ((s, dir) =>
      // spread: the exact-percentile partial buffers otherwise build
      // on the single scan split (one core holds every value)
      Outliers.winsorizedMeans(spread(t(s, dir, "lineitem"), "l_orderkey"),
        "l_returnflag", "l_extendedprice", pLo = 0.05, pHi = 0.95)),

    // statistical aggregates: stddev / variance / correlation
    "q_stats_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"))),

    // distinct aggregates
    "q_distinct_agg" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"),
          countDistinct("l_suppkey").as("n_supps"))),

    // sketch aggregates — the documented 100x replacements for the
    // exact forms above (approx_percentile = quantile sketch,
    // approx_count_distinct = HLL++): map-side combinable, no per-group
    // sort or distinct shuffle. Sketch outputs are engine-specific, so
    // the oracle contract is banded: the catalog emits the EXACT values
    // (hash-matched against DuckDB) plus an integer flag asserting the
    // sketch landed within 5% of exact — a Spark upgrade that degrades
    // sketch accuracy past the band flips the flag and fails the gate.
    "q_approx_percentile" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
          round(expr("percentile(l_extendedprice, 0.9)"), 4).as("p90_price"),
          expr("approx_percentile(l_quantity, 0.5, 10000)").as("__a50"),
          expr("approx_percentile(l_extendedprice, 0.9, 10000)").as("__a90"))
        .select(col("l_returnflag"), col("p50_qty"), col("p90_price"),
          (abs(col("__a50") - col("p50_qty")) <=
            abs(col("p50_qty")) * 0.05).cast("int").as("p50_sketch_ok"),
          (abs(col("__a90") - col("p90_price")) <=
            abs(col("p90_price")) * 0.05).cast("int").as("p90_sketch_ok"))),

    // exact and sketch sides aggregate SEPARATELY (3-row broadcast join
    // to compare): count(distinct) plans a two-shuffle expand keyed on
    // (group, value), and fusing the HLL into that same aggregate would
    // drag the sketch buffer through the per-value phase — the sketch
    // side must keep its canonical one-shuffle mergeable-partials shape
    // (PlanHygieneSpec pins it)
    "q_approx_distinct" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct("l_partkey").as("n_parts"))
      val sketch = li.groupBy("l_returnflag")
        .agg(approx_count_distinct("l_partkey", 0.01).as("__ap"))
      exact.join(sketch, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_parts"),
          (abs(col("__ap") - col("n_parts")) <=
            col("n_parts") * 0.05).cast("int").as("sketch_ok"))
    }),

    // §2.10 near-dup: embedding-cosine pairs above threshold, SRP-LSH
    // bucketed (band/bucket shuffle key, exact cosine verified
    // in-bucket — never an all-pairs nested loop; the oracle recomputes
    // the same bucketing from the hyperplane literals)
    "q_cosine_dupes" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 300)
      SimilaritySearch.cosineDupePairsLsh(emb, "vec_id", "embedding", 0.35,
        bands = 16, bitsPerBand = 8, maxDim = 64)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    }),

    // T3/T4: tumbling event-time window aggregation (1 hour)
    "q_tumbling" -> ((s, dir) =>
      t(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
        .select(col("window.start").as("w_start"), col("event_type"),
          col("n"), col("sum_value"))),

    // STREAMING legs of the gate (StreamReplay): the streaming
    // operators run as real MemoryStream micro-batch replays to their
    // final tables, hashed against batch-equivalent DuckDB oracles —
    // promoting the batch-stream identity from sbt-only
    // (BatchStreamEquivalenceSpec & co) into the driver's correctness
    // artifact.
    // A2/T7 streamed: exact dedup state across four micro-batches
    "q_stream_dedup" -> ((s, dir) => StreamReplay.dedupExact(s, dir)),
    // A1/A2 streamed: the reference's continuous argmax
    // latest-version-per-key, changelog reduced to its final snapshot
    "q_stream_latest" -> ((s, dir) => StreamReplay.latestVersion(s, dir)),
    // J5/U1 streamed: event-time as-of join with watermark-buffered
    // probes, same oracle shape as the batch q_asof
    "q_stream_asof" -> ((s, dir) => StreamReplay.asOfJoin(s, dir)),
    // T3/T4 streamed: watermark-finalized tumbling windows in append
    // mode; same oracle as the batch q_tumbling
    "q_stream_tumbling" -> ((s, dir) => StreamReplay.tumbling(s, dir)),
    // T10 streamed: session windows merging across micro-batches;
    // same gaps-and-islands oracle as the batch q_session
    "q_stream_session" -> ((s, dir) => StreamReplay.sessionWindows(s, dir)),
    // the NATIVE stream-stream join leg (symmetric hash, bounded
    // state): purchases x same-user clicks within the preceding hour
    "q_stream_interval" -> ((s, dir) => StreamReplay.intervalJoin(s, dir)),
    // T2/T9 streamed: out-of-order arrival (event_id % 4 batches) with
    // bounded lateness — the oracle recomputes which rows Spark DROPS
    "q_stream_latedrop" -> ((s, dir) => StreamReplay.lateDrop(s, dir)),
    // the reference's PRODUCTION job end to end (S6/P*/A2/J1/T7):
    // envelopes synthesized from orders/customer, three micro-batches
    // covering initial build, reverse-index dimension propagation, and
    // pk-superseding listing updates; oracle is plain SQL over the
    // source tables because the envelope content is a pure function of
    // them
    "q_stream_crmls" -> ((s, dir) => StreamReplay.crmlsJoin(s, dir)),

    // the SAME replay forced onto the distributed middle/legacy tiers
    // (snapshot caps 1, driver budgets 0) — the 100x-state fallback
    // path under the driver's oracle; shares q_stream_crmls's SQL
    // verbatim because the converged table must be identical
    "q_stream_crmls_overcap" -> ((s, dir) =>
      StreamReplay.crmlsJoin(s, dir, forceDistributedTiers = true)),

    // retract-churn worst case: one hot key updating in EVERY batch
    // (rotating its agent ref, so the reverse index accrues stale
    // entries) and dims arriving only AFTER the facts they enrich
    "q_stream_crmls_churn" -> ((s, dir) => StreamReplay.crmlsChurn(s, dir)),

    // §2.8 sorts/limits: top-k with deterministic tiebreak
    "q_topk" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // §2.8 set ops: INTERSECT
    "q_intersect" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey")).distinct()
        .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")).distinct())),

    // §2.8 set ops: EXCEPT — custkeys with no event activity
    "q_except" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_custkey").as("k")).distinct()
        .except(t(s, dir, "events").select(col("user_id").as("k")).distinct())),

    // §2.8 set ops: UNION ALL + regroup
    "q_union" -> ((s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .unionAll(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))),

    // P11-family: left-semi join (EXISTS)
    "q_semijoin" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      val ord = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      cust.join(ord, Seq("c_custkey"), "left_semi")
    }),

    // anti join (NOT EXISTS) — customers with no events (events cover
    // only 10% of custkeys at every scale, so the result is never empty)
    "q_antijoin" -> ((s, dir) => {
      val cust = t(s, dir, "customer").select("c_custkey", "c_name")
      val ev = t(s, dir, "events").select(col("user_id").as("c_custkey"))
      cust.join(ev, Seq("c_custkey"), "left_anti")
    }),

    // P4/P8/P9: scalar surface — upper, base64, floor-cast, concat
    "q_scalar" -> ((s, dir) =>
      t(s, dir, "events").select(
        col("event_id"),
        upper(col("event_type")).as("etype_u"),
        base64(col("event_type").cast("binary")).as("etype_b64"),
        floor(col("value")).cast("long").as("value_floor"),
        concat(col("user_id").cast("string"), lit("#"), col("event_type")).as("ue_key"))),

    // A3: global COUNT(*) over a join result
    "q_count_join" -> ((s, dir) => {
      val ord = t(s, dir, "orders").select("o_custkey")
      val cust = t(s, dir, "customer").select("c_custkey")
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_outer")
        .agg(count(lit(1)).as("n"))
    }),

    // K2/A5: per-key ordered string-concat reduce
    "q_groupconcat" -> ((s, dir) =>
      t(s, dir, "events").groupBy("user_id").agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")),
          ",").as("type_seq"))),

    // A4/WordCount surface: corpus word counts (reference
    // WordCount.scala batch analog)
    "q_wordcount" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TF.tokens(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))),

    // §2.10 text: fixed-size token chunking (training-sample prep) —
    // one row per 50-token chunk
    "q_chunks" -> ((s, dir) => {
      val chunkSize = 50
      val toks = TF.tokens(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(
          transform(
            sequence(lit(0),
              ceil(size(toks).cast("double") / chunkSize).cast("int") - 1),
            i => array_join(slice(toks, i * chunkSize + 1, lit(chunkSize)), " "))))
        .toDF("doc_id", "chunk_idx", "chunk")
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk"))
    }),

    // §2.10 text: tokenizer-vocabulary coverage — per-doc OOV rate
    // against the corpus's own top-30 doc-frequency vocabulary. The
    // vocab is a bounded driver collect (30 rows) baked in as an array
    // literal, so the scoring pass is map-only, zero shuffle.
    "q_oov_rate" -> ((s, dir) =>
      Vocab.oovAgainstTopTerms(s, t(s, dir, "documents"),
        "doc_id", "text", vocabSize = 30)),

    // §2.10 text: BPE-ish subword token counting (the tokenizer pattern
    // is RE2-compatible, so the oracle recomputes it verbatim)
    "q_bpe_tokens" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TF.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        size(TF.bpeishTokens(col("text"))).cast("long").as("n_bpe_tokens"))),

    // §2.10 text: trigram frequency over the corpus (n-gram LM stats;
    // repeated trigrams only, to keep the result the interesting tail)
    "q_ngrams" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TF.ngrams(col("text"), 3)).as("ngram"))
        .groupBy("ngram").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)),

    // §2.10 corpus prep: structural PII scrubbing (emails, digit runs)
    // — map-only regexp_replace chain, RE2-compatible patterns
    "q_redact" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), TF.redactPii(col("text")).as("redacted"))),

    // §2.10 training-data assembly: content-addressed train/val/test
    // split — a pure function of (seed, doc_id), so re-runs and corpus
    // growth never move a document across splits
    "q_split" -> ((s, dir) =>
      TrainingOps.assignSplit(t(s, dir, "documents"), "doc_id",
          trainFrac = 0.8, valFrac = 0.1)
        .select("doc_id", "split")),

    // §2.10 assembly: leakage-safe split — near-dup clusters (from the
    // same pair graph as q_dup_clusters) are split as ONE unit, keyed
    // on the cluster's canonical label, so train/eval never straddles
    // a near-duplicate
    "q_split_leakfree" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val probe = d.filter(col("doc_id") < 40)
      val confirmed = DedupOps.tokenJaccardPairs(probe, "doc_id", "text",
          maxDocFreq = None)
        .filter(col("jaccard") > 0.5)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      val labels = DedupOps.duplicateClusters(confirmed)
      TrainingOps.assignSplitByCluster(d, "doc_id", labels)
        .select("doc_id", "split")
    }),

    // §2.10 training-data assembly: deterministic hash sampling (stable
    // across reruns/retries/engines, unlike rand()-based sample)
    "q_sample" -> ((s, dir) =>
      TrainingOps.hashSample(t(s, dir, "documents"), "doc_id", 0.25)
        .select("doc_id", "lang", "n_chars")),

    // §2.10 training-data assembly: weighted k-sample without
    // replacement (Efraimidis–Spirakis) — sample 50 docs with
    // probability proportional to n_chars via the deterministic
    // ln(u)/w key; map-only + per-partition top-k heaps, no shuffle
    "q_weighted_sample" -> ((s, dir) =>
      TrainingOps.weightedSample(t(s, dir, "documents"), "doc_id",
          "n_chars", k = 50)
        .select(col("doc_id"), col("n_chars"), col("es_key"))),

    // §2.10 training-data assembly: stratified deterministic sampling —
    // per-language keep fractions (rebalancing a corpus mix), same
    // content-addressed hash as q_sample, map-only
    "q_stratified" -> ((s, dir) =>
      TrainingOps.stratifiedHashSample(t(s, dir, "documents"), "doc_id",
          "lang", Map("en" -> 0.5, "es" -> 0.25), defaultFraction = 0.75)
        .select("doc_id", "lang")),

    // §2.10 text analysis: intra-document n-gram repetition ratio
    // (Gopher-style repetition quality signal; map-only)
    "q_repetition" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TF.tokens(col("text")).as("__toks"))
        .select(
          col("doc_id"),
          round(TF.ngramRepetitionRatioOf(col("__toks"), 2), 6).as("rep2"),
          round(TF.ngramRepetitionRatioOf(col("__toks"), 3), 6).as("rep3"))),

    // §2.10 text analysis: unigram-LM quality score (mean token
    // log-prob against the corpus unigram model — the KenLM-perplexity
    // stand-in quality filters use)
    "q_lm_quality" -> ((s, dir) =>
      UnigramLm.score(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"),
          round(col("logprob"), 6).as("logprob"))),

    // §2.10 text analysis: bigram-LM quality score — the conditional
    // p(w2|w1) model a unigram LM cannot express (loop-y text scores
    // corpus-typical under unigrams but collapses under conditionals)
    "q_bigram_lm" -> ((s, dir) =>
      BigramLm.score(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("n_bigrams"),
          round(col("logprob"), 6).as("logprob"))),

    // §2.10 text analysis: Gopher-style hard-threshold structural
    // quality rules, each rule's measurement plus the conjunctive keep
    // flag (pipelines audit WHICH rule rejected a doc)
    "q_gopher_rules" -> ((s, dir) =>
      QualityRules.gopherRules(t(s, dir, "documents"), "doc_id", "text",
        stop = Seq("the", "a"))),

    // §2.10 training-data assembly: deterministic global shuffle key
    // (range-partitioned distributed sort, per-epoch permutations)
    "q_shuffle" -> ((s, dir) =>
      TrainingOps.deterministicShuffle(t(s, dir, "documents"), "doc_id",
          seed = "epoch0")
        .select("doc_id", "shuffle_key")),

    // §2.10 text analysis: TF-IDF term weights (bounded probe set; the
    // cap is None so the oracle's exact df matches — the operator
    // default keeps the stopword/skew cap)
    "q_tfidf" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      TfIdf.tfIdf(d, "doc_id", "text", maxDocFreqRatio = None)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          round(col("tfidf"), 6).as("tfidf"))
    }),

    // §2.10 training-data assembly: source mixture weights as
    // deterministic repetition (weight 2.5 = 2 full epochs + a
    // deterministic half-sample third; 0.25 = quarter-sample) — the
    // duty-cycle mixing step combining corpus sources for pretraining
    "q_source_mix" -> ((s, dir) =>
      TrainingOps.sourceWeightedMix(t(s, dir, "documents"), "doc_id",
        "source", Map("src0" -> 2.5, "src1" -> 0.25))
        .select("doc_id", "source", "epoch")),

    // §2.10 training-data assembly: train/eval contamination report —
    // distinct trigrams each non-train doc shares with any train doc
    // (inverted-index join on ngram, never doc x doc; cap None so the
    // oracle's exact df matches — the operator default caps hot ngrams)
    "q_contamination" -> ((s, dir) =>
      TrainingOps.crossSplitContamination(t(s, dir, "documents"),
        "doc_id", "text", n = 3, trainFrac = 0.8, valFrac = 0.1,
        maxNgramDf = None)),

    // the Bloom-prefiltered 100x form — same parameters, same oracle
    // (pre-filter is semantics-preserving; see the operator's scaladoc)
    "q_contamination_bloom" -> ((s, dir) =>
      TrainingOps.crossSplitContaminationBloom(t(s, dir, "documents"),
        "doc_id", "text", n = 3, trainFrac = 0.8, valFrac = 0.1,
        maxNgramDf = None)),

    // the streaming arrival-time probe, batch-replayed (the operator is
    // map-only, so the batch and stream forms are the same plan): every
    // TRAIN doc's distinct 3-grams counted against the fixed non-train
    // gram index — the flip side of q_contamination's audit direction,
    // flagged at the ingest door with zero joins/shuffles per batch
    "q_contamination_stream" -> ((s, dir) => {
      val split = TrainingOps.assignSplit(
        t(s, dir, "documents"), "doc_id", 0.8, 0.1, "split")
      val idx = graft.streaming.StreamingContamination.buildEvalIndex(
        split.filter(col("split") =!= "train"), "text", n = 3)
      graft.streaming.StreamingContamination.flagContaminated(
        split.filter(col("split") === "train"), "doc_id", "text", idx)
        .select(col("doc_id"), col("n_contaminated"))
    }),

    // §2.10 training-data assembly: corpus snapshot diff (full-outer
    // join on id, md5 content compare) — two synthetic "versions" cut
    // from the documents table: v1 = ids<450, v2 = ids>=50 with every
    // 10th doc's text amended
    "q_corpus_diff" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val v1 = d.filter(col("doc_id") < 450)
      val v2 = d.filter(col("doc_id") >= 50).withColumn("text",
        when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      TrainingOps.corpusDiff(v1, v2, "doc_id", "text")
    }),

    // §2.10 training-data assembly: concat-and-chunk sequence packing —
    // deterministic pseudo-random document order, token stream cut into
    // capacity-sized bins, sharded cumsum (no global single-reducer sort)
    "q_pack" -> ((s, dir) =>
      TrainingOps.packSequences(t(s, dir, "documents"), "doc_id",
          TF.tokenCount(col("text")), capacity = 512L)
        .select("doc_id", "pack_shard", "pack_bin", "bin_offset")),

    // §2.10 training-data assembly: first-fit-decreasing (whole-doc,
    // no splitting) sequence packing. The greedy bin layout is a
    // sequential per-shard pass no SQL replays, so the row is a BANDED
    // CONTRACT: per shard the oracle derives n_docs / n_tokens
    // (= Σ min(tok, cap)) straight from the input and asserts the two
    // invariants FFD guarantees — zero over-budget bins, and a bin
    // count in [ceil(sum/cap), max(ceil(2*sum/cap), 1)] (any first-fit
    // leaves at most one bin ≤ half-full, so n_bins < 2*sum/cap + 1).
    // A layout bug on the Spark side flips a flag and fails the hash.
    "q_pack_ffd" -> ((s, dir) => {
      val cap = 512L
      val packed = TrainingOps.packSequencesFfd(t(s, dir, "documents"),
        "doc_id", TF.tokenCount(col("text")), capacity = cap)
      packed
        .groupBy(col("pack_shard"), col("pack_bin"))
        .agg(sum("pack_tokens").as("__load"),
          count(lit(1)).as("__docs"))
        .groupBy(col("pack_shard"))
        .agg(sum("__docs").as("n_docs"),
          sum("__load").as("n_tokens"),
          count(lit(1)).as("__bins"),
          sum(when(col("__load") > cap, 1L).otherwise(0L))
            .as("n_over_budget"))
        .select(col("pack_shard"), col("n_docs"), col("n_tokens"),
          (col("__bins") >= ceil(col("n_tokens").cast("double") / cap) &&
            col("__bins") <= greatest(
              ceil(col("n_tokens").cast("double") * 2 / cap), lit(1L)))
            .cast("int").as("bins_ok"),
          col("n_over_budget"))
    }),

    // §2.10 training-data assembly: length-bucketed batching audit —
    // width-32 token-count buckets, per-bucket doc/token volume and the
    // padding waste a max-length-padded batch of that bucket would
    // carry. Map-only bucket assignment + one aggregation on a small
    // key space; the knob a sequence-packing run tunes before paying
    // for the real pack.
    "q_length_buckets" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(TF.tokenCount(col("text")).cast("long").as("__nt"))
        .groupBy((col("__nt") / 32).cast("long").as("bucket"))
        .agg(
          count(lit(1)).as("n_docs"),
          max("__nt").as("max_tokens"),
          sum("__nt").as("sum_tokens"),
          round(lit(1.0) - sum("__nt") /
            (max("__nt") * count(lit(1))).cast("double"), 6).as("pad_waste"))),

    // §2.10 text analysis: top TF-IDF terms per document via the typed
    // top-k aggregator (map-side k-truncation — the exchange carries
    // O(partitions x k) rows, not the (doc, term) matrix). Ranking on
    // the ROUNDED score so cross-engine ln() ulp noise cannot flip
    // near-ties; rank ties break by term (UTF-8 order, ASCII corpus).
    "q_topterms" -> ((s, dir) =>
      TfIdf.topTerms(t(s, dir, "documents").filter(col("doc_id") < 40),
        "doc_id", "text", k = 3, maxDocFreqRatio = None)),

    // §2.10 dedup (exact): content-hash dedup
    "q_dedup_exact" -> ((s, dir) =>
      DedupOps.exactDedup(t(s, dir, "documents"), "doc_id", "text")),

    // §2.10 text analysis: token/type counts, mean token length, stopword
    // ratio — all four stats come off ONE native TokenStats struct, so
    // the whole query is a single tokenize + single per-token loop per row
    // §2.10 corpus mix: per-source unigram KL divergence from the
    // corpus distribution — the data-mixing skew diagnostic. One
    // (source, term) shuffle; everything downstream is keyed on the
    // vocabulary-bounded aggregate, never the corpus.
    "q_source_kl" -> ((s, dir) =>
      CorpusDivergence.sourceKl(t(s, dir, "documents"), "source", "text")),

    // §2.10 text: sliding-window chunking WITH overlap (stride 30 over
    // 50-token windows — the RAG/embedding-context shape; q_chunks is
    // the disjoint variant). Map-only: window count and slices are
    // row-local arithmetic over the token array, zero shuffle.
    "q_chunk_overlap" -> ((s, dir) => {
      val chunk = 50
      val stride = 30
      val toks = TF.tokens(col("text"))
      val extra = greatest(size(toks) - lit(chunk), lit(0))
      val nw = (lit(1) + ((extra + lit(stride - 1)) / lit(stride))
        .cast("long")).as("__nw")
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(
          transform(sequence(lit(0L), nw - 1),
            d => array_join(
              slice(toks, (d * stride + 1).cast("int"), lit(chunk)), " "))))
        .toDF("doc_id", "chunk_idx", "chunk")
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          col("chunk"))
    }),

    // §2.10 corpus statistics: Zipf slope — OLS fit of ln(freq) vs
    // ln(rank) over the top-100 terms (a natural-language corpus sits
    // near -1; synthetic/templated text drifts off). Term counts are
    // one vocabulary-keyed shuffle + a top-k heap; ranking and the
    // regression run over the BOUNDED top-100 frame (the
    // single-partition window is over 100 rows by construction).
    "q_zipf" -> ((s, dir) => {
      val top = t(s, dir, "documents")
        .select(explode(TF.tokens(col("text"))).as("term"))
        .groupBy("term").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term")).limit(100)
      top.select(col("term"), col("freq"),
          row_number().over(
            Window.orderBy(col("freq").desc, col("term"))).as("rank"))
        .agg(
          count(lit(1)).as("n_terms"),
          round(expr("regr_slope(ln(freq), ln(rank))"), 6).as("zipf_slope"))
    }),

    // §2.10 corpus reporting: duplicate-mass attribution per source —
    // which sources ship the copies? Content-hash df via a count
    // window over the hash exchange, then one source-keyed
    // aggregation; exchanges carry 128-bit hashes and source keys,
    // never text.
    "q_dup_mass_by_source" -> ((s, dir) =>
      t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("source"), md5(col("text")).as("__h"))
        .withColumn("__df", count(lit(1)).over(Window.partitionBy("__h")))
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("__df") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
          round(sum(when(col("__df") > 1, 1L).otherwise(0L)) /
            count(lit(1)).cast("double"), 6).as("dup_frac"))),

    // §2.10 quality: per-doc novelty — fraction of the doc's distinct
    // 3-gram shingles with corpus document-frequency exactly 1
    // (boilerplate/template detector, the scoring complement of the
    // dedup tier). Gram hashes on the wire, df via a count window over
    // the gram exchange, one re-keyed aggregation.
    "q_doc_novelty" -> ((s, dir) =>
      CorpusDivergence.docNovelty(t(s, dir, "documents"), "doc_id", "text")),

    // §2.10 text: lexical-diversity signals — type-token ratio and the
    // character-distribution Shannon entropy (gibberish/low-diversity
    // detector) via the native one-pass CharEntropy expression.
    // Map-only, zero shuffle.
    "q_lexical_diversity" -> ((s, dir) => {
      val ts = TF.tokens(col("text"))
      t(s, dir, "documents")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          round(size(array_distinct(ts)).cast("double") /
            greatest(size(ts), lit(1)), 6).as("ttr"),
          round(graft.functions.NativeExpressions.charEntropy(col("text")), 6)
            .as("char_entropy"))
    }),

    "q_text_stats" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          TF.textStatsOf(TF.tokens(col("text")), Seq("the", "a")).as("__st"))
        .select(
          col("doc_id"),
          col("__st.token_count").cast("long").as("n_tokens"),
          col("__st.type_count").cast("long").as("n_types"),
          round(col("__st.len_sum").cast("double") /
            greatest(col("__st.token_count"), lit(1)), 6).as("mean_tok_len"),
          round(col("__st.stop_count") /
            greatest(col("__st.token_count"), lit(1)), 6).as("stop_ratio"))
    }),

    // §2.10 text analysis: composite quality score
    "q_quality" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"), TF.tokens(col("text")).as("__toks"))
        .select(
          col("doc_id"),
          round(TF.qualityScoreOf(col("text"), col("__toks"), Seq("the", "a")), 6).as("quality"))),

    // §2.10 text analysis: bag-of-words document fingerprint
    "q_fingerprint" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"), TF.bowFingerprint(col("text")).as("fp"))),

    // §2.10 text analysis: corpus language statistics
    "q_lang_stats" -> ((s, dir) =>
      t(s, dir, "documents").groupBy("lang").agg(
        count(lit(1)).as("n"),
        round(avg(col("n_chars")), 4).as("avg_chars"))),

    // §2.10 text analysis: stopword-profile language ID
    "q_langid" -> ((s, dir) =>
      t(s, dir, "documents").select(
        col("doc_id"),
        TF.langIdByStopwords(col("text"),
          Map("en" -> Seq("the", "a"), "es" -> Seq("el", "la"))).as("lang_pred"))),

    // §2.10 similarity search: exact brute-force cosine top-5
    "q_simsearch" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.bruteTopK(
        emb.filter(col("vec_id") < 64), emb, "vec_id", "embedding", k = 5)
        .select("probe_id", "neighbor_id", "rank")
    }),

    // §2.10 retrieval: MMR diversity re-rank — top-5 by maximal
    // marginal relevance (lambda = 0.7) over probe 0's cosine top-30
    // candidates; the greedy loop runs driver-side over the BOUNDED
    // candidate list, the search tier stays distributed and swappable.
    "q_mmr" -> ((s, dir) =>
      Mmr.mmrRerank(t(s, dir, "embeddings"), "vec_id", "embedding",
        probeId = 0L, candidateK = 30, k = 5, lambda = 0.7)),

    // §2.10 near-dup: token-set Jaccard pairs (exact verifier over a
    // bounded probe set — None disables the hot-token DF cap so the
    // oracle's all-token Jaccard matches exactly; the operator default
    // keeps the cap)
    "q_jaccard_pairs" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      DedupOps.tokenJaccardPairs(d, "doc_id", "text", maxDocFreq = None)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    }),

    // §2.10 near-dup end-to-end: verified pairs (token Jaccard above
    // threshold over a bounded probe set) -> drop the losers, keep the
    // survivors. Exercises the full dedup pipeline shape
    // candidates -> verify -> drop under the SQL oracle.
    "q_neardup_drop" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      val confirmed = DedupOps.tokenJaccardPairs(d, "doc_id", "text",
          maxDocFreq = None)
        .filter(col("jaccard") > 0.5)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      DedupOps.dropNearDuplicates(d, "doc_id", confirmed)
        .select("doc_id", "lang", "n_chars")
    }),

    // §2.10 near-dup: connected-components cluster labels over
    // verified pairs (transitive closure; oracle = recursive CTE)
    "q_dup_clusters" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      val confirmed = DedupOps.tokenJaccardPairs(d, "doc_id", "text",
          maxDocFreq = None)
        .filter(col("jaccard") > 0.5)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      DedupOps.duplicateClusters(confirmed)
    }),

    // §2.10 near-dup: the DISTRIBUTED connected-components tier under
    // the same recursive-CTE oracle — driverThreshold = 0 forces the
    // iterative min-label propagation path that 100 TB pair graphs
    // take (the default tier would collect this tiny graph to the
    // driver; PlanHygieneSpec asserts the two tiers' plan shapes)
    "q_dup_clusters_dist" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      val confirmed = DedupOps.tokenJaccardPairs(d, "doc_id", "text",
          maxDocFreq = None)
        .filter(col("jaccard") > 0.5)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      DedupOps.duplicateClusters(confirmed, driverThreshold = 0L)
    }),

    // §2.10 near-dup: canonical-document selection — within each dup
    // cluster keep the member with the most content (n_chars, ties to
    // the smaller id), not the smallest id: the keep-longest policy
    // production dedups apply so template families keep their best
    // copy. One (id, score) join + one cluster-keyed window; text
    // never rides an exchange.
    "q_canonical_docs" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      val confirmed = DedupOps.tokenJaccardPairs(d, "doc_id", "text",
          maxDocFreq = None)
        .filter(col("jaccard") > 0.5)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      DedupOps.canonicalPerCluster(d, "doc_id", "n_chars",
        DedupOps.duplicateClusters(confirmed))
    }),

    // §2.10 near-dup: MinHash-LSH candidate pairs (xxhash64 signatures
    // are engine-specific, so the oracle is the pinned sf0.01 fixture
    // in OracleFixtures; semantics via ScalaTest planted dups)
    "q_minhash_pairs" -> ((s, dir) =>
      DedupOps.minhashCandidatePairs(
        t(s, dir, "documents"), "doc_id", "text",
        numHashes = 32, bands = 16, shingleSize = 3)),

    // §2.10 near-dup EVALUATION: candidate recall/precision of the
    // MinHash banding against the exact shingle-Jaccard >= 0.5 ground
    // truth — the dedup-tier counterpart of q_ann_recall. The oracle
    // replays the truth side from scratch and takes the candidate side
    // from the pinned fixture (xxhash64 signatures have no external
    // replay); Verify swaps the sf0.1 fixture in cross-scale runs.
    "q_lsh_recall" -> ((s, dir) =>
      DedupOps.lshRecall(spread(t(s, dir, "documents"), "doc_id"),
        "doc_id", "text",
        tau = 0.5, numHashes = 32, bands = 16, shingleSize = 3,
        maxDocFreq = None)),

    // §2.10 near-dup: 64-bit SimHash fingerprints (pinned-fixture oracle)
    "q_simhash" -> ((s, dir) =>
      DedupOps.simhash(t(s, dir, "documents"), "text")
        .select("doc_id", "simhash")),

    // §2.10 near-dup: SimHash band-bucketed candidate pairs with full
    // 64-bit Hamming verification — pigeonhole recall 1.0 for
    // hamming <= 3 at 4 bands. Oracle replays banding + verification
    // from the pinned fingerprint fixture.
    "q_simhash_pairs" -> ((s, dir) =>
      DedupOps.simhashBandPairs(spread(t(s, dir, "documents"), "doc_id"),
        "doc_id", "text", maxHamming = 3, bands = 4)),

    // §2.10 multimodal: binary media column -> batched stub-decode ->
    // feature vectors (documents stand in as fake image bytes; the
    // oracle pins row count + feature dimensionality)
    "q_multimodal" -> ((s, dir) => {
      val media = t(s, dir, "documents").filter(col("doc_id") < 200).select(
        col("doc_id").as("media_id"),
        lit("image").as("kind"),
        lit("application/octet-stream").as("mime"),
        col("text").cast("binary").as("content"),
        struct(
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"),
          lit(null).cast("long").as("duration_ms")).as("meta"))
      multimodal.Multimodal.extractAudioFeatures(
        multimodal.Multimodal.extractImageFeatures(
          multimodal.Multimodal.repartitionForDecode(media, 8), dims = 16),
        dims = 32)
        .select(col("media_id"),
          size(col("features")).cast("long").as("n_dims"),
          size(col("audio_features")).cast("long").as("n_audio_dims"))
    }),

    // §2.10 multimodal: video frame sampling — one row per sampled
    // frame; the stub codec's frame GRID (every 500 ms of declared
    // duration) and feature dimensionality are pinned by the oracle,
    // the frame bytes are codec territory
    "q_frames" -> ((s, dir) => {
      val media = t(s, dir, "documents").filter(col("doc_id") < 100).select(
        col("doc_id").as("media_id"),
        lit("video").as("kind"),
        lit("video/mp4").as("mime"),
        col("text").cast("binary").as("content"),
        struct(
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"),
          col("n_chars").cast("long").as("duration_ms")).as("meta"))
      multimodal.Multimodal.sampleVideoFrames(media, everyMs = 500L,
          featureDims = 16)
        .select(col("media_id"), col("frame_ts_ms"),
          size(col("features")).cast("long").as("n_dims"))
    }),

    // §2.10 multimodal: the REAL container-demux tier (Mp4Demux sample
    // tables) driven through its documented degrade path — corpus bytes
    // are not MP4s, so every row takes the stub-grid fallback and the
    // oracle pins that the fallback is exactly q_frames' contract; the
    // real-MP4 leg is pinned sample-exact by Mp4DemuxSpec
    "q_frames_demux" -> ((s, dir) => {
      val media = t(s, dir, "documents").filter(col("doc_id") < 100).select(
        col("doc_id").as("media_id"),
        lit("video").as("kind"),
        lit("video/mp4").as("mime"),
        col("text").cast("binary").as("content"),
        struct(
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          lit(null).cast("int").as("sample_rate"),
          col("n_chars").cast("long").as("duration_ms")).as("meta"))
      multimodal.Multimodal.demuxVideoFrames(media, keyframesOnly = false)
        .select(col("media_id"), col("frame_ts_ms"),
          size(col("features")).cast("long").as("n_dims"))
    }),

    // §2.10 similarity: int8 scalar quantization of embeddings (4x
    // smaller candidate-generation bytes; floor-based rounding so the
    // codes are engine-reproducible). Emitted per-dimension so the
    // oracle hash covers every code.
    // §2.10 embeddings: Johnson–Lindenstrauss random projection with a
    // derived Rademacher matrix (md5-parity signs — no matrix state to
    // ship, every executor and the oracle rebuild it identically).
    // 64 -> 8 dims as one codegen'd map-only projection: zero shuffle
    // at any corpus size, the storage/ANN-prefilter compression stage.
    "q_random_projection" -> ((s, dir) =>
      t(s, dir, "embeddings").select(col("vec_id"),
          posexplode(VF.randomProjection(col("embedding"), outDim = 8,
            dim = 64)))
        .select(col("vec_id"), col("pos").cast("long").as("dim_idx"),
          round(col("col"), 6).as("p"))),

    "q_quantize" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings").filter(col("vec_id") < 200)
        .withColumn("scale", VF.int8Scale(col("embedding")))
      emb.select(col("vec_id"),
          posexplode(VF.quantizeInt8(col("embedding"), col("scale"))),
          round(col("scale"), 6).as("scale"))
        .select(col("vec_id"), col("pos").cast("long").as("dim_idx"),
          col("col").as("q"), col("scale"))
    }),

    // §2.10 similarity search: IVF approximate top-k (deterministic
    // centroids = lowest-id vectors, so the oracle replays the whole
    // index in SQL; recall additionally measured against brute force in
    // ScalaTest)
    "q_ivf_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.ivfTopK(
        emb.filter(col("vec_id") < 64), emb, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4)
        .select("probe_id", "neighbor_id", "rank")
    }),

    // §2.10 similarity search: recall@k evaluation harness — the IVF
    // tier measured against the exact cosine top-k on the same probes
    // (how every index knob gets tuned before a 100 TB deployment)
    // the distributed index's SERVING path: beam search over the
    // stitched-NSW edge list, probes routed by the build's quantizer
    // (the SPANN split). ef here is set past the largest cell, so the
    // beam provably visits every member of the probed cells (the
    // within-cell graph is connected by construction) and the result
    // is exactly the IVF candidate scan over the same cells — which is
    // what the deterministic oracle replays. The beam-LIMITED
    // production shape is pinned by GraphAnnDistSpec and the tier-2
    // stress recall bar.
    "q_gann_search" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      // one quantizer fit shared by build and search (r13): the two
      // calls fit the identical lowest-id quantizer, so the second
      // orderBy-limit-collect job was pure duplication
      val q = GraphAnnDist.fitQuantizer(emb, "vec_id", "embedding", 16)
      val edges = GraphAnnDist.buildIndex(emb, "vec_id", "embedding",
        nCells = 16, m = 4, mCells = 2, quantizer = Some(q))
      GraphAnnDist.searchIndex(emb, edges,
        emb.filter(col("vec_id") < 64), "vec_id", "embedding",
        nCells = 16, k = 5, ef = 1 << 20, nProbe = 4, quantizer = Some(q))
        .select("probe_id", "neighbor_id", "rank")
    }),

    "q_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 64)
      AnnEval.recallAtK(
        SimilaritySearch.ivfTopK(probes, emb, "vec_id", "embedding",
          k = 5, nCells = 16, nProbe = 4),
        SimilaritySearch.bruteTopK(probes, emb, "vec_id", "embedding",
          k = 5),
        k = 5)
    }),

    // §2.10 similarity search: product-quantization ANN (Jégou et al.
    // 2011, inner-product ADC) — the memory-bound index tier: corpus
    // vectors compress to m codebook codes, candidates score by m
    // table lookups instead of dim multiplies
    "q_pq_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      ProductQuantization.pqTopK(
        emb.filter(col("vec_id") < 8), emb, "vec_id", "embedding",
        m = 4, kSub = 16, iters = 1, k = 5)
    }),

    // same computation forced onto the oversized-probe tier: a zero
    // broadcast budget selects the salted shuffled-hash join, so the
    // fallback path carries its own oracle row rather than only the
    // identity spec (the tier a 100x probe volume actually runs on)
    "q_ivf_ann_salted" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.ivfTopK(
        emb.filter(col("vec_id") < 64), emb, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4, maxBroadcastBytes = Some(0L))
        .select("probe_id", "neighbor_id", "rank")
    }),

    // §2.10 similarity search: graph-routed ANN (SPANN/DiskANN shape:
    // driver-built small-world graph over the lowest-id node set,
    // row-local beam-search routing). Run at EXHAUSTIVE beam
    // (ef = nNodes) so routing is the exact node argmax and the oracle
    // can replay the whole index in SQL — the beam-limited tier is
    // covered by GraphAnnSpec's recall + determinism tests
    "q_graph_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      GraphAnn.graphTopK(
        emb.filter(col("vec_id") < 64), emb, "vec_id", "embedding",
        k = 5, nNodes = 32, m = 4, nProbe = 3, ef = 32)
        .select("probe_id", "neighbor_id", "rank")
    }),

    // §2.10 similarity search: the DISTRIBUTED graph-index build —
    // per-cell NSW subgraphs built in executors over an IVF
    // partitioning, stitched through entry nodes along a
    // centroid-level NSW (replaces the driver-bound O(n²) build past
    // its 65k guard). The result is the INDEX ITSELF as a DataFrame;
    // the oracle replays the entire deterministic construction —
    // assignment, within-cell neighbor ranks, entry stitching — in SQL
    "q_graph_ann_dist" -> ((s, dir) =>
      GraphAnnDist.buildIndex(t(s, dir, "embeddings"), "vec_id",
        "embedding", nCells = 8, m = 4, mCells = 2)),

    // §2.10 embedding analysis: leading principal component by rounded
    // power iteration — covariance in ONE corpus pass (typed
    // aggregator, O(dim²) corpus-size-independent shuffle), dim×dim
    // iteration driver-held, map-only codegen'd projection. The
    // rounded chain replays in SQL (ascending-index folds both sides)
    "q_pca_project" -> ((s, dir) =>
      Pca.projectLeading(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, iters = 6)),

    // profiling: pairwise Pearson correlations over the fact table's
    // numeric columns — ONE aggregation pass (all six corr aggregates
    // share the scan and combine map-side), the collinearity check
    // run before feature selection / regression on a new drop
    "q_corr_matrix" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val pairs = for {
        i <- cols.indices; j <- cols.indices if i < j
      } yield round(corr(col(cols(i)), col(cols(j))), 6)
        .as(s"corr_${cols(i).stripPrefix("l_")}_${cols(j).stripPrefix("l_")}")
      li.agg(pairs.head, pairs.tail: _*)
    }),

    // the embedding-health summary: total variance, dominant
    // eigenvalue, and the isotropy ratio lambda1*dim/trace — the
    // number to check on every embedding drop before trusting cosine
    // geometry (anisotropy inflates similarity scores)
    "q_embedding_diag" -> ((s, dir) =>
      Pca.diagnostics(t(s, dir, "embeddings"), "embedding",
        dim = 64, iters = 6)),

    // the dim-reduction form: top-2 components by Hotelling deflation
    // (covariance fit once — still one corpus pass; the residual
    // matrix deflates and re-iterates on the driver). Oracle replays
    // the full chain including the rounded deflation
    "q_pca_top2" -> ((s, dir) =>
      Pca.projectTopK(t(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64, k = 2, iters = 4)),

    // the index-MAINTENANCE leg of the distributed build: appends
    // link only to same-cell BASE members (order-free — ingest
    // batches commute), base-empty cells anchor at the global entry;
    // oracle replays assignment + append-to-base ranks + orphan rule
    "q_graph_ann_append" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      GraphAnnDist.appendToIndex(
        emb.filter(col("vec_id") < 400), emb.filter(col("vec_id") >= 400),
        "vec_id", "embedding", nCells = 8, m = 4)
    }),

    // §2.10 similarity search: SRP-LSH approximate top-k (oracle
    // recomputes the bucketing from the deterministic hyperplanes)
    "q_srp_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.srpTopK(
        emb.filter(col("vec_id") < 64), emb, "vec_id", "embedding",
        k = 5, bands = 4, bitsPerBand = 8, maxDim = 64)
        .select("probe_id", "neighbor_id", "rank")
    }),

    // §2.10 similarity search: int8 quantize-then-rescore top-k — the
    // memory-bandwidth ANN serving shape (candidates scored on 4x
    // smaller dequantized codes, exact cosine only for the k*refine
    // survivors). Oracle replays quantization + both ranking stages.
    "q_quantized_ann" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      SimilaritySearch.quantizedTopK(
        emb.filter(col("vec_id") < 64), emb, "vec_id", "embedding",
        k = 5, refine = 4)
        .select("probe_id", "neighbor_id", "rank")
    }),

    // §2.10 dedup, substring level: exact duplicated-span detection
    // (the suffix-array dedup of Lee et al. 2022, realized as
    // fixed-width gram matching — any verbatim repeat of >= 8 tokens
    // anywhere in the corpus becomes a maximal per-document span)
    "q_dup_spans" -> ((s, dir) =>
      SpanDedup.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
        width = 8)),

    // per-document duplication profile over the same spans — the
    // boilerplate-fraction filter signal
    "q_span_stats" -> ((s, dir) =>
      SpanDedup.spanStats(t(s, dir, "documents"), "doc_id", "text",
        width = 8)),

    // the REWRITE step over the same spans: strip every non-canonical
    // repeat (first corpus occurrence by (doc, pos) is kept), emitting
    // the cleaned corpus — document text never rides an exchange; the
    // rewrite is a per-doc span-list join + row-local token filter
    "q_span_removal" -> ((s, dir) =>
      SpanDedup.removeDuplicatedSpans(t(s, dir, "documents"), "doc_id",
        "text", width = 8)),

    // CDC -> SCD2 validity intervals (one window pass, no self-join);
    // the batch complement of the as-of join
    "q_scd2" -> ((s, dir) =>
      Scd2.intervals(t(s, dir, "events"), "user_id", "ts", "event_id",
        Seq("event_type", "value"))),

    // changelog time-travel: four upsert batches write a retract-pair
    // changelog (the reference's toRetractStream wire observable,
    // CRMLSJoiner.scala:489); snapshotAt(2) reconstructs the table AS
    // OF batch 2 from the log alone — batch 3 is in the log and must
    // NOT leak into the answer. One window pass over the log, batch_id
    // predicate pushed to the scan.
    "q_changelog_snapshot" -> ((s, dir) => {
      // the 1/5 orders sample keeps the four upsert+changelog batches
      // (each pays a key-join change-detection and a bucket merge)
      // bench-priced at history-replay cost, not table-scan cost —
      // the REPLAY semantics are identical at any sample rate
      val (sink, _) = changelogHistory(s, dir, "changelog")
      sink.snapshotAt("o_custkey", 2L)
    }),

    // changelog time travel through a CHECKPOINT: same 4-batch history
    // and the same AS-OF-batch-2 answer as q_changelog_snapshot, but
    // the sink checkpoints every 2nd batch, so the fold anchors on the
    // full-state checkpoint at batch 1 and replays ONLY batch 2's log
    // tail — the Delta-checkpoint read path (replay bounded by
    // checkpoint cadence, not history length) priced and oracled next
    // to the pure-replay one
    "q_changelog_ckpt" -> ((s, dir) => {
      val (sink, _) = changelogHistory(s, dir, "clckpt", checkpointEvery = 2)
      sink.snapshotAt("o_custkey", 2L)
    }),

    // netted CDC diff between two history points (Delta table_changes,
    // netted per key): same 4-batch upsert history; the (1, 3] window's
    // net change per customer — new keys -> insert, changed keys ->
    // update with old_ pre-images. Tail-only read: the pre-image comes
    // from the first retract INSIDE the window, so no base state or
    // checkpoint is touched, and the scan is bounded by the window's
    // shard dirs; one key-partitioned min_by/max_by aggregate
    "q_changelog_diff" -> ((s, dir) => {
      val (_, log) = changelogHistory(s, dir, "cldiff")
      graft.streaming.UpsertJoin.changelogChangesBetween(
        s, log, "o_custkey", 1L, 3L)
    }),

    // storage-layout co-located join: both sides written hash-bucketed
    // on the join key, so the join itself plans with ZERO exchanges
    // (BucketingSpec pins the plan shape; this row pins the values)
    "q_bucketed_join" -> ((s, dir) => {
      // appId-scoped path: two concurrent local sessions (a Verify and
      // a Bench, say) must not clobber each other's table files
      val base = s"${System.getProperty("java.io.tmpdir")}/graft-bucketed-" +
        s.sparkContext.applicationId
      // the two bucketed table writes are independent jobs — overlap
      // them from two driver threads (guide §2.6) so the layout cost is
      // max(li, ord) wall, not the sum
      locally {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        val liF = Future {
          Bucketing.writeBucketed(
            t(s, dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice"),
            "graft_li_bucketed", 16, "l_orderkey", s"$base/li")
        }
        val ordF = Future {
          Bucketing.writeBucketed(
            t(s, dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice"),
            "graft_ord_bucketed", 16, "o_orderkey", s"$base/ord")
        }
        Await.result(liF, Duration.Inf)
        Await.result(ordF, Duration.Inf)
      }
      Bucketing.bucketedJoin(s, "graft_li_bucketed", "graft_ord_bucketed",
        col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice",
          "o_orderstatus", "o_totalprice")
    }),

    // corpus profiling: the ANALYZE pass a pipeline runs over a new
    // data drop — per-column row/null counts, exact NDV, min/max —
    // all exact, one job (the 100x form swaps exact NDV for the HLL
    // sketch via approxNdv, same trade as q_approx_distinct)
    "q_profile" -> ((s, dir) =>
      // spread: the multi-distinct expand (5x row multiply + partial
      // dedup hashing) otherwise runs on the single scan split
      Profile.profile(spread(t(s, dir, "lineitem"), "l_orderkey"),
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"))),

    // the 100x profiling tier: approx_count_distinct (one ordinary
    // aggregation, mergeable HLL partials — no multi-distinct expand).
    // Banded contract like q_approx_distinct: the exact NDV rides along
    // to assert the sketch lands within 5% (+10 absolute for tiny
    // cardinalities); the oracle replays the exact columns and pins
    // ndv_ok = 1
    "q_profile_approx" -> ((s, dir) => {
      val cols = Seq("l_orderkey", "l_returnflag")
      // NOT shared via localCheckpoint (r13 negative result): the two
      // jobs' scan+spread prefixes already OVERLAP from the two driver
      // threads (~0.25 s each, concurrent), so materializing the
      // spread scan once (ckpt ~0.4 s, serial, before either job can
      // start) measured 2.04 -> 2.07 s pace-adjusted — a wash that
      // trades overlap for serialization
      val li = spread(t(s, dir, "lineitem"), "l_orderkey")
      // The exact and sketch profiles are INDEPENDENT eager jobs (each
      // Profile.profile collects one aggregate row); running them from
      // two driver threads overlaps them (guide §2.6) so the row costs
      // max(exact, sketch) wall instead of their sum. (Fusing the HLL
      // into the exact pass is NOT an option: the sketch buffer would
      // ride the multi-distinct expand's per-value phase — measured
      // 14x worse, see OPTIMIZATION_r12.md.)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val apF = Future {
        Profile.profile(li, cols, approxNdv = true, ndvRsd = 0.01)
          .select(col("col_name"), col("n_distinct").as("__ap"))
      }
      val exF = Future { Profile.profile(li, cols) }
      val ap = Await.result(apF, Duration.Inf)
      Await.result(exF, Duration.Inf).join(ap, Seq("col_name"))
        .select(col("col_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_val"), col("max_val"),
          (abs(col("__ap") - col("n_distinct")) <=
            greatest(col("n_distinct") * 0.05, lit(10)))
            .cast("int").as("ndv_ok"))
    }),

    // the sketch tier ALONE — what the 100x path actually pays:
    // approx_count_distinct is one ordinary aggregation (mergeable HLL
    // partials, no multi-distinct expand), so this row prices the
    // sketch without q_profile_approx's exact-NDV audit riding along.
    // The banded contract moves to the OUTPUT: ndv_ok asserts the
    // sketch lands inside a per-column cardinality band wide enough
    // (10x+) that the 5% rsd cannot straddle it, and the oracle
    // re-derives the same flag from DuckDB's exact NDV — each side
    // pays only its own tier. rsd 0.05 (the Profile default) is the
    // deliberate sketch sizing: 0.01 needs 32x the HLL registers and
    // measured 3.6x the wall (1.7 s vs 0.5 s) for precision the band
    // never uses
    "q_profile_sketch" -> ((s, dir) => {
      val sk = Profile.profile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_quantity", "l_returnflag"),
        approxNdv = true)
      // floor() explicitly on BOTH engines: Spark's cast(long)
      // truncates toward zero while DuckDB's CAST(... AS BIGINT)
      // rounds to nearest — an NDV on the band edge would flip
      // ndv_ok on one side only
      val lo = when(col("col_name") === "l_orderkey",
          floor(col("n_rows") * 0.1))
        .when(col("col_name") === "l_quantity", lit(10L))
        .otherwise(lit(1L))
      val hi = when(col("col_name") === "l_orderkey",
          floor(col("n_rows") * 0.5))
        .when(col("col_name") === "l_quantity", lit(200L))
        .otherwise(lit(10L))
      sk.select(col("col_name"), col("n_rows"), col("n_null"),
        col("min_val"), col("max_val"),
        (col("n_distinct") >= lo && col("n_distinct") <= hi)
          .cast("int").as("ndv_ok"))
    }),

    // equi-width histogram profiling — plain IEEE-double bin math, so
    // the oracle recomputes the exact same bins in SQL
    "q_profile_hist" -> ((s, dir) =>
      Profile.histogram(t(s, dir, "lineitem"), "l_extendedprice", 16)),

    // data layout: Z-order (Morton) clustering — the multi-column
    // pruning layout. The oracle pins content identity through the
    // quantile-sketch + interleave + range-partitioned write; the
    // clustering claim itself is measured by LayoutSpec's
    // files-touched probe (either clustered column prunes)
    "q_zorder" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-zorder-" +
        s.sparkContext.applicationId
      Layout.zorderWrite(
        spread(t(s, dir, "lineitem").select("l_orderkey", "l_partkey",
          "l_suppkey", "l_quantity"), "l_orderkey"),
        Seq("l_orderkey", "l_partkey"), path, numFiles = 16, bits = 8)
      s.read.parquet(path)
    }),

    // data layout: target-file-size writer (the small-files control).
    // The oracle pins content identity through the size-derived file
    // count + range exchange + write; the file-size band itself is
    // measured by SizedWriteSpec
    "q_sized_write" -> ((s, dir) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft-sized-" +
        s.sparkContext.applicationId
      Layout.sizedWrite(
        t(s, dir, "lineitem").select("l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice"),
        Seq("l_orderkey"), path, targetFileBytes = 256L << 10)
      s.read.parquet(path)
    }),

    // §2.10 training-data assembly: temperature mixing over the
    // observed per-language counts (alpha = 0.5 upsamples tail
    // languages, downsamples the en head; epochs realize rates > 1).
    // The oracle replays count -> sqrt-weight -> rate -> md5-threshold
    // acceptance in SQL with the identical IEEE operation order
    "q_mix_temperature" -> ((s, dir) =>
      TrainingOps.temperatureMix(t(s, dir, "documents"), "doc_id",
        "lang", alpha = 0.5, targetFraction = 1.0, maxRate = 4.0)
        .select("doc_id", "lang", "epoch")),

    // §2.10 the end-to-end assembly: quality filter -> exact dedup ->
    // train split -> sequence packing as ONE declarative plan (two
    // exchanges total, pinned by PlanHygieneSpec); the oracle replays
    // all four stages in one SQL pipeline
    "q_pipeline" -> ((s, dir) =>
      TrainingOps.assembleTrainingSet(t(s, dir, "documents"),
        "doc_id", "text", minQuality = 0.5, capacity = 512L)),

    // §2.10 corpus scoring: DSIR importance weights — rank the raw
    // pool by target-domain fit via hashed-bucket log-likelihood
    // ratios (256-entry model collected to a literal map; the scoring
    // pass itself is map-only, zero shuffle). Target = three sources
    // standing in for the curated domain
    "q_dsir" -> ((s, dir) =>
      CorpusScoring.dsirWeights(t(s, dir, "documents"), "doc_id", "text",
        col("source").isin("src0", "src1", "src2"))),

    // §2.10 corpus scoring: the importance-resampling DRAW over those
    // weights — deterministic rejection acceptance u < exp(logw − shift)
    // (md5-quantized at 1/65536), map-only after the 256-row model
    // collect; shift = −2 ≈ the corpus median logw, so the draw mixes
    // saturated keeps, probabilistic keeps, and rejections
    "q_dsir_sample" -> ((s, dir) =>
      CorpusScoring.importanceResample(t(s, dir, "documents"), "doc_id",
        "text", col("source").isin("src0", "src1", "src2"),
        shift = -2.0)),

    // §2.10 assembly: highest-quality prefix under a global token
    // budget — distributed prefix-sum (range sort + per-partition
    // offsets), never a single-partition window; budget fixed so the
    // kept fraction shrinks as the corpus grows
    "q_token_budget" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("doc_id"),
          round(TF.qualityScoreOf(col("text"), TF.tokens(col("text")),
            Seq("the", "a")), 6).as("score"),
          TF.tokenCount(col("text")).cast("long").as("n_tokens"))
      TrainingOps.selectUnderTokenBudget(d, "doc_id", col("n_tokens"),
        col("score"), budget = 15000L)
    }),

    // §2.10 corpus scoring: Naive Bayes quality classifier — fit
    // per-class token counts on a 30% content-addressed seed labeled
    // by the quality heuristic (threshold at the observed median so
    // both classes carry mass), score every document with the
    // closed-form log-odds. The label thresholds the ROUNDED quality
    // score so both engines agree at the boundary
    "q_nb_quality" -> ((s, dir) => {
      val d = spread(t(s, dir, "documents"), "doc_id")
      CorpusScoring.naiveBayesQuality(d, "doc_id", "text",
        round(TF.qualityScoreOf(col("text"), TF.tokens(col("text")),
          Seq("the", "a")), 6) >= 0.88,
        seedFrac = 0.3, seed = "nbseed")
    }),

    // §2.10 scoring eval: reliability curve of the NB quality score
    // against the heuristic ground truth — per fixed logistic-
    // probability decile, how many docs land there and what fraction
    // are actually good (the threshold-selection pass before the score
    // gates a filter). Fixed bins are map-only into a 10-row aggregate;
    // no global sort, nothing grows with the corpus
    "q_calibration" -> ((s, dir) => {
      val d = spread(t(s, dir, "documents"), "doc_id")
      val isGood = round(TF.qualityScoreOf(col("text"), TF.tokens(col("text")),
        Seq("the", "a")), 6) >= 0.88
      val scored = CorpusScoring.naiveBayesQuality(d, "doc_id", "text",
        isGood, seedFrac = 0.3, seed = "nbseed")
      CorpusScoring.calibration(scored, "doc_id", "nb_score",
        d.select(col("doc_id"), isGood.as("is_good")), "is_good")
    }),

    // §2.10 corpus scoring: cross-corpus LM scoring — score the
    // general pool against a unigram model fit on the TARGET sources
    // only, unseen tokens at the explicit floor (the two-corpus
    // KenLM-filter shape; q_lm_quality covers the self-scored form)
    "q_lm_cross" -> ((s, dir) => {
      val d = t(s, dir, "documents")
      val isTarget = col("source").isin("src0", "src1", "src2")
      UnigramLm.scoreAgainst(d.filter(!isTarget), "doc_id", "text",
          UnigramLm.model(d.filter(isTarget), "text"),
          unseenLogp = Some(math.log(1e-9)))
        .select(col("doc_id"), col("n_tokens"),
          round(col("logprob"), 6).as("logprob"))
    }),

    // §2.10 tokenizer training, stage 0 (the SQL-replayable one):
    // adjacent character-pair counts over word types weighted by word
    // frequency, top 20 under the merge loop's total order — iteration
    // 0 of the merge loop as a standalone frame (the full loop is
    // q_bpe_learn below; BpeLearnSpec pins hand-computed tables too)
    "q_bpe_pairs" -> ((s, dir) =>
      BpeLearn.initialPairCounts(t(s, dir, "documents"), "text")
        .orderBy(desc("pair_count"), asc("sym_left"), asc("sym_right"))
        .limit(20)),

    // §2.10 tokenizer training: the iterative argmax merge LOOP itself
    // (BpeLearn.learnMerges), oracled by unrolling the k greedy stages
    // as CTEs (OracleGen.bpeLearnSql — the q_mmr greedy-unroll trick).
    // Closes the catalog's last spec-only operator: the distributed leg
    // is the word-type aggregation; the loop is bounded driver work.
    "q_bpe_learn" -> ((s, dir) =>
      BpeLearn.learnMergesDf(t(s, dir, "documents"), "text", nMerges = 8)
        .select(col("merge_rank"), col("left").as("sym_left"),
          col("right").as("sym_right"))),

    // §2.10 embedding ops: deterministic rounded-Lloyd k-means —
    // lowest-id init, per-iteration cosine argmax (map-only, centroid
    // matrix as a codegen reference) + 6-decimal-rounded means, so the
    // oracle replays BOTH iterations and the final assignment exactly
    "q_kmeans" -> ((s, dir) =>
      KMeans.assignRounded(t(s, dir, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2)),

    // §2.10 embedding ops: per-class centroids in exploded
    // (label, dim) form — posexplode + groupBy keeps the shuffle at
    // labels x dims rows after map-side partials, never vectors x dims
    "q_centroids" -> ((s, dir) =>
      t(s, dir, "embeddings")
        .select(col("label"),
          posexplode(VF.toDouble(col("embedding"))).as(Seq("dim_idx", "v")))
        .groupBy(col("label"), col("dim_idx").cast("long").as("dim_idx"))
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("v")), 6).as("centroid"))),

    // §2.10 text analysis: BPE ENCODE with a fixed merge table — the
    // inference half of the tokenizer surface (q_bpe_pairs/BpeLearn is
    // the training half). Map-only scan: the table rides inside the
    // native expression; greedy left-to-right merging is replayed in
    // the oracle as a separator-joined replace() chain
    "q_bpe_encode" -> ((s, dir) =>
      BpeLearn.encodeStats(t(s, dir, "documents"), "doc_id", "text",
        BpeEncodeMerges)),

    // §2.10 text analysis: BM25 ranked retrieval — the lexical leg of
    // query-driven corpus curation. df and corpus stats are broadcast
    // (≤|query| rows, 1 row); top-k is TakeOrderedAndProject
    "q_bm25" -> ((s, dir) =>
      Bm25.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("join", "window", "scan"), k = 25)),

    // §2.10 similarity tier: hybrid retrieval — BM25 top-50 fused with
    // the probe vector's exact-cosine top-50 by Reciprocal Rank Fusion
    // (1/(60+rank), no score calibration across rankers). The ranking
    // window runs over the 50-row bounded BM25 result, not the corpus;
    // the fuse is one tiny keyed aggregation + TakeOrderedAndProject
    "q_rrf" -> ((s, dir) => {
      val lexical = Bm25.bm25TopK(t(s, dir, "documents"), "doc_id",
          "text", queryTerms = Seq("join", "window", "scan"), k = 50)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))))
        .select(col("doc_id"), col("rank"))
      val emb = t(s, dir, "embeddings")
      val semantic = SimilaritySearch.bruteTopK(
          emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding",
          k = 50)
        .select(col("neighbor_id").as("doc_id"), col("rank"))
      HybridRetrieval.rrfFuse(Seq(lexical, semantic), "doc_id", "rank",
        k = 20)
    }),

    // §2.10 dedup tier: SemDeDup — rounded-Lloyd clustering, then
    // within-cluster cosine pairs only (comparison volume bounded by
    // the cluster size the k knob controls, never corpus-quadratic);
    // keeper rule = smallest id in each over-threshold pair
    "q_semdedup" -> ((s, dir) =>
      SemDedup.semDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, tau = 0.30)),

    // §2.10 similarity tier: k-NN label propagation — majority vote of
    // the 10 nearest labeled neighbors (exact cosine; vote ties to the
    // smaller label) for the 40 "unlabeled" probe vectors
    "q_knn_classify" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      KnnClassify.classify(e.filter(col("vec_id") < 40),
        e.filter(col("vec_id") >= 40), "vec_id", "embedding", "label",
        k = 10)
    }),

    // §2.10 event analytics: strict ordered funnel view→click→purchase
    // — every exchange keyed on the user, stage count constant
    "q_funnel" -> ((s, dir) =>
      EventAnalytics.funnel(t(s, dir, "events"), "user_id", "ts",
        "event_type", Seq("view", "click", "purchase"))),

    // §2.10 event analytics: weekly cohort retention (Monday-truncated
    // first-event cohorts; (cohort, offset) key space is calendar-bounded)
    "q_retention" -> ((s, dir) =>
      EventAnalytics.retention(t(s, dir, "events"), "user_id", "ts")),

    // §2.10 record linkage: blocked Levenshtein pairs over DISTINCT
    // part names (block key = last token; vocabulary-sized join, the
    // raw table only contributes per-value row mass)
    "q_fuzzy_match" -> ((s, dir) =>
      FuzzyMatch.blockedPairsWithMass(t(s, dir, "part"), "p_name",
        n => regexp_extract(n, "[^ ]+$", 0), maxDist = 3)
        .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"),
          col("n_rows_a"), col("n_rows_b"))),

    // §2.10 contrastive training: hard-negative mining — top-5 most
    // similar DIFFERENT-label vectors per probe (probes broadcast,
    // corpus scanned once, map-side top-k truncation)
    "q_hard_negatives" -> ((s, dir) =>
      SimilaritySearch.hardNegatives(t(s, dir, "embeddings"), "vec_id",
        "embedding", "label", col("vec_id") < 32, k = 5)
        .select("probe_id", "neighbor_id", "rank")),

    // §2.10 text canonicalization: one-pass native NFC + lowercase +
    // SQL-space collapse (the dedup pre-key); map-only, zero shuffle
    "q_normalize" -> ((s, dir) => {
      val norm = TF.normalizeText(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"), md5(norm).as("norm_hash"),
        length(norm).cast("long").as("n_norm_chars"))
    }),

    // §2.10 mixture shaping: per-source document cap (seeded
    // content-addressed draw, stable under partitioning and append order)
    "q_source_cap" -> ((s, dir) =>
      TrainingOps.capPerGroup(t(s, dir, "documents"), "source", "doc_id",
        maxRows = 20, orderSalt = "cap")
        .select("doc_id", "source", "grp_rank")),

    // §2.8 relational surface: unpivot (melt) — wide metrics to tall
    // (metric, val) rows; map-only Expand, no shuffle
    "q_unpivot" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "val")),

    // §2.4 statistics: per-group correlation / covariance / stddev —
    // the feature-drift panel, one partial-aggregated pass
    "q_corr" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          round(corr("l_quantity", "l_extendedprice"), 6).as("corr_qty_price"),
          round(covar_samp("l_quantity", "l_extendedprice"), 6).as("covar_qty_price"),
          round(stddev_samp("l_quantity"), 6).as("std_qty"))),

    // §2.10 monitoring: per-segment z-score anomaly flags (group stats
    // broadcast back, scoring map-only — the winsorize plan stance)
    "q_zscore" -> ((s, dir) =>
      Outliers.zscore(t(s, dir, "events"), "event_type", "value",
        threshold = 2.5)
        .select("event_id", "event_type", "z", "is_anomaly")),

    // §2.10 statistics: chi-square independence of (lang, source) — the
    // feature-dependence screen; one bounded contingency aggregation
    "q_chisq" -> ((s, dir) =>
      Stats.chiSquare(t(s, dir, "documents"), "lang", "source")),

    // §2.10 experimentation: two-proportion A/B z-test — synthetic arms
    // by user parity, conversion = purchase events; pooled-variance z
    "q_abtest" -> ((s, dir) =>
      Stats.twoProportionZ(t(s, dir, "events"),
        armCol = pmod(col("user_id"), lit(2)) === 0,
        hitCol = col("event_type") === "purchase")),

    // §2.10 co-occurrence analytics: market-basket association rules —
    // pair generation bounded by basket size (self-join on the order
    // key), supports broadcast back; lift > 1 = genuine affinity
    "q_basket" -> ((s, dir) =>
      // spread: the per-basket collect_set partials otherwise run on
      // the single scan split (r13; hash on the basket key so the
      // groupBy reuses the exchange)
      MarketBasket.pairRules(spread(t(s, dir, "lineitem"), "l_orderkey"),
        "l_orderkey", "l_partkey", minCount = 3L)),

    // §2.10 graph analytics: per-node triangle counts over the
    // confirmed near-dup graph (clique-density separates true dup
    // families from transitive chains); two equi-joins, Σdeg² work
    "q_triangles" -> ((s, dir) => {
      val d = t(s, dir, "documents").filter(col("doc_id") < 40)
      val edges = DedupOps.tokenJaccardPairs(d, "doc_id", "text",
          maxDocFreq = None)
        .filter(col("jaccard") > 0.5)
        .select(col("doc_a").as("id_a"), col("doc_b").as("id_b"))
      GraphMetrics.triangleCounts(edges)
    }),

    // §2.10 graph analytics: bounded-depth BFS — min hop distance
    // from a seed account set over the customer–supplier purchase
    // graph (orders×lineitem edges, suppliers offset out of the
    // customer id space); the crawl-frontier / link-distance-feature
    // primitive. Each hop is one id-keyed frontier join + anti-join;
    // maxHops bounds the plan depth
    "q_bfs_hops" -> ((s, dir) => {
      val edges = t(s, dir, "orders")
        .join(t(s, dir, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("id_a"),
          (col("l_suppkey") + 100000000L).as("id_b"))
        .distinct()
      val seeds = t(s, dir, "customer")
        .filter(col("c_custkey") % 100 === 1)
        .select(col("c_custkey").as("id"))
      GraphMetrics.bfsHops(edges, seeds, maxHops = 3)
    }),

    // §2.10 graph analytics: Adamic–Adar link prediction — score
    // supplier pairs by shared parts (Σ 1/ln(deg) over common
    // neighbors; rare shared parts say more than commodity ones).
    // maxDegree = 64 keeps part middles (deg ≤ ~30 at every SF) and
    // excludes supplier middles (deg ≥ 200) — hub wedge fan-out is the
    // deg² cost AND the least informative term, so at web scale you
    // always cap
    "q_adamic_adar" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .select(col("l_partkey").as("id_a"),
          (col("l_suppkey") + 100000000L).as("id_b"))
      GraphMetrics.adamicAdar(edges, maxDegree = Some(64))
    }),

    // §2.10 robust monitoring: median/MAD outlier flags — the
    // fat-tail-safe zscore (a planted extreme can't mask itself by
    // inflating the stddev); two broadcast joins, fact never shuffles
    "q_mad" -> ((s, dir) =>
      Outliers.madOutliers(t(s, dir, "events"), "event_type", "value",
          threshold = 3.5)
        .select("event_id", "event_type", "robust_z", "is_outlier")),

    // §2.10 privacy release: per-source counts with seeded-Laplace DP
    // noise (sensitivity-1 count query, b = 1/epsilon; the seed makes
    // the release oracle-replayable — production swaps in entropy,
    // same plan and math)
    "q_dp_counts" -> ((s, dir) =>
      Privacy.laplaceNoisyCounts(t(s, dir, "documents"), "source",
        epsilon = 1.0)),

    // §2.10 privacy audit: k-anonymity over the (lang, source)
    // quasi-identifier — combinations shared by fewer than k rows are
    // flagged for suppression before release
    "q_kanon" -> ((s, dir) =>
      Privacy.kAnonymityAudit(t(s, dir, "documents"),
        Seq("lang", "source"), k = 5)),

    // §2.10 lexical retrieval: TF-IDF-weighted document cosine ("more
    // like this") — inverted-index pair generation, never probes x
    // corpus; cap None = the oracle-exact mode
    "q_doc_sim" -> ((s, dir) =>
      TfIdf.docSimilarity(t(s, dir, "documents"), "doc_id", "text",
          probeFilter = col("doc_id") < 10, k = 5, maxDocFreqRatio = None)
        .select("doc_a", "doc_b", "rank")),

    // §2.10 RAG assembly: probe 0's exact top-3 embedding neighbors
    // (vec ids are aligned with doc ids in the test corpus) joined to
    // the document store and concatenated in rank order — the
    // prompt-ready context blob, hashed for oracle comparison
    "q_rag_context" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val top = SimilaritySearch.bruteTopK(
        emb.filter(col("vec_id") === 0), emb, "vec_id", "embedding", k = 3)
      HybridRetrieval.ragContext(top, t(s, dir, "documents")
          .withColumnRenamed("doc_id", "neighbor_id"),
          "probe_id", "neighbor_id", "rank", "text")
        .select(col("probe_id"), col("n_docs"), col("total_tokens"),
          md5(col("context")).as("ctx_hash"))
    }),

    // §2.10 graph analytics: rounded-power-iteration PageRank over the
    // customer-nation bipartite graph (nation ids offset into a
    // disjoint range) — hub detection over the linkage graphs the
    // dedup/entity tiers produce; per-iteration rounding makes the
    // chain oracle-replayable (the rounded-Lloyd stance)
    "q_pagerank" -> ((s, dir) => {
      val edges = t(s, dir, "customer").select(
        col("c_custkey").as("id_a"),
        (col("c_nationkey") + 1000000L).as("id_b"))
      PageRank.ranks(edges, iters = 3)
    }),

    // §2.10 clustering eval: per-cluster label purity over the
    // rounded-Lloyd assignment (k = 8, 2 iterations — the q_kmeans
    // configuration); everything past the assignment is O(k x labels)
    "q_cluster_purity" -> ((s, dir) =>
      KMeans.clusterPurity(t(s, dir, "embeddings"), "vec_id", "embedding",
        "label", k = 8, iters = 2)),

    // §2.10 label audit: k-NN disagreement — every labeled vector
    // re-classified by its 10 nearest OTHER labeled vectors; rows whose
    // neighborhood contradicts their label are mislabeling suspects
    "q_label_suspects" -> ((s, dir) =>
      // spread: the all-pairs probe x corpus cosine work otherwise
      // runs on the embeddings table's single scan split
      KnnClassify.labelSuspects(spread(t(s, dir, "embeddings"), "vec_id"),
        "vec_id", "embedding", "label", k = 10)),

    // §2.10 label audit, IVF-searched: the same disagreement screen
    // with the neighbor search routed through the deterministic IVF
    // index — the web-scale tier the brute row's scaladoc points at
    // (candidates shrink by ~nProbe/nCells; the approximation is
    // deterministic, so the oracle replays index + vote end to end)
    "q_label_suspects_ivf" -> ((s, dir) =>
      KnnClassify.labelSuspectsIvf(spread(t(s, dir, "embeddings"), "vec_id"),
        "vec_id", "embedding", "label", k = 10, nCells = 16, nProbe = 4)),

    // §2.10 near-dup: directional shingle containment (Broder) — the
    // quote/subset-duplicate detector symmetric Jaccard misses; cap
    // disabled so the oracle's exact counts match
    "q_containment" -> ((s, dir) =>
      // spread: tokenize + gram hashing otherwise runs on the single
      // scan split (measured 2.1x at sf0.1 on local[32])
      DedupOps.containmentPairs(spread(t(s, dir, "documents"), "doc_id"),
          "doc_id", "text", tau = 0.2, maxDocFreq = None)
        .select(col("doc_a"), col("doc_b"),
          round(col("cont_a"), 6).as("cont_a"),
          round(col("cont_b"), 6).as("cont_b"))),

    // §2.5 join family completion: FULL OUTER over two aggregates with
    // genuinely exclusive key regions on both sides (order-only
    // custkeys >= 100; event-only users < 100)
    "q_fullouter" -> ((s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_custkey") >= 100)
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_orders"))
      val e = t(s, dir, "events")
        .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("n_events"))
      o.join(e, Seq("k"), "full_outer")
        .select(col("k"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("n_events"), lit(0L)).as("n_events"))
    }),

    // §2.10 record linkage, stage 2: entity groups — fuzzy match pairs
    // fed to the shared union-find/min-label clustering tier, canonical
    // name = lexicographic min of the group (string-id CC path)
    "q_entity_groups" -> ((s, dir) => {
      val pairs = FuzzyMatch.blockedPairs(t(s, dir, "part"), "p_name",
          n => regexp_extract(n, "[^ ]+$", 0), maxDist = 3)
        .select(col("name_a").as("id_a"), col("name_b").as("id_b"))
      DedupOps.duplicateClusters(pairs)
        .select(col("id").as("name"), col("label").as("canonical"))
    }),

    // §2.6 ranking-window family: percent_rank / cume_dist / ntile in
    // one pass over one partition-keyed exchange (deterministic via
    // the orderkey tiebreak — ntile is order-sensitive within ties)
    "q_ntile" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"),
        ntile(4).over(w).cast("long").as("quartile"))
    }),

    // §2.10 event analytics: row-level sessionization — gap-based
    // session ordinals per user (lag flag + running sum over ONE
    // user-keyed exchange); the assignment form of q_session
    "q_session_ids" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gapMicros = 30L * 60 * 1000000
      // ts is TIMESTAMP_NTZ; the session is pinned UTC, so the cast to
      // TIMESTAMP is micros-identical and unix_micros applies
      def micros(c: Column) = unix_micros(c.cast("timestamp"))
      val flag = when(lag("ts", 1).over(w).isNull ||
        micros(col("ts")) - micros(lag("ts", 1).over(w)) > gapMicros, 1)
        .otherwise(0)
      t(s, dir, "events").select(
        col("event_id"), col("user_id"),
        sum(flag).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long").as("session_seq"))
    })
  )

  // ---------------------------------------------------------------- oracle

  /** Shared by q_contamination and q_contamination_bloom — the Bloom
    * variant is output-identical by construction, so one oracle pins
    * both (and a drift between the two operators shows up as exactly
    * one of the rows going red).
    */
  /** Fixed rank-ordered merge table for q_bpe_encode — shared verbatim
    * by the Spark side and the oracle generator so the two can never
    * drift. Fixed (not learned) because the oracle must be
    * scale-independent; the LEARNED table's correctness is BpeLearnSpec
    * territory.
    */
  private val BpeEncodeMerges: Seq[(String, String)] = Seq(
    "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
    "a" -> "n", "i" -> "n", "o" -> "w", "s" -> "c")

  private val ContaminationOracleSql: String =
    raw"""WITH s AS (
         SELECT doc_id,
           CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train'
                WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'val'
                ELSE 'test' END AS split,
           string_split_regex(trim(text), '\s+') AS toks
         FROM documents),
       g AS (
         SELECT doc_id, split, array_to_string(toks[i:(i+2)], ' ') AS ngram
         FROM s, unnest(range(1, len(toks) - 1)) AS u(i)
         WHERE len(toks) >= 3),
       tg AS (SELECT DISTINCT ngram FROM g WHERE split = 'train'),
       eg AS (SELECT DISTINCT doc_id, split, ngram FROM g WHERE split <> 'train')
       SELECT eg.doc_id, eg.split,
         count(DISTINCT eg.ngram) AS n_contaminated
       FROM eg JOIN tg USING (ngram)
       GROUP BY eg.doc_id, eg.split"""

  /** The naiveBayesQuality replay's CTE chain (fit + score), shared
    * verbatim by the q_nb_quality and q_calibration oracles so the two
    * can never drift: `q` carries the per-doc rounded quality score,
    * `scored` the per-doc NB log-odds.
    */
  private val nbChainCtes: String =
    raw"""sc AS (
             SELECT doc_id, text,
               len(string_split_regex(trim(text), '\s+')) AS n,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                   t -> t = 'the' OR t = 'a'))
                 / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS stop_ratio,
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
                 / greatest(length(text), 1) AS punct_ratio
             FROM documents),
           q AS (
             SELECT doc_id, text,
               round(
                 (CASE WHEN n < 10 THEN CAST(n AS DOUBLE) / 10.0
                       WHEN n > 100000 THEN 100000.0 / CAST(n AS DOUBLE)
                       ELSE 1.0 END) * 0.4
                 + (1.0 - least(punct_ratio * 5, 1.0)) * 0.3
                 + least(stop_ratio * 10, 1.0) * 0.3, 6) AS quality
             FROM sc),
           seed AS (
             SELECT doc_id, text, quality >= 0.88 AS g FROM q
             WHERE substr(md5('nbseed:' || CAST(doc_id AS VARCHAR)), 1, 4) < '4ccc'),
           stok AS (
             SELECT doc_id, g,
               unnest(string_split_regex(trim(text), '\s+')) AS term
             FROM seed),
           m AS (
             SELECT term,
               sum(CASE WHEN g THEN 1 ELSE 0 END) AS g_n,
               sum(CASE WHEN g THEN 0 ELSE 1 END) AS b_n
             FROM stok GROUP BY term),
           tt AS (SELECT sum(g_n) AS ng, sum(b_n) AS nb, count(*) AS v FROM m),
           dt AS (
             SELECT sum(CASE WHEN g THEN 1 ELSE 0 END) AS dg,
               sum(CASE WHEN g THEN 0 ELSE 1 END) AS db
             FROM seed),
           tok AS (
             SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
             FROM documents),
           terms AS (
             SELECT tok.doc_id,
               ln(CAST(coalesce(m.g_n, 0) + 1 AS DOUBLE) / (tt.ng + tt.v)) -
               ln(CAST(coalesce(m.b_n, 0) + 1 AS DOUBLE) / (tt.nb + tt.v)) AS term_lr
             FROM tok LEFT JOIN m USING (term) CROSS JOIN tt),
           scored AS (
             SELECT terms.doc_id, count(*) AS n_tokens,
               round(ln(CAST(dt.dg + 1 AS DOUBLE)) - ln(CAST(dt.db + 1 AS DOUBLE))
                 + sum(term_lr), 6) AS nb_score
             FROM terms CROSS JOIN dt
             GROUP BY terms.doc_id, dt.dg, dt.db)"""

  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         sum(l_extendedprice) AS sum_base_price,
         sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
         avg(l_quantity) AS avg_qty,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q_dedup_latest" ->
      """SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value, e.props
         FROM events e
         JOIN (SELECT user_id, max(ts) AS mts FROM events GROUP BY user_id) m
           ON e.user_id = m.user_id AND e.ts = m.mts""",

    "q_dedup_one" ->
      """SELECT event_id, ts, user_id, event_type, value, props FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t WHERE rn = 1""",

    "q_starjoin" ->
      """SELECT o_orderkey, o_totalprice, c_name, n_name, r_name
         FROM orders
         LEFT JOIN customer ON o_custkey = c_custkey
         LEFT JOIN nation ON c_nationkey = n_nationkey
         LEFT JOIN region ON n_regionkey = r_regionkey""",

    "q_multijoin" ->
      """SELECT l_orderkey, l_linenumber, c_name, p_name, s_name,
                cn.n_name AS cust_nation, cr.r_name AS cust_region,
                sn.n_name AS supp_nation, sr.r_name AS supp_region
         FROM lineitem
         LEFT JOIN orders ON l_orderkey = o_orderkey
         LEFT JOIN customer ON o_custkey = c_custkey
         LEFT JOIN nation cn ON c_nationkey = cn.n_nationkey
         LEFT JOIN region cr ON cn.n_regionkey = cr.r_regionkey
         LEFT JOIN part ON l_partkey = p_partkey
         LEFT JOIN supplier ON l_suppkey = s_suppkey
         LEFT JOIN nation sn ON s_nationkey = sn.n_nationkey
         LEFT JOIN region sr ON sn.n_regionkey = sr.r_regionkey""",

    "q_innerjoin" ->
      """SELECT c_mktsegment, count(*) AS n, sum(o_totalprice) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment""",

    "q_asof_native" ->
      """SELECT event_id, user_id, ts, clk_ts, clk_value FROM (
           SELECT p.event_id, p.user_id, p.ts,
                  b.ts AS clk_ts, b.value AS clk_value,
                  row_number() OVER (PARTITION BY p.event_id
                    ORDER BY b.ts DESC, b.event_id DESC) AS rn
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
             ON b.user_id = p.user_id AND b.ts <= p.ts) t
         WHERE rn = 1""",

    "q_asof" ->
      """SELECT event_id, user_id, ts, clk_ts, clk_value FROM (
           SELECT p.event_id, p.user_id, p.ts,
                  b.ts AS clk_ts, b.value AS clk_value,
                  row_number() OVER (PARTITION BY p.event_id
                    ORDER BY b.ts DESC, b.event_id DESC) AS rn
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
             ON b.user_id = p.user_id AND b.ts <= p.ts) t
         WHERE rn = 1""",

    // the streamed exact-dedup keeps min doc_id per distinct text by
    // construction of the rank-ordered replay
    "q_stream_dedup" ->
      """SELECT doc_id, content_hash FROM (
           SELECT doc_id, md5(text) AS content_hash,
                  row_number() OVER (PARTITION BY md5(text)
                    ORDER BY doc_id) AS rn
           FROM documents) t WHERE rn = 1""",

    // the streamed argmax snapshot = batch argmax (ties to the greater
    // zero-padded payload = greater event_id; test ts are distinct)
    "q_stream_latest" ->
      """SELECT user_id, ts, event_id FROM (
           SELECT user_id, ts, event_id,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts DESC, event_id DESC) AS rn
           FROM events) t WHERE rn = 1""",

    // the streamed temporal join = the batch as-of, on event ids
    "q_stream_asof" ->
      """SELECT event_id, user_id, ts, clk_event_id FROM (
           SELECT p.event_id, p.user_id, p.ts,
                  b.event_id AS clk_event_id,
                  row_number() OVER (PARTITION BY p.event_id
                    ORDER BY b.ts DESC, b.event_id DESC) AS rn
           FROM (SELECT * FROM events WHERE event_type = 'purchase') p
           LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
             ON b.user_id = p.user_id AND b.ts <= p.ts) t
         WHERE rn = 1""",

    // the streamed windows, finalized by the watermark, must equal the
    // batch grouping exactly
    "q_stream_tumbling" ->
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
         count(*) AS n, sum(value) AS sum_value
         FROM events GROUP BY 1, 2""",

    // the streamed production join: latest listing version wins
    // (V2 key for orderkey % 64 = 0), agent v2 created_ts must have
    // propagated to the joined rows (custkey % 4 = 0)
    "q_stream_crmls" ->
      """SELECT 'L' || CAST(o_orderkey AS VARCHAR) AS l_uc_pk,
                'LK' || CAST(o_orderkey AS VARCHAR) ||
                  CASE WHEN o_orderkey % 64 = 0 THEN 'V2' ELSE '' END
                  AS l_listing_key,
                CAST(o_custkey AS VARCHAR) AS aa_uc_pk,
                CAST(CASE WHEN o_custkey % 4 = 0 THEN 2 ELSE 1 END
                  AS BIGINT) AS aa_uc_created_ts
         FROM orders WHERE o_orderkey % 32 = 0""",

    // identical converged table by contract — the overcap twin shares
    // the oracle verbatim (a drift between the fused and distributed
    // tiers turns exactly one row red)
    "q_stream_crmls_overcap" ->
      """SELECT 'L' || CAST(o_orderkey AS VARCHAR) AS l_uc_pk,
                'LK' || CAST(o_orderkey AS VARCHAR) ||
                  CASE WHEN o_orderkey % 64 = 0 THEN 'V2' ELSE '' END
                  AS l_listing_key,
                CAST(o_custkey AS VARCHAR) AS aa_uc_pk,
                CAST(CASE WHEN o_custkey % 4 = 0 THEN 2 ELSE 1 END
                  AS BIGINT) AS aa_uc_created_ts
         FROM orders WHERE o_orderkey % 32 = 0""",

    // the churn replay's final table is latest-version-join arithmetic:
    // listings %32==16 (v2 where %64==16), agents ts 20 where %4==1
    // else 10, plus the hot key whose SIXTH version survives with its
    // rotated agent ref (1 + (hot o_custkey + 6) mod max custkey)
    "q_stream_crmls_churn" ->
      """WITH hot AS (
           SELECT (SELECT o_custkey FROM orders WHERE o_orderkey =
                     (SELECT min(o_orderkey) FROM orders
                      WHERE o_orderkey % 32 = 16)) AS hc,
                  (SELECT max(c_custkey) FROM customer) AS mx),
         l AS (
           SELECT 'L' || CAST(o_orderkey AS VARCHAR) AS l_uc_pk,
                  'LK' || CAST(o_orderkey AS VARCHAR) ||
                    CASE WHEN o_orderkey % 64 = 16 THEN 'V2' ELSE '' END
                    AS l_listing_key,
                  CAST(o_custkey AS VARCHAR) AS ref
           FROM orders WHERE o_orderkey % 32 = 16
           UNION ALL
           SELECT 'LHOT', 'LKHOT6', CAST(1 + (hc + 6) % mx AS VARCHAR)
           FROM hot)
         SELECT l.l_uc_pk, l.l_listing_key,
                CAST(c.c_custkey AS VARCHAR) AS aa_uc_pk,
                CAST(CASE WHEN c.c_custkey % 4 = 1 THEN 20 ELSE 10 END
                  AS BIGINT) AS aa_uc_created_ts
         FROM l LEFT JOIN customer c
           ON CAST(c.c_custkey AS VARCHAR) = l.ref""",

    "q_interval_join" ->
      """SELECT p.event_id, p.user_id, p.ts,
         count(b.user_id) AS n_clicks,
         sum(b.value) AS sum_click_value
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
           ON b.user_id = p.user_id
          AND b.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
         GROUP BY p.event_id, p.user_id, p.ts""",

    "q_json_extract" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
         coalesce(json_extract_string(props, '$.missing'), '') AS missing_val
         FROM events""",

    "q_json_extract_variant" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
         coalesce(json_extract_string(props, '$.missing'), '') AS missing_val
         FROM events""",

    // storage round-trip must not change a single value: same oracle
    "q_variant_roundtrip" ->
      """SELECT event_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
         coalesce(json_extract_string(props, '$.missing'), '') AS missing_val
         FROM events""",

    "q_window_running" ->
      """SELECT event_id, user_id, ts,
         sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_sum
         FROM events""",

    "q_window_rank" ->
      """SELECT event_id, user_id, value,
         rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
         lag(value, 1) OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS prev_value
         FROM events""",

    "q_tumbling" ->
      """SELECT date_trunc('hour', ts) AS w_start, event_type,
         count(*) AS n, sum(value) AS sum_value
         FROM events GROUP BY 1, 2""",

    "q_sliding" ->
      """WITH x AS (
           SELECT date_trunc('hour', ts)
                  + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE
                         ELSE INTERVAL 0 MINUTE END AS s30,
                  event_type, value
           FROM events),
         w AS (
           SELECT unnest([s30, s30 - INTERVAL 30 MINUTE]) AS w_start,
                  event_type, value
           FROM x)
         SELECT w_start, event_type, count(*) AS n, sum(value) AS sum_value
         FROM w GROUP BY 1, 2""",

    // replay of the late-drop rule: per-arrival-chunk running-max
    // watermark; a row survives iff its window end exceeds the
    // watermark carried into its batch. The watermark bookkeeping
    // floors event times to MILLISECONDS (Spark's EventTimeStats
    // tracks epoch millis), so mts is ms-truncated before the delay
    // subtraction — at microsecond precision the oracle's watermark
    // could sit up to ~1ms above Spark's and drop a row Spark keeps.
    "q_stream_latedrop" ->
      """WITH e AS (
           SELECT ts, event_type, value, event_id % 4 AS chunk
           FROM events),
         mx AS (SELECT chunk, max(date_trunc('milliseconds', ts)) AS mts
                FROM e GROUP BY chunk),
         wm AS (
           SELECT c.chunk,
                  max(m.mts) - INTERVAL 30 MINUTE AS wm_prev
           FROM (SELECT DISTINCT chunk FROM e) c
           JOIN mx m ON m.chunk < c.chunk
           GROUP BY c.chunk),
         kept AS (
           SELECT e.ts, e.event_type, e.value
           FROM e LEFT JOIN wm ON wm.chunk = e.chunk
           WHERE wm.wm_prev IS NULL
              OR date_trunc('hour', e.ts) + INTERVAL 1 HOUR > wm.wm_prev)
         SELECT date_trunc('hour', ts) AS w_start, event_type,
                count(*) AS n, sum(value) AS sum_value
         FROM kept GROUP BY 1, 2""",

    // the streamed symmetric-hash join must produce exactly the batch
    // interval pairs
    "q_stream_interval" ->
      """SELECT p.event_id AS event_id, p.user_id AS user_id,
                b.event_id AS clk_event_id
         FROM (SELECT * FROM events WHERE event_type = 'purchase') p
         JOIN (SELECT * FROM events WHERE event_type = 'click') b
           ON b.user_id = p.user_id
          AND b.ts >= p.ts - INTERVAL 1 HOUR AND b.ts <= p.ts""",

    // the streamed sessions, merged across micro-batches and finalized
    // by the watermark, must equal the batch islands exactly
    "q_stream_session" ->
      """WITH o AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         s AS (
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM o)
         SELECT min(ts) AS sess_start, user_id, count(*) AS n,
                sum(value) AS sum_value
         FROM s GROUP BY user_id, sess""",

    "q_session" ->
      """WITH o AS (
           SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS brk
           FROM events),
         s AS (
           SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
           FROM o)
         SELECT min(ts) AS sess_start, user_id, count(*) AS n,
                sum(value) AS sum_value
         FROM s GROUP BY user_id, sess""",

    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty, avg(l_discount) AS avg_disc,
         count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",

    "q_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())""",

    "q_window_lag" ->
      """SELECT event_id, user_id,
         round(value - lag(value, 1) OVER (PARTITION BY user_id
           ORDER BY ts, event_id), 6) AS delta_value
         FROM events""",

    "q_dataset_card" ->
      raw"""WITH s AS (
           SELECT doc_id, lang, source, n_chars,
             len(string_split_regex(trim(text), '\s+')) AS nt,
             md5(text) AS h,
             (CASE WHEN len(string_split_regex(trim(text), '\s+')) < 10
                   THEN CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE) / 10.0
                   WHEN len(string_split_regex(trim(text), '\s+')) > 100000
                   THEN 100000.0 / CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
                   ELSE 1.0 END) * 0.4
             + (1.0 - least(
                 ((length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
                   / greatest(length(text), 1)) * 5, 1.0)) * 0.3
             + least((len(list_filter(string_split_regex(trim(text), '\s+'),
                 t -> t = 'the' OR t = 'a'))
                 / greatest(len(string_split_regex(trim(text), '\s+')), 1)) * 10,
                 1.0) * 0.3 AS q
           FROM documents)
         SELECT count(*) AS n_docs,
           CAST(sum(nt) AS BIGINT) AS n_tokens,
           count(DISTINCT lang) AS n_langs,
           count(DISTINCT source) AS n_sources,
           count(*) - count(DISTINCT h) AS n_dup_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(CASE WHEN q >= 0.5 THEN 1 ELSE 0 END), 6)
             AS quality_keep_rate
         FROM s""",

    "q_heavy_hitters" ->
      raw"""WITH tok AS (
           SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents),
         c AS (SELECT lang, term, count(*) AS est FROM tok GROUP BY 1, 2)
         SELECT lang, term, est, rank FROM (
           SELECT lang, term, est,
             row_number() OVER (PARTITION BY lang
               ORDER BY est DESC, term) AS rank
           FROM c) t
         WHERE rank <= 10""",

    "q_pivot" ->
      """SELECT l_returnflag,
         sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS F,
         sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS O
         FROM lineitem GROUP BY l_returnflag""",

    "q_skewjoin" ->
      """SELECT event_id, user_id, event_type, c_name
         FROM events JOIN customer ON user_id = c_custkey""",

    "q_redact" ->
      raw"""SELECT doc_id,
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '[0-9]', '#', 'g') AS redacted
         FROM documents""",

    "q_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
         round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
         FROM lineitem GROUP BY l_returnflag""",

    "q_winsorize" ->
      """WITH thr AS (
           SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
           FROM lineitem GROUP BY l_returnflag)
         SELECT l.l_returnflag, count(*) AS n,
           round(avg(l_extendedprice), 4) AS mean_raw,
           round(avg(least(greatest(l_extendedprice, lo), hi)), 4)
             AS mean_winsorized
         FROM lineitem l JOIN thr USING (l_returnflag)
         GROUP BY l.l_returnflag""",

    "q_stats_agg" ->
      """SELECT l_returnflag,
         round(stddev_samp(l_quantity), 4) AS sd_qty,
         round(var_samp(l_discount), 6) AS var_disc,
         round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
         FROM lineitem GROUP BY l_returnflag""",

    "q_distinct_agg" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps
         FROM lineitem GROUP BY l_returnflag""",

    // banded sketch contract: the oracle pins the exact values and
    // expects the within-5%-of-exact flags to be 1 (see the catalog
    // comment on q_approx_percentile)
    "q_approx_percentile" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
         round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
         1 AS p50_sketch_ok, 1 AS p90_sketch_ok
         FROM lineitem GROUP BY l_returnflag""",

    "q_approx_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_partkey) AS n_parts,
         1 AS sketch_ok
         FROM lineitem GROUP BY l_returnflag""",

    "q_cosine_dupes" -> OracleGen.cosineDupesLshSql(
      filter = "WHERE vec_id < 300", threshold = 0.35,
      bands = 16, bitsPerBand = 8, dim = 64),

    "q_srp_ann" -> OracleGen.srpAnnSql(
      probeMax = 64, k = 5, bands = 4, bitsPerBand = 8, dim = 64),

    "q_ivf_ann" -> OracleGen.ivfAnnSql(
      probeMax = 64, k = 5, nCells = 16, nProbe = 4, dim = 64),

    "q_pq_ann" -> OracleGen.pqAnnSql(
      m = 4, kSub = 16, iters = 1, dim = 64, probeMax = 8, topK = 5),

    "q_ann_recall" -> OracleGen.annRecallSql(
      probeMax = 64, k = 5, nCells = 16, nProbe = 4, dim = 64),

    // graph-ANN at exhaustive beam (ef = nNodes): routing over the
    // connected small-world graph IS the exact argmax over the node
    // set, so the oracle is the IVF replay with the node set as the
    // centroid set (the beam-limited serving shape is spec territory:
    // GraphAnnSpec recall + equivalence tests)
    "q_graph_ann" -> OracleGen.ivfAnnSql(
      probeMax = 64, k = 5, nCells = 32, nProbe = 3, dim = 64),

    // the distributed build's full edge list, reconstructed in SQL
    "q_graph_ann_dist" -> OracleGen.graphAnnDistSql(
      nCells = 8, m = 4, mCells = 2, dim = 64),

    // exhaustive-beam serving over the distributed index == the IVF
    // candidate scan over the same cells (see the Spark-side comment)
    "q_gann_search" -> OracleGen.ivfAnnSql(
      probeMax = 64, k = 5, nCells = 16, nProbe = 4, dim = 64),

    // the incremental-append edges, reconstructed in SQL
    "q_graph_ann_append" -> OracleGen.graphAnnAppendSql(
      splitId = 400L, nCells = 8, m = 4, dim = 64),

    // the rounded power-iteration chain, reconstructed in SQL
    "q_pca_project" -> OracleGen.pcaProjectSql(dim = 64, iters = 6),

    // power iteration + rounded Hotelling deflation, reconstructed
    "q_pca_top2" -> OracleGen.pcaTopKSql(dim = 64, k = 2, iters = 4),

    // trace + dominant eigenvalue + isotropy ratio, reconstructed
    "q_embedding_diag" -> OracleGen.pcaDiagSql(dim = 64, iters = 6),

    "q_corr_matrix" ->
      """SELECT round(corr(l_quantity, l_extendedprice), 6) AS corr_quantity_extendedprice,
         round(corr(l_quantity, l_discount), 6) AS corr_quantity_discount,
         round(corr(l_quantity, l_tax), 6) AS corr_quantity_tax,
         round(corr(l_extendedprice, l_discount), 6) AS corr_extendedprice_discount,
         round(corr(l_extendedprice, l_tax), 6) AS corr_extendedprice_tax,
         round(corr(l_discount, l_tax), 6) AS corr_discount_tax
         FROM lineitem""",

    // the salted fallback must produce EXACTLY the broadcast tier's
    // rows — same oracle SQL, independently recomputed by DuckDB
    "q_ivf_ann_salted" -> OracleGen.ivfAnnSql(
      probeMax = 64, k = 5, nCells = 16, nProbe = 4, dim = 64),

    "q_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",

    "q_intersect" ->
      """SELECT DISTINCT c_nationkey AS nationkey FROM customer
         INTERSECT
         SELECT DISTINCT s_nationkey AS nationkey FROM supplier""",

    "q_except" ->
      """SELECT DISTINCT c_custkey AS k FROM customer
         EXCEPT
         SELECT DISTINCT user_id AS k FROM events""",

    "q_union" ->
      """SELECT nationkey, count(*) AS n FROM (
           SELECT c_nationkey AS nationkey FROM customer
           UNION ALL
           SELECT s_nationkey AS nationkey FROM supplier) u
         GROUP BY nationkey""",

    "q_semijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",

    "q_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM events WHERE user_id = c_custkey)""",

    "q_scalar" ->
      """SELECT event_id,
         upper(event_type) AS etype_u,
         base64(encode(event_type)) AS etype_b64,
         CAST(floor(value) AS BIGINT) AS value_floor,
         CAST(user_id AS VARCHAR) || '#' || event_type AS ue_key
         FROM events""",

    "q_count_join" ->
      """SELECT count(*) AS n FROM orders
         LEFT JOIN customer ON o_custkey = c_custkey""",

    "q_groupconcat" ->
      """SELECT user_id,
         string_agg(event_type, ',' ORDER BY ts, event_id) AS type_seq
         FROM events GROUP BY user_id""",

    "q_wordcount" ->
      """SELECT tok AS word, count(*) AS n FROM (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM documents) t
         GROUP BY tok""",

    "q_chunks" ->
      """WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents)
         SELECT doc_id, i AS chunk_idx,
           array_to_string(toks[(i*50+1):(i*50+50)], ' ') AS chunk
         FROM t, unnest(range(CAST(ceil(len(toks)/50.0) AS BIGINT))) AS u(i)""",

    "q_neardup_drop" ->
      raw"""WITH d AS (SELECT * FROM documents WHERE doc_id < 40),
         tok AS (
           SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM d),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         common AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         losers AS (
           SELECT DISTINCT doc_b FROM common
           JOIN sizes sa ON sa.doc_id = doc_a
           JOIN sizes sb ON sb.doc_id = doc_b
           WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) > 0.5)
         SELECT doc_id, lang, n_chars FROM d
         WHERE doc_id NOT IN (SELECT doc_b FROM losers)""",

    "q_dup_clusters" ->
      raw"""WITH d AS (SELECT * FROM documents WHERE doc_id < 40),
         tok AS (
           SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM d),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         confirmed AS (
           SELECT id_a, id_b FROM pairs
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) > 0.5),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM confirmed
           UNION SELECT id_b, id_a FROM confirmed),
         reach AS (
           WITH RECURSIVE r(id, root) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id)
           SELECT * FROM r)
         SELECT id, min(root) AS label FROM reach GROUP BY id""",

    // identical oracle to q_dup_clusters: the tiers must agree exactly
    "q_dup_clusters_dist" ->
      raw"""WITH d AS (SELECT * FROM documents WHERE doc_id < 40),
         tok AS (
           SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM d),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         confirmed AS (
           SELECT id_a, id_b FROM pairs
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) > 0.5),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM confirmed
           UNION SELECT id_b, id_a FROM confirmed),
         reach AS (
           WITH RECURSIVE r(id, root) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id)
           SELECT * FROM r)
         SELECT id, min(root) AS label FROM reach GROUP BY id""",

    // same clustering CTE chain as q_dup_clusters, then the canonical
    // pick: best n_chars per cluster label, ties to the smaller id;
    // unclustered docs label themselves
    "q_canonical_docs" ->
      raw"""WITH d AS (SELECT * FROM documents WHERE doc_id < 40),
         tok AS (
           SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM d),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         confirmed AS (
           SELECT id_a, id_b FROM pairs
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) > 0.5),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM confirmed
           UNION SELECT id_b, id_a FROM confirmed),
         reach AS (
           WITH RECURSIVE r(id, root) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id)
           SELECT * FROM r),
         labels AS (SELECT id, min(root) AS label FROM reach GROUP BY id),
         scored AS (
           SELECT d.doc_id, coalesce(l.label, d.doc_id) AS lbl, d.n_chars
           FROM d LEFT JOIN labels l ON l.id = d.doc_id)
         SELECT doc_id,
           first_value(doc_id) OVER (PARTITION BY lbl
             ORDER BY n_chars DESC, doc_id) AS canonical_id,
           doc_id = first_value(doc_id) OVER (PARTITION BY lbl
             ORDER BY n_chars DESC, doc_id) AS keep
         FROM scored""",

    "q_random_projection" -> OracleGen.randomProjectionSql(8, 64),

    "q_minhash_pairs" -> OracleFixtures.minhashPairsSql,

    "q_lsh_recall" -> OracleGen.lshRecallSql(OracleFixtures.minhashPairsSql, 0.5),

    "q_simhash_pairs" ->
      OracleGen.simhashPairsSql(OracleFixtures.simhashSql, 3, 4),

    "q_mmr" -> OracleGen.mmrSql(0L, 30, 5, 0.7, 64),

    "q_simhash" -> OracleFixtures.simhashSql,

    "q_bpe_tokens" ->
      raw"""SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
         len(regexp_extract_all(text, '${TF.bpeishPattern}')) AS n_bpe_tokens
         FROM documents""",

    "q_oov_rate" ->
      raw"""WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents WHERE text IS NOT NULL),
         vocab AS (
           SELECT term FROM (
             SELECT term, count(DISTINCT doc_id) AS df
             FROM tok GROUP BY term
             ORDER BY df DESC, term LIMIT 30) v)
         SELECT doc_id, count(*) AS n_tokens,
           count(*) FILTER (WHERE vocab.term IS NULL) AS n_oov,
           round(CAST(count(*) FILTER (WHERE vocab.term IS NULL) AS DOUBLE)
             / count(*), 6) AS oov_rate
         FROM tok LEFT JOIN vocab ON tok.term = vocab.term
         GROUP BY doc_id""",

    "q_length_buckets" ->
      raw"""WITH s AS (
           SELECT len(string_split_regex(trim(text), '\s+')) AS nt
           FROM documents)
         SELECT CAST(nt // 32 AS BIGINT) AS bucket, count(*) AS n_docs,
           CAST(max(nt) AS BIGINT) AS max_tokens,
           CAST(sum(nt) AS BIGINT) AS sum_tokens,
           round(1.0 - CAST(sum(nt) AS DOUBLE) / (max(nt) * count(*)), 6)
             AS pad_waste
         FROM s GROUP BY 1""",

    "q_ngrams" ->
      raw"""WITH t AS (SELECT string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT array_to_string(toks[i:(i+2)], ' ') AS ngram
           FROM t, unnest(range(1, len(toks) - 1)) AS u(i)
           WHERE len(toks) >= 3)
         SELECT ngram, count(*) AS n FROM g GROUP BY ngram
         HAVING count(*) > 1""",

    // 256-bucket hex thresholds: floor(256*0.8)=204='cc',
    // floor(256*0.9)=230='e6' — must mirror TrainingOps.assignSplit
    "q_split" ->
      """SELECT doc_id,
         CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                THEN 'train'
              WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val'
              ELSE 'test' END AS split
         FROM documents""",

    // floor(65536*0.25)=16384='4000' — mirrors TrainingOps.hashSample
    "q_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000'""",

    // hex thresholds: floor(65536*{0.5,0.25,0.75}) = '8000'/'4000'/'c000'
    // — must mirror TrainingOps.stratifiedHashSample
    "q_weighted_sample" ->
      """WITH s AS (
           SELECT doc_id, n_chars,
             round(ln((CAST('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 12)
                       AS BIGINT) + 1) / 281474976710656.0)
                   / n_chars, 6) AS es_key
           FROM documents WHERE n_chars > 0)
         SELECT doc_id, n_chars, es_key FROM s
         ORDER BY es_key DESC, doc_id LIMIT 50""",

    "q_stratified" ->
      """SELECT doc_id, lang FROM documents
         WHERE CASE
           WHEN lang = 'en'
             THEN substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
           WHEN lang = 'es'
             THEN substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
           ELSE substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 4) < 'c000'
         END""",

    "q_repetition" ->
      raw"""WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (SELECT doc_id,
             CASE WHEN len(toks) >= 2 THEN
               [array_to_string(toks[i:(i+1)], ' ')
                FOR i IN range(1, len(toks))]
             ELSE [] END AS g2,
             CASE WHEN len(toks) >= 3 THEN
               [array_to_string(toks[i:(i+2)], ' ')
                FOR i IN range(1, len(toks) - 1)]
             ELSE [] END AS g3
           FROM t)
         SELECT doc_id,
           round(CASE WHEN len(g2) > 0
             THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2)
             ELSE 0.0 END, 6) AS rep2,
           round(CASE WHEN len(g3) > 0
             THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3)
             ELSE 0.0 END, 6) AS rep3
         FROM g""",

    "q_bigram_lm" ->
      raw"""WITH tok AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         bg AS (
           SELECT doc_id,
             unnest(list_transform(range(1, len(toks)),
               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
           FROM tok),
         m AS (SELECT bigram, count(*) AS n FROM bg GROUP BY 1),
         ctx AS (
           SELECT string_split(bigram, ' ')[1] AS w1, sum(n) AS ctx_n
           FROM m GROUP BY 1),
         lp AS (
           SELECT bigram, ln(CAST(n AS DOUBLE) / ctx_n) AS logp
           FROM m JOIN ctx ON string_split(m.bigram, ' ')[1] = ctx.w1)
         SELECT doc_id, count(*) AS n_bigrams,
           round(avg(logp), 6) AS logprob
         FROM bg JOIN lp USING (bigram)
         GROUP BY doc_id""",

    "q_gopher_rules" ->
      raw"""WITH s AS (
           SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         c AS (
           SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS DOUBLE)
               / greatest(len(toks), 1) AS mean_word_len,
             ((length(text) - length(replace(text, '#', '')))
               + (length(text) - length(replace(text, '...', ''))) / 3)
               / CAST(greatest(len(toks), 1) AS DOUBLE) AS symbol_ratio,
             CAST(len(list_filter(toks,
                 t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
               / greatest(len(toks), 1) AS alpha_frac,
             CAST((CASE WHEN list_contains(toks, 'a') THEN 1 ELSE 0 END)
               + (CASE WHEN list_contains(toks, 'the') THEN 1 ELSE 0 END)
               AS BIGINT) AS stop_hits
           FROM s)
         SELECT doc_id, n_words,
           round(c.mean_word_len, 6) AS mean_word_len,
           round(c.symbol_ratio, 6) AS symbol_ratio,
           round(c.alpha_frac, 6) AS alpha_frac,
           stop_hits,
           CAST(CASE WHEN c.n_words BETWEEN 10 AND 5000
                      AND c.mean_word_len BETWEEN 3.0 AND 10.0
                      AND c.symbol_ratio <= 0.1
                      AND c.alpha_frac >= 0.8
                      AND c.stop_hits >= 2
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
         FROM c""",

    "q_lm_quality" ->
      raw"""WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents),
         m AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
         t AS (SELECT sum(n) AS total FROM m),
         lp AS (SELECT term, ln(CAST(n AS DOUBLE) / total) AS logp
                FROM m CROSS JOIN t)
         SELECT doc_id, count(*) AS n_tokens,
           round(avg(logp), 6) AS logprob
         FROM tok JOIN lp USING (term)
         GROUP BY doc_id""",

    "q_shuffle" ->
      """SELECT doc_id,
         md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
         FROM documents""",

    "q_tfidf" ->
      raw"""WITH d AS (SELECT * FROM documents WHERE doc_id < 40),
         tok AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM d),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n FROM d)
         SELECT tf.doc_id, tf.term, tf.tf, df.df,
           round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
         FROM tf JOIN df USING (term) CROSS JOIN n""",

    "q_corpus_diff" ->
      """WITH v1 AS (
           SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id < 450),
         v2 AS (
           SELECT doc_id,
             md5(CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END) AS h
           FROM documents WHERE doc_id >= 50)
         SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
           CASE WHEN v1.h IS NULL THEN 'added'
                WHEN v2.h IS NULL THEN 'removed'
                WHEN v1.h = v2.h THEN 'unchanged'
                ELSE 'changed' END AS status
         FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""",

    // mirrored constants: weights {src0: 2.5, src1: 0.25, default 1.0}
    // -> floor CASE (2/0/1) + frac thresholds ('8000'/'4000'/'0000' =
    // floor(frac * 65536) in hex), seed "mix" — same quantization as
    // the operator's keepFraction
    "q_source_mix" ->
      raw"""WITH w AS (
           SELECT doc_id, source,
             (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0 ELSE 1 END
              + CASE WHEN substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) <
                       (CASE source WHEN 'src0' THEN '8000'
                             WHEN 'src1' THEN '4000' ELSE '0000' END)
                     THEN 1 ELSE 0 END) AS copies
           FROM documents)
         SELECT doc_id, source, CAST(u.e AS BIGINT) AS epoch
         FROM w, unnest(range(copies)) AS u(e)""",

    "q_contamination" -> ContaminationOracleSql,

    // identical semantics by construction (Bloom pre-filter: no false
    // negatives, false positives die in the exact join) -> same oracle
    "q_contamination_bloom" -> ContaminationOracleSql,

    // the arrival-time probe flips the audit direction: per TRAIN doc,
    // distinct grams shared with the non-train gram set (no df cap —
    // arrival time has no global train dfs to cap by)
    "q_contamination_stream" ->
      raw"""WITH s AS (
           SELECT doc_id,
             CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'
                    THEN 'train'
                  WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'val'
                  ELSE 'test' END AS split,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         g AS (
           SELECT doc_id, split, array_to_string(toks[i:(i+2)], ' ') AS ngram
           FROM s, unnest(range(1, len(toks) - 1)) AS u(i)
           WHERE len(toks) >= 3),
         tg AS (SELECT DISTINCT doc_id, ngram FROM g WHERE split = 'train'),
         eg AS (SELECT DISTINCT ngram FROM g WHERE split <> 'train')
         SELECT tg.doc_id,
           count(DISTINCT tg.ngram) AS n_contaminated
         FROM tg JOIN eg USING (ngram)
         GROUP BY tg.doc_id""",

    "q_pack" ->
      raw"""WITH d AS (SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
             md5('pack:' || CAST(doc_id AS VARCHAR)) AS hk
           FROM documents),
         c AS (SELECT doc_id, substr(hk, 1, 1) AS pack_shard, n_tok,
             CAST(sum(n_tok) OVER (PARTITION BY substr(hk, 1, 1)
               ORDER BY hk, doc_id) AS BIGINT) AS cum
           FROM d)
         SELECT doc_id, pack_shard,
           (cum - n_tok) // 512 AS pack_bin,
           (cum - n_tok) % 512 AS bin_offset
         FROM c""",

    // see the Spark-side comment: banded FFD contract — shard volumes
    // from the input, invariant flags as literals the hash pins
    "q_pack_ffd" ->
      raw"""WITH d AS (SELECT doc_id,
             LEAST(CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT),
                   512) AS placed,
             substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 1)
               AS pack_shard
           FROM documents)
         SELECT pack_shard, count(*) AS n_docs,
           CAST(sum(placed) AS BIGINT) AS n_tokens,
           CAST(1 AS INTEGER) AS bins_ok,
           CAST(0 AS BIGINT) AS n_over_budget
         FROM d GROUP BY 1""",

    "q_topterms" ->
      raw"""WITH d AS (SELECT * FROM documents WHERE doc_id < 40),
         tok AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM d),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n FROM d),
         w AS (
           SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS score
           FROM tf JOIN df USING (term) CROSS JOIN n)
         SELECT doc_id, term, rank, score FROM (
           SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY score DESC, term) AS rank
           FROM w) t
         WHERE rank <= 3""",

    "q_dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS doc_id,
         count(*) AS n_copies
         FROM documents GROUP BY md5(text)""",

    "q_chunk_overlap" ->
      raw"""WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS toks
           FROM documents),
         n AS (SELECT doc_id, toks,
             1 + (greatest(len(toks) - 50, 0) + 29) // 30 AS nw
           FROM t)
         SELECT doc_id, d AS chunk_idx,
           array_to_string(toks[(d*30+1):(d*30+50)], ' ') AS chunk
         FROM n, unnest(range(0, nw)) AS u(d)""",

    "q_zipf" ->
      raw"""WITH cnt AS (
           SELECT term, count(*) AS freq
           FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
                 FROM documents)
           GROUP BY term),
         top AS (SELECT term, freq FROM cnt
                 ORDER BY freq DESC, term LIMIT 100),
         ranked AS (
           SELECT freq,
             row_number() OVER (ORDER BY freq DESC, term) AS rank
           FROM top)
         SELECT count(*) AS n_terms,
           round(regr_slope(ln(freq), ln(rank)), 6) AS zipf_slope
         FROM ranked""",

    "q_dup_mass_by_source" ->
      """WITH h AS (
           SELECT source, count(*) OVER (PARTITION BY md5(text)) AS df
           FROM documents WHERE text IS NOT NULL)
         SELECT source, count(*) AS n_docs,
           CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           round(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS dup_frac
         FROM h GROUP BY source""",

    "q_doc_novelty" ->
      raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
           FROM documents WHERE text IS NOT NULL),
         sh AS (
           SELECT DISTINCT doc_id,
                  ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS g
           FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)),
         e AS (SELECT doc_id, count(*) OVER (PARTITION BY g) AS df FROM sh)
         SELECT doc_id, count(*) AS n_grams,
           CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           round(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
         FROM e GROUP BY doc_id""",

    "q_source_kl" ->
      raw"""WITH tok AS (
           SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents WHERE text IS NOT NULL),
         c AS (SELECT source, term, count(*) AS n FROM tok GROUP BY 1, 2),
         e AS (
           SELECT source, term, n,
             sum(n) OVER (PARTITION BY term) AS n_term,
             sum(n) OVER (PARTITION BY source) AS n_source
           FROM c),
         t AS (SELECT sum(n) AS n_total FROM c)
         SELECT source, CAST(max(n_source) AS BIGINT) AS n_tokens,
           round(sum((CAST(n AS DOUBLE) / n_source)
             * ln((CAST(n AS DOUBLE) / n_source)
                   / (CAST(n_term AS DOUBLE) / n_total))), 6) AS kl
         FROM e, t GROUP BY source""",

    "q_lexical_diversity" ->
      raw"""WITH cnt AS (
           SELECT doc_id, c, count(*) AS n
           FROM (SELECT doc_id, unnest(string_split(text, '')) AS c
                 FROM documents WHERE text IS NOT NULL)
           GROUP BY 1, 2),
         tot AS (SELECT doc_id, sum(n) AS nt FROM cnt GROUP BY 1),
         ent AS (
           SELECT cnt.doc_id,
             round(-sum((CAST(n AS DOUBLE) / nt) * log2(CAST(n AS DOUBLE) / nt)), 6)
               AS char_entropy
           FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id)
         SELECT d.doc_id,
           round(CAST(len(list_distinct(string_split_regex(trim(d.text), '\s+'))) AS DOUBLE)
             / greatest(len(string_split_regex(trim(d.text), '\s+')), 1), 6) AS ttr,
           ent.char_entropy
         FROM documents d JOIN ent ON ent.doc_id = d.doc_id
         WHERE d.text IS NOT NULL""",

    "q_text_stats" ->
      """SELECT doc_id,
         len(string_split_regex(trim(text), '\s+')) AS n_tokens,
         len(list_distinct(string_split_regex(trim(text), '\s+'))) AS n_types,
         round(CAST(list_sum(list_transform(string_split_regex(trim(text), '\s+'), t -> length(t))) AS DOUBLE)
           / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6) AS mean_tok_len,
         round(len(list_filter(string_split_regex(trim(text), '\s+'), t -> t = 'the' OR t = 'a'))
           / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6) AS stop_ratio
         FROM documents""",

    "q_quality" ->
      """WITH s AS (
           SELECT doc_id, text,
             len(string_split_regex(trim(text), '\s+')) AS n,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 t -> t = 'the' OR t = 'a'))
               / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS stop_ratio,
             (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
               / greatest(length(text), 1) AS punct_ratio
           FROM documents)
         SELECT doc_id,
           round(
             (CASE WHEN n < 10 THEN CAST(n AS DOUBLE) / 10.0
                   WHEN n > 100000 THEN 100000.0 / CAST(n AS DOUBLE)
                   ELSE 1.0 END) * 0.4
             + (1.0 - least(punct_ratio * 5, 1.0)) * 0.3
             + least(stop_ratio * 10, 1.0) * 0.3, 6) AS quality
         FROM s""",

    "q_fingerprint" ->
      """SELECT doc_id,
         md5(array_to_string(list_sort(list_distinct(
           string_split_regex(trim(text), '\s+'))), ' ')) AS fp
         FROM documents""",

    "q_lang_stats" ->
      """SELECT lang, count(*) AS n, round(avg(n_chars), 4) AS avg_chars
         FROM documents GROUP BY lang""",

    "q_langid" ->
      """WITH s AS (
           SELECT doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 t -> t = 'the' OR t = 'a'))
               / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS s_en,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 t -> t = 'el' OR t = 'la'))
               / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS s_es
           FROM documents)
         SELECT doc_id,
           CASE WHEN greatest(s_en, s_es) <= 0 THEN 'und'
                WHEN s_es >= s_en THEN 'es' ELSE 'en' END AS lang_pred
         FROM s""",

    "q_quantize" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings WHERE vec_id < 200),
         s AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
           FROM e)
         SELECT vec_id, i - 1 AS dim_idx,
           CAST(CASE WHEN scale = 0 THEN 0
                     ELSE greatest(-127, least(127, floor(v[i] / scale + 0.5)))
                END AS BIGINT) AS q,
           round(scale, 6) AS scale
         FROM s, unnest(range(1, len(v) + 1)) AS u(i)""",

    "q_simsearch" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         s AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(p.v) + 1), i -> p.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(p.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x * x)))) AS cosine
           FROM e p JOIN e c ON c.vec_id <> p.vec_id
           WHERE p.vec_id < 64)
         SELECT probe_id, neighbor_id, rank FROM (
           SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY cosine DESC, neighbor_id) AS rank
           FROM s) t
         WHERE rank <= 5""",

    "q_multimodal" ->
      """SELECT doc_id AS media_id, CAST(16 AS BIGINT) AS n_dims,
                CAST(32 AS BIGINT) AS n_audio_dims
         FROM documents WHERE doc_id < 200""",

    "q_frames" ->
      """SELECT doc_id AS media_id, t AS frame_ts_ms,
                CAST(16 AS BIGINT) AS n_dims
         FROM documents, unnest(range(0, n_chars, 500)) AS u(t)
         WHERE doc_id < 100""",

    // the demux tier's fallback must be exactly the q_frames grid
    "q_frames_demux" ->
      """SELECT doc_id AS media_id, t AS frame_ts_ms,
                CAST(16 AS BIGINT) AS n_dims
         FROM documents, unnest(range(0, n_chars, 500)) AS u(t)
         WHERE doc_id < 100""",

    "q_jaccard_pairs" ->
      """WITH tok AS (
           SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM documents WHERE doc_id < 40),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         common AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
         FROM common
         JOIN sizes sa ON sa.doc_id = doc_a
         JOIN sizes sb ON sb.doc_id = doc_b""",

    // quantize (q_quantize's recipe) -> dequantized approx cosine ->
    // top-20 candidates -> exact cosine on the original vectors -> top-5
    "q_quantized_ann" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         q AS (SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
           FROM e),
         dq AS (SELECT vec_id, v,
             list_transform(v, x -> CASE WHEN scale = 0 THEN 0.0
               ELSE greatest(-127, least(127, floor(x / scale + 0.5))) * scale
               END) AS d
           FROM q),
         a AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(p.d) + 1), i -> p.d[i] * c.d[i]))
               / (sqrt(list_sum(list_transform(p.d, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.d, x -> x * x)))) AS approx
           FROM dq p JOIN dq c ON c.vec_id <> p.vec_id
           WHERE p.vec_id < 64),
         cand AS (SELECT probe_id, neighbor_id FROM (
             SELECT probe_id, neighbor_id,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY approx DESC, neighbor_id) AS rn
             FROM a) t WHERE rn <= 20),
         x AS (SELECT cand.probe_id, cand.neighbor_id,
             list_sum(list_transform(range(1, len(p.v) + 1), i -> p.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(p.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x * x)))) AS cosine
           FROM cand
           JOIN e p ON p.vec_id = cand.probe_id
           JOIN e c ON c.vec_id = cand.neighbor_id)
         SELECT probe_id, neighbor_id, rank FROM (
           SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY cosine DESC, neighbor_id) AS rank
           FROM x) t
         WHERE rank <= 5""",

    // duplicated 8-gram positions -> INTERVAL merge (a start at p covers
    // [p, p+7], so starts <= 8 apart share a span) -> maximal spans
    "q_dup_spans" ->
      raw"""WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS arr FROM documents),
         p AS (SELECT doc_id,
             unnest(range(1, greatest(len(arr) - 7, 0) + 1)) AS pos, arr
           FROM t),
         g AS (SELECT doc_id, pos,
             array_to_string(arr[pos:pos+7], ' ') AS gram FROM p),
         d AS (SELECT doc_id, pos FROM (
             SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS c
             FROM g) x
           WHERE c > 1),
         i AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
           FROM d),
         s AS (SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
           FROM i)
         SELECT doc_id, min(pos) AS span_start, max(pos) + 7 AS span_end,
                max(pos) + 8 - min(pos) AS span_tokens
         FROM s GROUP BY doc_id, grp""",

    "q_span_stats" ->
      raw"""WITH t AS (SELECT doc_id,
             string_split_regex(trim(text), '\s+') AS arr FROM documents),
         p AS (SELECT doc_id,
             unnest(range(1, greatest(len(arr) - 7, 0) + 1)) AS pos, arr
           FROM t),
         g AS (SELECT doc_id, pos,
             array_to_string(arr[pos:pos+7], ' ') AS gram FROM p),
         d AS (SELECT doc_id, pos FROM (
             SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS c
             FROM g) x
           WHERE c > 1),
         i AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
           FROM d),
         s2 AS (SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
           FROM i),
         spans AS (
           SELECT doc_id, max(pos) + 8 - min(pos) AS span_tokens
           FROM s2 GROUP BY doc_id, grp),
         agg AS (
           SELECT doc_id, CAST(sum(span_tokens) AS BIGINT) AS dup_tokens,
                  count(*) AS n_spans
           FROM spans GROUP BY doc_id)
         SELECT t.doc_id, CAST(len(t.arr) AS BIGINT) AS n_tokens,
           coalesce(agg.dup_tokens, 0) AS dup_tokens,
           coalesce(agg.n_spans, 0) AS n_spans,
           CASE WHEN len(t.arr) > 0
                THEN coalesce(agg.dup_tokens, 0) / CAST(len(t.arr) AS DOUBLE)
                ELSE 0.0 END AS dup_fraction
         FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id""",

    // removeDuplicatedSpans replay: rank gram occurrences by
    // (doc, pos) — rank > 1 marks a non-canonical repeat — merge the
    // covered intervals, drop the covered token positions, reassemble
    // with single-space joins in position order
    "q_span_removal" ->
      raw"""WITH t AS (SELECT doc_id, text,
             string_split_regex(trim(text), '\s+') AS arr FROM documents),
         p AS (SELECT doc_id,
             unnest(range(1, greatest(len(arr) - 7, 0) + 1)) AS pos, arr
           FROM t),
         g AS (SELECT doc_id, pos,
             array_to_string(arr[pos:pos+7], ' ') AS gram FROM p),
         d AS (SELECT doc_id, pos FROM (
             SELECT doc_id, pos,
               row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
             FROM g) x
           WHERE rn > 1),
         i AS (SELECT doc_id, pos,
             CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 8
                  THEN 1 ELSE 0 END AS brk
           FROM d),
         s2 AS (SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
           FROM i),
         spans AS (SELECT doc_id, min(pos) AS ss, max(pos) + 7 AS ee
           FROM s2 GROUP BY doc_id, grp),
         rem AS (SELECT doc_id, unnest(range(ss, ee + 1)) AS rpos FROM spans),
         tk AS (SELECT doc_id, unnest(arr) AS tok,
             unnest(range(1, len(arr) + 1)) AS pos FROM t),
         kept AS (SELECT tk.doc_id, tk.pos, tk.tok
           FROM tk LEFT JOIN rem
             ON tk.doc_id = rem.doc_id AND tk.pos = rem.rpos
           WHERE rem.rpos IS NULL),
         agg AS (SELECT doc_id,
             string_agg(tok, ' ' ORDER BY pos) AS clean_text,
             count(*) AS kept_tokens
           FROM kept GROUP BY doc_id)
         SELECT t.doc_id,
           CASE WHEN t.text IS NULL THEN NULL
                ELSE coalesce(agg.clean_text, '') END AS clean_text,
           CASE WHEN t.text IS NULL THEN NULL
                ELSE CAST(len(t.arr) AS BIGINT) END AS n_tokens,
           CASE WHEN t.text IS NULL THEN NULL
                ELSE CAST(coalesce(agg.kept_tokens, 0) AS BIGINT)
                END AS kept_tokens
         FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id""",

    "q_scd2" ->
      """SELECT user_id, event_id, event_type, value,
         ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS BIGINT) AS is_current
         FROM events""",

    // replay the same fold in SQL: state as of batches 0..2 = per key
    // the row of the highest batch that touched it, within that batch
    // the max-orderkey row (the key-unique reduction each batch applies)
    "q_changelog_snapshot" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY (o_orderkey % 20) DESC, o_orderkey DESC) AS rn
           FROM orders WHERE (o_orderkey % 20) <= 2)
         WHERE rn = 1""",

    // netted CDC diff: state-as-of-1 vs state-as-of-3 joined per key —
    // keys only in state3 are inserts, value changes are updates with
    // old_ pre-images; value-identical keys (and keys untouched in the
    // window) emit nothing. The engine computes this from the log tail
    // alone; the oracle recomputes both states from scratch — same rows
    "q_changelog_diff" ->
      """WITH s1 AS (
           SELECT o_custkey, o_orderkey, o_totalprice FROM (
             SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY (o_orderkey % 20) DESC, o_orderkey DESC) AS rn
             FROM orders WHERE (o_orderkey % 20) <= 1) WHERE rn = 1),
         s3 AS (
           SELECT o_custkey, o_orderkey, o_totalprice FROM (
             SELECT o_custkey, o_orderkey, o_totalprice,
                    row_number() OVER (PARTITION BY o_custkey
                      ORDER BY (o_orderkey % 20) DESC, o_orderkey DESC) AS rn
             FROM orders WHERE (o_orderkey % 20) <= 3) WHERE rn = 1)
         SELECT COALESCE(s3.o_custkey, s1.o_custkey) AS o_custkey,
                CASE WHEN s1.o_custkey IS NULL THEN 'insert'
                     WHEN s3.o_custkey IS NULL THEN 'delete'
                     ELSE 'update' END AS change,
                s3.o_orderkey AS o_orderkey,
                s3.o_totalprice AS o_totalprice,
                s1.o_orderkey AS old_o_orderkey,
                s1.o_totalprice AS old_o_totalprice
         FROM s3 FULL OUTER JOIN s1 ON s3.o_custkey = s1.o_custkey
         WHERE s1.o_custkey IS NULL OR s3.o_custkey IS NULL
            OR s3.o_orderkey <> s1.o_orderkey
            OR s3.o_totalprice <> s1.o_totalprice""",

    // the checkpoint-anchored fold must land on the SAME as-of answer
    // as the pure replay — one oracle text, two engine read paths
    "q_changelog_ckpt" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY (o_orderkey % 20) DESC, o_orderkey DESC) AS rn
           FROM orders WHERE (o_orderkey % 20) <= 2)
         WHERE rn = 1""",

    // the bucketed layout must not change a single row vs the plain join
    "q_bucketed_join" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice,
                o_orderstatus, o_totalprice
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey""",

    // the z-ordered layout must not change a single row either
    "q_zorder" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
         FROM lineitem""",

    // content identity of the size-targeted layout write (the file
    // sizing itself is measured by SizedWriteSpec)
    "q_sized_write" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem""",

    // temperatureMix replay: per-language counts -> sqrt weights
    // summed in sorted-language order (running window; double addition
    // is order-sensitive) -> rate with the operator's left-associated
    // IEEE chain -> integer 16-bit threshold -> md5 acceptance ->
    // epoch explode. alpha = 0.5 / targetFraction = 1.0 / maxRate = 4.0
    "q_mix_temperature" ->
      raw"""WITH c AS (
             SELECT lang, count(*) AS n FROM documents GROUP BY lang),
           w AS (
             SELECT lang, n,
               sum(sqrt(CAST(n AS DOUBLE))) OVER (ORDER BY lang
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wcum
             FROM c),
           s AS (
             SELECT lang, n, max(wcum) OVER () AS psum,
               sum(n) OVER () AS ntot
             FROM w),
           r AS (
             SELECT lang,
               least(CAST(4.0 AS DOUBLE),
                 CAST(1.0 AS DOUBLE) * CAST(ntot AS DOUBLE)
                   * sqrt(CAST(n AS DOUBLE))
                   / psum / CAST(n AS DOUBLE)) AS rate
             FROM s),
           t AS (
             SELECT lang, CAST(floor(rate) AS INT) AS base,
               CAST(floor((rate - floor(rate)) * 65536) AS INT) AS th
             FROM r),
           x AS (
             SELECT d.doc_id, d.lang,
               t.base + (CASE WHEN
                 substr(md5('tmix:' || CAST(d.doc_id AS VARCHAR)), 1, 4)
                   < printf('%04x', t.th)
                 THEN 1 ELSE 0 END) AS copies
             FROM documents d JOIN t USING (lang))
         SELECT doc_id, lang, CAST(u.e AS BIGINT) AS epoch
         FROM x, unnest(range(copies)) AS u(e)""",

    // assembleTrainingSet replay: the q_quality score (>= 0.5 filter),
    // q_dedup_exact's min-id keeper, q_split's train bucket, and
    // q_pack's sharded cumsum, chained in one SQL pipeline
    "q_pipeline" ->
      raw"""WITH sc AS (
             SELECT doc_id, text,
               len(string_split_regex(trim(text), '\s+')) AS n,
               len(list_filter(string_split_regex(trim(text), '\s+'),
                   t -> t = 'the' OR t = 'a'))
                 / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS stop_ratio,
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
                 / greatest(length(text), 1) AS punct_ratio
             FROM documents),
           q AS (
             SELECT doc_id, text,
               round(
                 (CASE WHEN n < 10 THEN CAST(n AS DOUBLE) / 10.0
                       WHEN n > 100000 THEN 100000.0 / CAST(n AS DOUBLE)
                       ELSE 1.0 END) * 0.4
                 + (1.0 - least(punct_ratio * 5, 1.0)) * 0.3
                 + least(stop_ratio * 10, 1.0) * 0.3, 6) AS quality
             FROM sc),
           f AS (SELECT * FROM q WHERE quality >= 0.5),
           d AS (
             SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
             FROM f),
           k AS (SELECT doc_id, text, quality FROM d WHERE doc_id = keeper),
           tr AS (
             SELECT doc_id, text, quality FROM k
             WHERE substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc'),
           p AS (
             SELECT doc_id, quality,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tok,
               md5('pack:' || CAST(doc_id AS VARCHAR)) AS hk
             FROM tr),
           c AS (
             SELECT doc_id, quality, substr(hk, 1, 1) AS pack_shard, n_tok,
               CAST(sum(n_tok) OVER (PARTITION BY substr(hk, 1, 1)
                 ORDER BY hk, doc_id) AS BIGINT) AS cum
             FROM p)
         SELECT doc_id, quality, pack_shard,
           (cum - n_tok) // 512 AS pack_bin,
           (cum - n_tok) % 512 AS bin_offset
         FROM c""",

    "q_profile" ->
      """SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
           count(*) - count(l_orderkey) AS n_null,
           count(DISTINCT l_orderkey) AS n_distinct,
           CAST(min(l_orderkey) AS VARCHAR) AS min_val,
           CAST(max(l_orderkey) AS VARCHAR) AS max_val
         FROM lineitem
         UNION ALL
         SELECT 'l_linenumber', count(*), count(*) - count(l_linenumber),
           count(DISTINCT l_linenumber),
           CAST(min(l_linenumber) AS VARCHAR),
           CAST(max(l_linenumber) AS VARCHAR)
         FROM lineitem
         UNION ALL
         SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
           count(DISTINCT l_quantity),
           CAST(min(l_quantity) AS VARCHAR),
           CAST(max(l_quantity) AS VARCHAR)
         FROM lineitem
         UNION ALL
         SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR),
           CAST(max(l_returnflag) AS VARCHAR)
         FROM lineitem""",

    "q_profile_approx" ->
      """SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
           count(*) - count(l_orderkey) AS n_null,
           count(DISTINCT l_orderkey) AS n_distinct,
           CAST(min(l_orderkey) AS VARCHAR) AS min_val,
           CAST(max(l_orderkey) AS VARCHAR) AS max_val,
           1 AS ndv_ok
         FROM lineitem
         UNION ALL
         SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           CAST(min(l_returnflag) AS VARCHAR),
           CAST(max(l_returnflag) AS VARCHAR),
           1
         FROM lineitem""",

    "q_profile_sketch" ->
      """WITH s AS (
           SELECT 'l_orderkey' AS col_name, count(*) AS n_rows,
             count(*) - count(l_orderkey) AS n_null,
             count(DISTINCT l_orderkey) AS ndv,
             CAST(min(l_orderkey) AS VARCHAR) AS min_val,
             CAST(max(l_orderkey) AS VARCHAR) AS max_val
           FROM lineitem
           UNION ALL
           SELECT 'l_quantity', count(*), count(*) - count(l_quantity),
             count(DISTINCT l_quantity),
             CAST(min(l_quantity) AS VARCHAR),
             CAST(max(l_quantity) AS VARCHAR)
           FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
             count(DISTINCT l_returnflag),
             CAST(min(l_returnflag) AS VARCHAR),
             CAST(max(l_returnflag) AS VARCHAR)
           FROM lineitem)
         SELECT col_name, n_rows, n_null, min_val, max_val,
           CASE WHEN ndv
                  BETWEEN (CASE col_name
                           WHEN 'l_orderkey' THEN CAST(FLOOR(n_rows * 0.1) AS BIGINT)
                           WHEN 'l_quantity' THEN 10 ELSE 1 END)
                  AND (CASE col_name
                       WHEN 'l_orderkey' THEN CAST(FLOOR(n_rows * 0.5) AS BIGINT)
                       WHEN 'l_quantity' THEN 200 ELSE 10 END)
                THEN 1 ELSE 0 END AS ndv_ok
         FROM s""",

    "q_profile_hist" ->
      """WITH b AS (
           SELECT CAST(min(l_extendedprice) AS DOUBLE) AS lo,
                  CAST(max(l_extendedprice) AS DOUBLE) AS hi
           FROM lineitem)
         SELECT CAST(LEAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - lo)
                  / ((hi - lo) / 16)), 15) AS BIGINT) AS bin,
                count(*) AS n
         FROM lineitem, b
         WHERE l_extendedprice IS NOT NULL
         GROUP BY 1""",

    // q_dup_clusters' recursive-CTE labels + q_split's md5 thresholds,
    // keyed on coalesce(cluster label, doc id)
    "q_split_leakfree" ->
      raw"""WITH d AS (SELECT * FROM documents WHERE doc_id < 40),
         tok AS (
           SELECT DISTINCT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
           FROM d),
         sizes AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         confirmed AS (
           SELECT id_a, id_b FROM pairs
           JOIN sizes sa ON sa.doc_id = id_a
           JOIN sizes sb ON sb.doc_id = id_b
           WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) > 0.5),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM confirmed
           UNION SELECT id_b, id_a FROM confirmed),
         reach AS (
           WITH RECURSIVE r(id, root) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id)
           SELECT * FROM r),
         labels AS (SELECT id, min(root) AS label FROM reach GROUP BY id)
         SELECT doc_id,
           CASE WHEN substr(md5('split:' ||
                  CAST(coalesce(l.label, doc_id) AS VARCHAR)), 1, 2) < 'cc'
                  THEN 'train'
                WHEN substr(md5('split:' ||
                  CAST(coalesce(l.label, doc_id) AS VARCHAR)), 1, 2) < 'e6'
                  THEN 'val'
                ELSE 'test' END AS split
         FROM documents LEFT JOIN labels l ON l.id = doc_id""",

    // dsirWeights replay: md5-bucketed token counts for target
    // (src0-2) vs raw, add-1 smoothed log-ratio per bucket, per-doc
    // sum. Every scored token was counted on one of the two sides, so
    // the join covers all buckets a document can probe
    "q_dsir" ->
      raw"""WITH tok AS (
             SELECT doc_id, source IN ('src0', 'src1', 'src2') AS is_t,
               substr(md5(unnest(string_split_regex(trim(text), '\s+'))), 1, 2) AS b
             FROM documents),
           c AS (
             SELECT b,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_n,
               sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS r_n
             FROM tok GROUP BY b),
           t AS (SELECT sum(t_n) AS tt, sum(r_n) AS rt FROM c),
           lr AS (
             SELECT b,
               ln(CAST(t_n + 1 AS DOUBLE) / (tt + 256)) -
               ln(CAST(r_n + 1 AS DOUBLE) / (rt + 256)) AS lrv
             FROM c CROSS JOIN t)
         SELECT tok.doc_id, count(*) AS n_tokens,
           round(sum(lr.lrv), 6) AS logw
         FROM tok JOIN lr USING (b)
         GROUP BY tok.doc_id""",

    // importanceResample replay: the q_dsir weights, then the
    // deterministic rejection draw — keep iff logw >= shift (saturated)
    // or the md5 4-hex uniform lands under the 1/65536-quantized
    // acceptance threshold floor(exp(logw - shift) * 65536)
    "q_dsir_sample" ->
      raw"""WITH tok AS (
             SELECT doc_id, source IN ('src0', 'src1', 'src2') AS is_t,
               substr(md5(unnest(string_split_regex(trim(text), '\s+'))), 1, 2) AS b
             FROM documents),
           c AS (
             SELECT b,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_n,
               sum(CASE WHEN is_t THEN 0 ELSE 1 END) AS r_n
             FROM tok GROUP BY b),
           t AS (SELECT sum(t_n) AS tt, sum(r_n) AS rt FROM c),
           lr AS (
             SELECT b,
               ln(CAST(t_n + 1 AS DOUBLE) / (tt + 256)) -
               ln(CAST(r_n + 1 AS DOUBLE) / (rt + 256)) AS lrv
             FROM c CROSS JOIN t),
           w AS (
             SELECT tok.doc_id, count(*) AS n_tokens,
               round(sum(lr.lrv), 6) AS logw
             FROM tok JOIN lr USING (b)
             GROUP BY tok.doc_id)
         SELECT doc_id, n_tokens, logw FROM w
         WHERE logw >= -2.0
            OR substr(md5('dsirsamp:' || CAST(doc_id AS VARCHAR)), 1, 4)
               < printf('%04x',
                   CAST(floor(least(1.0, exp(logw - (-2.0))) * 65536) AS INT))""",

    // selectUnderTokenBudget replay: the q_quality score, the naive
    // single-window cumulative token sum over (score desc, id), keep
    // while cum <= budget — the engine's distributed prefix-sum must
    // reproduce this exactly (integer sums are partition-independent)
    "q_token_budget" ->
      raw"""WITH s AS (
           SELECT doc_id, text,
             len(string_split_regex(trim(text), '\s+')) AS n,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                 t -> t = 'the' OR t = 'a'))
               / greatest(len(string_split_regex(trim(text), '\s+')), 1) AS stop_ratio,
             (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')))
               / greatest(length(text), 1) AS punct_ratio
           FROM documents),
         q AS (SELECT doc_id,
           round(
             (CASE WHEN n < 10 THEN CAST(n AS DOUBLE) / 10.0
                   WHEN n > 100000 THEN 100000.0 / CAST(n AS DOUBLE)
                   ELSE 1.0 END) * 0.4
             + (1.0 - least(punct_ratio * 5, 1.0)) * 0.3
             + least(stop_ratio * 10, 1.0) * 0.3, 6) AS score,
           CAST(n AS BIGINT) AS n_tokens
           FROM s),
         c AS (SELECT doc_id, score, n_tokens,
           CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens
           FROM q)
         SELECT doc_id, score, n_tokens, cum_tokens
         FROM c WHERE cum_tokens <= 15000""",

    // naiveBayesQuality replay: q_quality's rounded score >= 0.88
    // labels a 30% md5-selected seed ('4ccc' = floor(0.3 * 65536) in
    // hex), per-class token counts with add-1 smoothing, NB log-odds
    // over every document; pred thresholds the ROUNDED score like the
    // operator
    "q_nb_quality" ->
      s"""WITH $nbChainCtes
         SELECT doc_id, n_tokens, nb_score,
           CASE WHEN nb_score > 0 THEN 1 ELSE 0 END AS pred
         FROM scored""",

    // calibration replay: the SAME fit+score chain (shared CTE val),
    // truth re-derived from the quality CTE, logistic p rounded to 6
    // decimals BEFORE fixed-width binning (libm's last ulp never
    // decides a bin)
    "q_calibration" ->
      s"""WITH $nbChainCtes,
           truth AS (
             SELECT doc_id, CASE WHEN quality >= 0.88 THEN 1 ELSE 0 END AS g
             FROM q),
           pb AS (
             SELECT s.doc_id, round(1.0 / (1.0 + exp(-nb_score)), 6) AS p, g
             FROM scored s JOIN truth USING (doc_id))
         SELECT CAST(least(floor(p * 10), 9) AS INTEGER) AS bin,
           count(*) AS n_docs,
           round(avg(p), 6) AS avg_p,
           round(avg(g), 6) AS frac_good
         FROM pb GROUP BY 1""",

    // scoreAgainst replay: unigram model over the target sources,
    // general-pool tokens left-joined with the ln(1e-9) unseen floor
    "q_lm_cross" ->
      raw"""WITH m0 AS (
             SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
             FROM documents WHERE source IN ('src0', 'src1', 'src2')),
           m AS (SELECT term, count(*) AS n FROM m0 GROUP BY term),
           t AS (SELECT sum(n) AS total FROM m),
           lp AS (SELECT term, ln(CAST(n AS DOUBLE) / total) AS logp
                  FROM m CROSS JOIN t),
           tok AS (
             SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS term
             FROM documents WHERE source NOT IN ('src0', 'src1', 'src2'))
         SELECT tok.doc_id, count(*) AS n_tokens,
           round(avg(coalesce(lp.logp, ln(1e-9))), 6) AS logprob
         FROM tok LEFT JOIN lp USING (term)
         GROUP BY tok.doc_id""",

    "q_bpe_pairs" ->
      raw"""WITH wc AS (
           SELECT w, count(*) AS n FROM (
             SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
             FROM documents)
           WHERE len(w) > 0 GROUP BY w),
         p AS (
           SELECT substr(w, i, 1) AS sym_left,
                  substr(w, i + 1, 1) AS sym_right,
                  CAST(sum(n) AS BIGINT) AS pair_count
           FROM wc, unnest(range(1, len(w))) AS u(i)
           GROUP BY 1, 2)
         SELECT sym_left, sym_right, pair_count FROM p
         ORDER BY pair_count DESC, sym_left, sym_right LIMIT 20""",

    "q_bpe_learn" -> OracleGen.bpeLearnSql(k = 8),

    "q_kmeans" -> OracleGen.kmeansSql(k = 8, iters = 2, dim = 64),

    "q_semdedup" ->
      OracleGen.semDedupSql(k = 8, iters = 2, tau = 0.30, dim = 64),

    "q_bpe_encode" -> OracleGen.bpeEncodeSql(BpeEncodeMerges),

    "q_rrf" -> OracleGen.rrfSql(
      queryTerms = Seq("join", "window", "scan"), probeId = 0L,
      listK = 50, k = 20, c = 60, dim = 64),

    "q_knn_classify" ->
      OracleGen.knnClassifySql(probeMax = 40, k = 10, dim = 64),

    "q_label_suspects" ->
      OracleGen.labelSuspectsSql(k = 10, dim = 64),

    "q_label_suspects_ivf" ->
      OracleGen.labelSuspectsIvfSql(k = 10, nCells = 16, nProbe = 4,
        dim = 64),

    "q_pagerank" ->
      OracleGen.pagerankSql(iters = 3, damping = 0.85),

    // adamicAdar replay: wedge self-join through capped middles, non-
    // edge filter, Σ 1/ln(deg) per surviving pair
    "q_adamic_adar" ->
      """WITH e AS (
           SELECT DISTINCT l_partkey AS a, l_suppkey + 100000000 AS b
           FROM lineitem),
         adj AS (SELECT a AS z, b AS n FROM e
                 UNION ALL SELECT b, a FROM e),
         deg AS (SELECT z, count(*) AS d FROM adj GROUP BY z),
         mids AS (SELECT z, d FROM deg WHERE d <= 64),
         w AS (SELECT adj.z, adj.n, mids.d
               FROM adj JOIN mids ON mids.z = adj.z),
         pr AS (SELECT w1.n AS a, w2.n AS b, w1.d
                FROM w w1 JOIN w w2 ON w1.z = w2.z AND w1.n < w2.n),
         nw AS (SELECT pr.a, pr.b, pr.d FROM pr
                LEFT JOIN e ON e.a = pr.a AND e.b = pr.b
                WHERE e.a IS NULL)
         SELECT a AS id_a, b AS id_b, count(*) AS n_common,
           round(sum(1.0 / ln(CAST(d AS DOUBLE))), 6) AS aa_score
         FROM nw GROUP BY 1, 2""",

    // bfsHops replay: per-hop frontier CTEs (neighbors of the previous
    // frontier, anti-joined against everything visited — first entry
    // IS the min distance), unrolled to maxHops = 3
    "q_bfs_hops" ->
      """WITH e AS (
           SELECT DISTINCT o_custkey AS a, l_suppkey + 100000000 AS b
           FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         dir AS (SELECT a AS src, b AS dst FROM e
                 UNION ALL SELECT b, a FROM e),
         v0 AS (SELECT DISTINCT c_custkey AS id, 0 AS hops FROM customer
                WHERE c_custkey % 100 = 1),
         f1 AS (SELECT DISTINCT dir.dst AS id
                FROM dir JOIN v0 ON v0.id = dir.src
                LEFT JOIN v0 vv ON vv.id = dir.dst WHERE vv.id IS NULL),
         v1 AS (SELECT id, hops FROM v0 UNION ALL SELECT id, 1 FROM f1),
         f2 AS (SELECT DISTINCT dir.dst AS id
                FROM dir JOIN f1 ON f1.id = dir.src
                LEFT JOIN v1 vv ON vv.id = dir.dst WHERE vv.id IS NULL),
         v2 AS (SELECT id, hops FROM v1 UNION ALL SELECT id, 2 FROM f2),
         f3 AS (SELECT DISTINCT dir.dst AS id
                FROM dir JOIN f2 ON f2.id = dir.src
                LEFT JOIN v2 vv ON vv.id = dir.dst WHERE vv.id IS NULL)
         SELECT id, hops FROM v2 UNION ALL SELECT id, 3 FROM f3""",

    "q_chisq" ->
      """WITH cells AS (
           SELECT lang AS a, source AS b, count(*) AS o
           FROM documents GROUP BY 1, 2),
         ra AS (SELECT a, sum(o) AS ra FROM cells GROUP BY 1),
         rb AS (SELECT b, sum(o) AS rb FROM cells GROUP BY 1),
         n AS (SELECT sum(o) AS n FROM cells)
         SELECT
           round(sum(power(o - ra.ra * rb.rb / CAST(n.n AS DOUBLE), 2)
             / (ra.ra * rb.rb / CAST(n.n AS DOUBLE))), 6) AS chi2,
           CAST(((SELECT count(*) FROM ra) - 1)
             * ((SELECT count(*) FROM rb) - 1) AS BIGINT) AS dof,
           CAST(max(n.n) AS BIGINT) AS n
         FROM cells JOIN ra USING (a) JOIN rb USING (b) CROSS JOIN n""",

    "q_abtest" ->
      """WITH t AS (
           SELECT (user_id % 2 = 0) AS arm,
             CAST(event_type = 'purchase' AS BIGINT) AS hit
           FROM events),
         a AS (SELECT
             sum(CASE WHEN arm THEN 1 ELSE 0 END) AS n1,
             sum(CASE WHEN arm THEN hit ELSE 0 END) AS x1,
             sum(CASE WHEN NOT arm THEN 1 ELSE 0 END) AS n2,
             sum(CASE WHEN NOT arm THEN hit ELSE 0 END) AS x2
           FROM t)
         SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
           round(x1 / CAST(n1 AS DOUBLE), 6) AS p1,
           CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
           round(x2 / CAST(n2 AS DOUBLE), 6) AS p2,
           round((x1 / CAST(n1 AS DOUBLE) - x2 / CAST(n2 AS DOUBLE))
             / sqrt(((x1 + x2) / CAST(n1 + n2 AS DOUBLE))
               * (1.0 - (x1 + x2) / CAST(n1 + n2 AS DOUBLE))
               * (CAST(1.0 AS DOUBLE) / n1 + CAST(1.0 AS DOUBLE) / n2)), 6) AS z
         FROM a""",

    "q_basket" ->
      """WITH it AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                     FROM lineitem),
         n AS (SELECT count(DISTINCT b) AS n FROM it),
         ic AS (SELECT i, count(*) AS c FROM it GROUP BY 1),
         p AS (SELECT a.i AS item_a, b.i AS item_b, count(*) AS n_baskets
               FROM it a JOIN it b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2
               HAVING count(*) >= 3)
         SELECT item_a, item_b, n_baskets,
           round(n_baskets / CAST(n.n AS DOUBLE), 6) AS support,
           round(n_baskets / CAST(ca.c AS DOUBLE), 6) AS confidence,
           round(CAST(n_baskets AS DOUBLE) * n.n / (ca.c * cb.c), 6) AS lift
         FROM p
         JOIN ic ca ON ca.i = item_a
         JOIN ic cb ON cb.i = item_b
         CROSS JOIN n""",

    "q_triangles" ->
      raw"""WITH d AS (SELECT * FROM documents WHERE doc_id < 40),
         tok AS (
           SELECT DISTINCT doc_id,
             unnest(string_split_regex(trim(text), '\s+')) AS t
           FROM d),
         sz AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY 1),
         pr AS (SELECT a.doc_id AS x, b.doc_id AS y, count(*) AS c
                FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         e AS (SELECT x AS a, y AS b FROM pr
               JOIN sz sa ON sa.doc_id = x
               JOIN sz sb ON sb.doc_id = y
               WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) > 0.5),
         w AS (SELECT e1.a, e1.b, e2.b AS c
               FROM e e1 JOIN e e2 ON e1.b = e2.a),
         tri AS (SELECT w.a, w.b, w.c
                 FROM w JOIN e ON e.a = w.a AND e.b = w.c),
         x AS (SELECT unnest([a, b, c]) AS id FROM tri)
         SELECT id, count(*) AS n_triangles FROM x GROUP BY id""",

    "q_mad" ->
      """WITH med AS (
           SELECT event_type, median(value) AS med
           FROM events GROUP BY 1),
         mad AS (
           SELECT e.event_type, median(abs(e.value - m.med)) AS mad
           FROM events e JOIN med m USING (event_type)
           GROUP BY 1)
         SELECT e.event_id, e.event_type,
           round(0.6745 * (e.value - m.med) /
             (CASE WHEN d.mad > 0 THEN d.mad END), 6) AS robust_z,
           coalesce(abs(round(0.6745 * (e.value - m.med) /
             (CASE WHEN d.mad > 0 THEN d.mad END), 6)) > 3.5, false)
             AS is_outlier
         FROM events e
         JOIN med m USING (event_type)
         JOIN mad d USING (event_type)""",

    "q_dp_counts" ->
      """WITH g AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
         u AS (SELECT source, n,
           (CAST('0x' || substr(md5('dp|' || source), 1, 12) AS BIGINT) + 1)
             / 281474976710656.0 AS u
           FROM g)
         SELECT source,
           round(n + (-1.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))), 4)
             AS n_noisy,
           CAST(1.0 AS DOUBLE) AS epsilon
         FROM u""",

    "q_kanon" ->
      """SELECT lang, source, count(*) AS n_rows,
         count(*) < 5 AS suppress
         FROM documents GROUP BY lang, source""",

    "q_doc_sim" ->
      raw"""WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
         w AS (SELECT tf.doc_id, tf.term,
                 tf.tf * ln(CAST(n.n AS DOUBLE) / df.df) AS wt
               FROM tf JOIN df USING (term) CROSS JOIN n),
         nrm AS (SELECT doc_id, sqrt(sum(wt * wt)) AS nrm
                 FROM w GROUP BY doc_id),
         pairs AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             sum(a.wt * b.wt) AS dot
           FROM w a JOIN w b USING (term)
           WHERE a.doc_id < 10 AND a.doc_id <> b.doc_id
           GROUP BY 1, 2),
         scored AS (
           SELECT doc_a, doc_b,
             round(dot / (na.nrm * nb.nrm), 6) AS cosine
           FROM pairs
           JOIN nrm na ON na.doc_id = doc_a
           JOIN nrm nb ON nb.doc_id = doc_b)
         SELECT doc_a, doc_b, rank FROM (
           SELECT doc_a, doc_b,
             row_number() OVER (PARTITION BY doc_a
               ORDER BY cosine DESC, doc_b) AS rank
           FROM scored) t
         WHERE rank <= 5""",

    "q_rag_context" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         s AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(p.v) + 1), i -> p.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(p.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x * x)))) AS cosine
           FROM e p JOIN e c ON c.vec_id <> p.vec_id
           WHERE p.vec_id = 0),
         top AS (
           SELECT probe_id, neighbor_id, rank FROM (
             SELECT probe_id, neighbor_id,
               row_number() OVER (PARTITION BY probe_id
                 ORDER BY cosine DESC, neighbor_id) AS rank
             FROM s) t
           WHERE rank <= 3),
         ctx AS (
           SELECT top.probe_id,
             count(*) AS n_docs,
             string_agg(d.text, chr(10) || chr(10) ORDER BY top.rank)
               AS context
           FROM top JOIN documents d ON d.doc_id = top.neighbor_id
           GROUP BY top.probe_id)
         SELECT probe_id, n_docs,
           CAST(len(string_split_regex(trim(context), '\s+')) AS BIGINT)
             AS total_tokens,
           md5(context) AS ctx_hash
         FROM ctx""",

    "q_cluster_purity" ->
      OracleGen.clusterPuritySql(k = 8, iters = 2, dim = 64),

    "q_bm25" ->
      raw"""WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
           FROM documents),
         dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
         stats AS (SELECT avg(dl) AS avgdl, count(*) AS n FROM dl),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
                WHERE term IN ('join', 'window', 'scan') GROUP BY 1, 2),
         df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         scored AS (
           SELECT tf.doc_id,
             round(sum(
               ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
               (tf * 2.2) /
               (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
           FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
           CROSS JOIN stats
           GROUP BY tf.doc_id)
         SELECT doc_id, score FROM scored
         ORDER BY score DESC, doc_id LIMIT 25""",

    "q_centroids" ->
      """WITH e AS (
           SELECT label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)
         SELECT label, CAST(i - 1 AS BIGINT) AS dim_idx,
           count(*) AS n_vecs, round(avg(v[i]), 6) AS centroid
         FROM e, unnest(range(1, len(v) + 1)) AS u(i)
         GROUP BY label, i""",

    "q_funnel" ->
      """WITH ev AS (
           SELECT user_id AS u, ts, event_type AS t FROM events
           WHERE event_type IN ('view', 'click', 'purchase')),
         r0 AS (SELECT u, min(ts) AS r0 FROM ev WHERE t = 'view' GROUP BY u),
         r1 AS (
           SELECT r0.u, r0.r0, min(e.ts) AS r1
           FROM r0 LEFT JOIN ev e
             ON e.u = r0.u AND e.t = 'click' AND e.ts > r0.r0
           GROUP BY r0.u, r0.r0),
         r2 AS (
           SELECT r1.u, r1.r0, r1.r1, min(e.ts) AS r2
           FROM r1 LEFT JOIN ev e
             ON e.u = r1.u AND e.t = 'purchase' AND e.ts > r1.r1
           GROUP BY r1.u, r1.r0, r1.r1),
         c AS (SELECT count(r0) AS n0, count(r1) AS n1, count(r2) AS n2
               FROM r2)
         SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name,
           n0 AS n_users, round(CAST(n0 AS DOUBLE) / n0, 6) AS conv FROM c
         UNION ALL
         SELECT CAST(2 AS BIGINT), 'click', n1,
           round(CAST(n1 AS DOUBLE) / n0, 6) FROM c
         UNION ALL
         SELECT CAST(3 AS BIGINT), 'purchase', n2,
           round(CAST(n2 AS DOUBLE) / n0, 6) FROM c""",

    "q_retention" ->
      """WITH f AS (
           SELECT user_id AS u,
             CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
           FROM events GROUP BY user_id),
         a AS (SELECT DISTINCT user_id AS u,
                 CAST(date_trunc('week', ts) AS DATE) AS wk
               FROM events),
         cells AS (
           SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, a.wk) // 7 AS BIGINT)
               AS week_offset,
             count(DISTINCT a.u) AS n_users
           FROM a JOIN f ON a.u = f.u
           GROUP BY 1, 2),
         s AS (SELECT cohort_week, count(DISTINCT u) AS sz FROM f GROUP BY 1)
         SELECT c.cohort_week, c.week_offset, c.n_users,
           round(CAST(c.n_users AS DOUBLE) / s.sz, 6) AS retention
         FROM cells c JOIN s ON c.cohort_week = s.cohort_week""",

    "q_fuzzy_match" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part
                    WHERE p_name IS NOT NULL),
         nb AS (SELECT name, regexp_extract(name, '[^ ]+$') AS blk FROM n),
         pairs AS (
           SELECT a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
           FROM nb a JOIN nb b ON a.blk = b.blk AND a.name < b.name
           WHERE levenshtein(a.name, b.name) <= 3),
         m AS (SELECT p_name AS v, count(*) AS nrows FROM part GROUP BY 1)
         SELECT p.name_a, p.name_b, p.dist,
           ma.nrows AS n_rows_a, mb.nrows AS n_rows_b
         FROM pairs p
         JOIN m ma ON p.name_a = ma.v
         JOIN m mb ON p.name_b = mb.v""",

    "q_hard_negatives" ->
      """WITH e AS (SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
         s AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(p.v) + 1), i -> p.v[i] * c.v[i]))
               / (sqrt(list_sum(list_transform(p.v, x -> x * x)))
                  * sqrt(list_sum(list_transform(c.v, x -> x * x)))) AS cosine
           FROM e p JOIN e c ON c.label <> p.label
           WHERE p.vec_id < 32)
         SELECT probe_id, neighbor_id, rank FROM (
           SELECT probe_id, neighbor_id,
             row_number() OVER (PARTITION BY probe_id
               ORDER BY cosine DESC, neighbor_id) AS rank
           FROM s) t
         WHERE rank <= 5""",

    "q_normalize" ->
      """WITH x AS (
           SELECT doc_id,
             trim(regexp_replace(lower(nfc_normalize(text)),
               '[ \t\n\x0B\f\r]+', ' ', 'g')) AS norm
           FROM documents)
         SELECT doc_id, md5(norm) AS norm_hash,
           CAST(length(norm) AS BIGINT) AS n_norm_chars
         FROM x""",

    "q_source_cap" ->
      """SELECT doc_id, source, grp_rank FROM (
           SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
               ORDER BY md5(concat_ws('|', 'cap', doc_id)), doc_id)
               AS grp_rank
           FROM documents) t
         WHERE grp_rank <= 20""",

    "q_unpivot" ->
      """SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
           l_quantity AS val FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
           FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
           FROM lineitem
         UNION ALL
         SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem""",

    "q_corr" ->
      """SELECT l_returnflag,
         round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
         round(covar_samp(l_quantity, l_extendedprice), 6) AS covar_qty_price,
         round(stddev_samp(l_quantity), 6) AS std_qty
         FROM lineitem GROUP BY l_returnflag""",

    "q_zscore" ->
      """WITH s AS (
           SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
           FROM events GROUP BY event_type)
         SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / (CASE WHEN s.sd > 0 THEN s.sd END), 6) AS z,
           coalesce(abs(round((e.value - s.mu) /
             (CASE WHEN s.sd > 0 THEN s.sd END), 6)) > 2.5, false) AS is_anomaly
         FROM events e JOIN s ON e.event_type = s.event_type""",

    "q_containment" ->
      raw"""WITH toks AS (
           SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
           FROM documents WHERE text IS NOT NULL),
         sh AS (
           SELECT DISTINCT doc_id,
                  ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS shingle
           FROM toks, unnest(range(1, len(ts) - 1)) AS u(i)),
         sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         common AS (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
           FROM sh a JOIN sh b ON a.shingle = b.shingle
                              AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / sa.n, 6) AS cont_a,
           round(CAST(n_common AS DOUBLE) / sb.n, 6) AS cont_b
         FROM common
         JOIN sizes sa ON sa.doc_id = doc_a
         JOIN sizes sb ON sb.doc_id = doc_b
         WHERE CAST(n_common AS DOUBLE) / least(sa.n, sb.n) >= 0.2""",

    "q_fullouter" ->
      """WITH o AS (SELECT o_custkey AS k, count(*) AS n_orders
                    FROM orders WHERE o_custkey >= 100 GROUP BY 1),
         e AS (SELECT user_id AS k, count(*) AS n_events
               FROM events GROUP BY 1)
         SELECT k, coalesce(n_orders, 0) AS n_orders,
           coalesce(n_events, 0) AS n_events
         FROM o FULL JOIN e USING (k)""",

    "q_entity_groups" ->
      """WITH n AS (SELECT DISTINCT p_name AS name FROM part
                    WHERE p_name IS NOT NULL),
         nb AS (SELECT name, regexp_extract(name, '[^ ]+$') AS blk FROM n),
         pairs AS (
           SELECT a.name AS id_a, b.name AS id_b
           FROM nb a JOIN nb b ON a.blk = b.blk AND a.name < b.name
           WHERE levenshtein(a.name, b.name) <= 3),
         edges AS (
           SELECT id_a AS src, id_b AS dst FROM pairs
           UNION SELECT id_b, id_a FROM pairs),
         reach AS (
           WITH RECURSIVE r(id, root) AS (
             SELECT DISTINCT src, src FROM edges
             UNION
             SELECT e.dst, r.root FROM r JOIN edges e ON e.src = r.id)
           SELECT * FROM r)
         SELECT id AS name, min(root) AS canonical FROM reach GROUP BY id""",

    "q_ntile" ->
      """SELECT o_orderkey, o_orderpriority,
         round(percent_rank() OVER w, 6) AS pr,
         round(cume_dist() OVER w, 6) AS cd,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey)""",

    "q_session_ids" ->
      """WITH o AS (
           SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events)
         SELECT event_id, user_id,
           CAST(sum(CASE WHEN prev IS NULL
                         OR epoch_us(ts) - epoch_us(prev) > 1800000000
                         THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
         FROM o"""
  )
}
