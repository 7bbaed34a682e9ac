package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.crmls.Crmls
import graft.sources.Tables
import graft.streaming.{CrmlsStream, LatestState, StreamingAsOf,
  StreamingDedup, StreamingIntervalJoin, UpsertJoin}

/** Streaming legs of the correctness gate: deterministic MemoryStream
  * replays of the library's streaming operators over the test tables,
  * run to completion and reduced to their FINAL tables — so the
  * driver's batch DuckDB oracle can hash-check streaming semantics the
  * same way it checks every batch operator (the q_stream_* rows; the
  * replay-vs-batch identity was previously pinned only inside the sbt
  * suite, e.g. BatchStreamEquivalenceSpec).
  *
  * Replay determinism, by construction:
  *  - feeds are chunked CHRONOLOGICALLY (or by within-group rank for
  *    the dedup leg), so watermarks only move forward and Spark's
  *    late-row filter can never drop a record — any positive delay is
  *    safe;
  *  - all tie axes ride zero-padded-id payloads (lexicographic ==
  *    numeric order), and the test timestamps are distinct, so every
  *    state transition is order-free;
  *  - event timestamps are microsecond-exact; the as-of leg maps epoch
  *    MICROS onto the operator's millisecond axis (Timestamp.getTime)
  *    so no precision is lost crossing `java.sql.Timestamp`.
  *
  * Each replay runs as its own uniquely-named memory-sink query; the
  * result is detached (collected + re-created) so the returned frame
  * has no lifetime tie to the stopped stream.
  */
object StreamReplay {

  private val seq = new java.util.concurrent.atomic.AtomicLong

  private def detach(spark: SparkSession, name: String): DataFrame = {
    val t = spark.table(name)
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    t.collect().foreach(rows.add)
    spark.catalog.dropTempView(name)
    spark.createDataFrame(rows, t.schema)
  }

  /** [[StreamingDedup.exactDedupStream]] over `documents`, replayed in
    * four micro-batches: each duplicate group's KEEPER (min doc_id)
    * arrives in one of the first three batches — spread by content
    * hash — and every later copy arrives in batch four, AFTER its
    * keeper is in state. Within any single batch all texts are
    * distinct, so the kept set is exactly "min doc_id per distinct
    * text" with no within-batch winner ambiguity.
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"stream_dedup_${seq.incrementAndGet()}"
    val w = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val chunks = Tables.load(spark, dir, "documents")
      .withColumn("__rn", row_number().over(w))
      .withColumn("__chunk", when(col("__rn") > 1, lit(3))
        .otherwise(pmod(xxhash64(md5(col("text"))), lit(3L)).cast("int")))
      .select(col("__chunk"), col("doc_id"), col("text"))
      .as[(Int, Long, String)].collect()
      .groupBy(_._1)
    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup
      .exactDedupStream(input.toDF().toDF("doc_id", "text"), "text")
      .select("doc_id", "content_hash")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 to 3).foreach { c =>
        chunks.get(c).foreach(rs => input.addData(rs.map(r => (r._2, r._3)).toSeq: _*))
        q.processAllAvailable()
      }
    } finally q.stop()
    detach(spark, name)
  }

  /** [[LatestState.latestByKey]] — the reference's continuous argmax
    * dedup — over `events` keyed by user, replayed chronologically in
    * four micro-batches. The memory sink accumulates the UPSERT
    * changelog; upserts are strictly increasing per key, so the final
    * table is the per-key maximum of the emitted rows (the standard
    * changelog-to-snapshot reduction).
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  def latestVersion(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"stream_latest_${seq.incrementAndGet()}"
    val rows = Tables.load(spark, dir, "events")
      .select(col("user_id").cast("string").as("key"),
        unix_micros(col("ts").cast("timestamp")).as("ts"),
        lpad(col("event_id").cast("string"), 12, "0").as("payload"))
      .orderBy("ts")
      .as[(String, Long, String)].collect()
    val input = MemoryStream[LatestState.Versioned]
    val q = LatestState.latestByKey(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { c =>
        input.addData(c.map(t =>
          LatestState.Versioned(t._1, t._2, t._3)).toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val wLast = Window.partitionBy(col("key"))
      .orderBy(col("ts").desc, col("payload").desc)
    detach(spark, name)
      .withColumn("__rn", row_number().over(wLast))
      .filter(col("__rn") === 1)
      .select(col("key").cast("long").as("user_id"),
        timestamp_micros(col("ts")).cast("timestamp_ntz").as("ts"),
        col("payload").cast("long").as("event_id"))
  }

  /** [[StreamingAsOf.asOfStream]] — the reference's event-time temporal
    * join — purchases probing the latest click at-or-before their
    * timestamp, per user, replayed chronologically in four
    * micro-batches plus three sentinel advances (the watermark must
    * pass the last probes before they ripen; sentinels ride a dummy
    * key and never emit). Timestamps cross the operator's millisecond
    * axis as epoch MICROS, so sub-millisecond ordering — which the
    * test events have — survives intact.
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  def asOfJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"stream_asof_${seq.incrementAndGet()}"
    val rows = Tables.load(spark, dir, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select(col("user_id").cast("string").as("key"),
        timestamp_millis(unix_micros(col("ts").cast("timestamp"))).as("event_ts"),
        (col("event_type") === "purchase").as("isProbe"),
        lpad(col("event_id").cast("string"), 12, "0").as("payload"))
      .orderBy("event_ts")
      .as[(String, java.sql.Timestamp, Boolean, String)].collect()
    val input = MemoryStream[(String, java.sql.Timestamp, Boolean, String)]
    val tagged = input.toDF().toDF("key", "event_ts", "isProbe", "payload")
      .withWatermark("event_ts", "30 seconds")
      .select(col("key"), col("event_ts").as("ts"),
        col("isProbe"), col("payload"))
      .as[StreamingAsOf.Tagged]
    val q = StreamingAsOf.asOfStream(tagged)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { c =>
        input.addData(c.toSeq: _*)
        q.processAllAvailable()
      }
      val maxMs = rows.iterator.map(_._2.getTime).max
      (1 to 3).foreach { i =>
        input.addData(("~advance", new java.sql.Timestamp(
          maxMs + i * 120000L), false, "z"))
        q.processAllAvailable()
      }
    } finally q.stop()
    detach(spark, name)
      .filter(col("key") =!= "~advance")
      .select(col("probePayload").cast("long").as("event_id"),
        col("key").cast("long").as("user_id"),
        timestamp_micros(col("probeTs")).cast("timestamp_ntz").as("ts"),
        col("buildPayload").cast("long").as("clk_event_id"))
  }

  /** Full-precision (microsecond) Timestamp for the MemoryStream
    * encoders: java.sql.Timestamp's nanos field carries what the
    * millisecond constructor would truncate.
    */
  private def tsOfMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** T3/T4 streamed: watermarked 1-hour tumbling-window aggregation in
    * APPEND mode — windows emit only once the watermark passes their
    * end (the genuine finalization machinery, not a complete-mode
    * recomputation), replayed chronologically in four micro-batches
    * plus sentinel advances that close the last real windows (the
    * sentinel's own never-finalized window is filtered out). Same
    * oracle as the batch q_tumbling.
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"stream_tumbling_${seq.incrementAndGet()}"
    val rows = Tables.load(spark, dir, "events")
      .select(unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), col("value"))
      .orderBy("us")
      .as[(Long, String, Double)].collect()
      .map(r => (tsOfMicros(r._1), r._2, r._3))
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { c =>
        input.addData(c.toSeq: _*)
        q.processAllAvailable()
      }
      val maxMs = rows.iterator.map(_._1.getTime).max
      (1 to 2).foreach { i =>
        input.addData((new java.sql.Timestamp(
          maxMs + i * 2 * 3600 * 1000L), "~advance", 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    detach(spark, name).filter(col("event_type") =!= "~advance")
  }

  /** T10 streamed: event-time SESSION windows (10-minute gap) per
    * user in append mode — sessions must MERGE across micro-batches
    * (the stateful part a tumbling window never exercises) and emit
    * only once the watermark passes their close. Same gaps-and-islands
    * oracle as the batch q_session.
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  def sessionWindows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"stream_session_${seq.incrementAndGet()}"
    val rows = Tables.load(spark, dir, "events")
      .select(unix_micros(col("ts").cast("timestamp")).as("us"),
        col("user_id"), col("value"))
      .orderBy("us")
      .as[(Long, Long, Double)].collect()
      .map(r => (tsOfMicros(r._1), r._2, r._3))
    val input = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val agg = input.toDF().toDF("ts", "user_id", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(session_window(col("ts"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("session_window.start").cast("timestamp_ntz")
        .as("sess_start"), col("user_id"), col("n"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      rows.grouped(math.max(1, rows.length / 4 + 1)).foreach { c =>
        input.addData(c.toSeq: _*)
        q.processAllAvailable()
      }
      val maxMs = rows.iterator.map(_._1.getTime).max
      (1 to 2).foreach { i =>
        input.addData((new java.sql.Timestamp(
          maxMs + i * 3600 * 1000L), -1L, 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    detach(spark, name).filter(col("user_id") =!= -1L)
  }

  /** T2/T9 streamed: BOUNDED-LATENESS drop semantics, made a gate
    * artifact. Events arrive OUT OF ORDER (arrival batch =
    * event_id % 4 — plain arithmetic, so the oracle recomputes the
    * same schedule), feeding a watermarked 1-hour window aggregation
    * with 30-minute lateness. Spark drops a row when its WINDOW is
    * already finalized — window_end <= the watermark carried in from
    * the previous batch (max event time seen so far minus the delay).
    * The oracle applies exactly that rule in SQL: per-chunk running
    * max -> previous-chunk watermark -> keep rows whose window end
    * exceeds it -> re-aggregate. Any divergence in Spark's late-row
    * boundary or watermark bookkeeping breaks the hash match.
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  def lateDrop(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"stream_latedrop_${seq.incrementAndGet()}"
    val rows = Tables.load(spark, dir, "events")
      .select(pmod(col("event_id"), lit(4L)).cast("int").as("chunk"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_type"), col("value"))
      .orderBy("us")
      .as[(Int, Long, String, Double)].collect()
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("w_start"),
        col("event_type"), col("n"), col("sum_value"))
    val q = agg.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      (0 to 3).foreach { c =>
        input.addData(rows.filter(_._1 == c)
          .map(r => (tsOfMicros(r._2), r._3, r._4)).toSeq: _*)
        q.processAllAvailable()
      }
      val maxMs = rows.iterator.map(_._2 / 1000L).max
      (1 to 2).foreach { i =>
        input.addData((new java.sql.Timestamp(
          maxMs + i * 3 * 3600 * 1000L), "~advance", 0.0))
        q.processAllAvailable()
      }
    } finally q.stop()
    detach(spark, name).filter(col("event_type") =!= "~advance")
  }

  /** The native STREAM-STREAM leg: Spark's symmetric-hash interval
    * join ([[StreamingIntervalJoin.joinWithin]] — the one join shape
    * the engine runs with bounded state), purchases joining clicks of
    * the same user within the preceding hour. Two MemoryStreams fed
    * in chronological lockstep; inner-join matches emit as both sides
    * arrive, so no sentinel is needed — the watermark only governs
    * state EVICTION, which by the join bound can never drop a
    * still-matchable row under a forward-only feed.
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val name = s"stream_interval_${seq.incrementAndGet()}"
    def sideRows(eventType: String) = Tables.load(spark, dir, "events")
      .filter(col("event_type") === eventType)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .orderBy("us")
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2, tsOfMicros(r._3)))
    val purchases = sideRows("purchase")
    val clicks = sideRows("click")
    val pIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val bIn = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val joined = StreamingIntervalJoin.joinWithin(
      pIn.toDF().toDF("event_id", "user_id", "ts"),
      bIn.toDF().toDF("event_id", "user_id", "ts"),
      key = "user_id", probeTs = "ts", buildTs = "ts",
      lookbackSec = 3600L)
      .select(col("event_id"), col("user_id"),
        col("b_event_id").as("clk_event_id"))
    val q = joined.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      val nChunks = 4
      def chunksOf(a: Array[(Long, Long, java.sql.Timestamp)]) =
        a.grouped(math.max(1, a.length / nChunks + 1)).toArray
      val (pc, bc) = (chunksOf(purchases), chunksOf(clicks))
      (0 until math.max(pc.length, bc.length)).foreach { i =>
        if (i < pc.length) pIn.addData(pc(i).toSeq: _*)
        if (i < bc.length) bIn.addData(bc(i).toSeq: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    detach(spark, name)
  }

  /** The reference's PRODUCTION job — [[CrmlsStream]]'s incremental
    * latest-version + multi-way join — replayed over envelopes
    * synthesized from the test tables ([[Crmls.envelopeCol]], the same
    * wire builder every producer-side tool uses): orders become
    * listings (ListAgent = o_custkey), customers become agents. Three
    * micro-batches exercise the three state paths — initial build,
    * DIMENSION updates that must re-emit affected joined rows through
    * the reverse index (agent v2), and listing updates superseding by
    * pk (listing v2 with a changed listing key). Because the envelope
    * content is a pure function of orders/customer, the final joined
    * table is expressible as plain SQL over those tables — no JSON in
    * the oracle.
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  /** ADVERSARIAL-CHURN variant of [[crmlsJoin]] — the retract-churn
    * worst case the steady replay never hits: ONE hot listing key
    * updates in EVERY micro-batch (each version re-pointing at a
    * DIFFERENT agent, so the reverse index accumulates stale entries
    * that later dim updates fan out through as false positives), and
    * every dimension arrives or updates AFTER the facts that reference
    * it (batch 1 is listings only — their agent role columns are null
    * until batch 3 heals them through the index). The final table is
    * pure latest-version-join arithmetic, hash-checked by the same
    * batch oracle style as q_stream_crmls.
    *
    * Six batches: (1) all listings v1 + hot#1, (2) hot#2, (3) all
    * agents v1 + hot#3, (4) listings %64==16 v2 + hot#4, (5) agents
    * %4==1 v2 + hot#5, (6) hot#6 (the surviving hot version).
    *
    * HARNESS-ONLY: feeds MemoryStream from a whole-table collect of
    * the sf fixture — fine for gate replays, never the production
    * pattern. Production streams read [[sources.Streams.kafkaJsonSource]]
    * or a file source; do not copy this collect into pipeline code.
    */
  def crmlsChurn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val orders = Tables.load(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(32L)) === 16)
    val custs = Tables.load(spark, dir, "customer")
    val (hotCust, mxCust) = {
      val h = orders.orderBy("o_orderkey").select("o_custkey")
        .as[Long].head()
      val m = custs.agg(max(col("c_custkey"))).as[Long].head()
      (h, m)
    }
    def envs(df: org.apache.spark.sql.DataFrame,
             entity: String): Seq[(String, String)] =
      df.as[String].collect().toSeq.map(entity -> _)
    def listingEnv(v2: Boolean) = Crmls.envelopeCol(
      concat(lit("L"), col("o_orderkey").cast("string")),
      lit(if (v2) 4L else 1L),
      to_json(struct(
        concat(lit("LK"), col("o_orderkey").cast("string"),
          lit(if (v2) "V2" else "")).as("ListingKeyNumeric"),
        col("o_custkey").cast("string").as("ListAgentKeyNumeric"))))
    def agentEnv(v2: Boolean) = Crmls.envelopeCol(
      col("c_custkey").cast("string"), lit(if (v2) 20L else 10L),
      to_json(struct(lit(if (v2) "y" else "x").as("n"))))
    def hotEnv(b: Int): Seq[(String, String)] = {
      val ref = 1L + (hotCust + b) % mxCust
      envs(spark.range(1).select(Crmls.envelopeCol(lit("LHOT"), lit(b.toLong),
        to_json(struct(lit(s"LKHOT$b").as("ListingKeyNumeric"),
          lit(ref.toString).as("ListAgentKeyNumeric")))).as("v")), "listings")
    }
    val batches = Seq(
      envs(orders.select(listingEnv(v2 = false).as("v")), "listings") ++
        hotEnv(1),
      hotEnv(2),
      envs(custs.select(agentEnv(v2 = false).as("v")), "agents") ++
        hotEnv(3),
      envs(orders.filter(pmod(col("o_orderkey"), lit(64L)) === 16)
        .select(listingEnv(v2 = true).as("v")), "listings") ++ hotEnv(4),
      envs(custs.filter(pmod(col("c_custkey"), lit(4L)) === 1)
        .select(agentEnv(v2 = true).as("v")), "agents") ++ hotEnv(5),
      hotEnv(6))

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-stream-churn").toString
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/sink")
    val input = MemoryStream[(String, String)]
    val tagged = input.toDF().toDF("entity", "value")
    batches.foreach { b =>
      input.addData(b: _*)
      CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt")
        .awaitTermination()
    }
    val out = sink.snapshot(spark).select(col("l_uc_pk"),
      col("l_listing_key"), col("aa_uc_pk"), col("aa_uc_created_ts"))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    out.collect().foreach(rows.add)
    val detached = spark.createDataFrame(rows, out.schema)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(tmp))
    detached
  }

  /** @param forceDistributedTiers gate-row twin knob: snapshot caps
    *   forced to 1 row and driver budgets to 0, so every replay batch
    *   runs the middle/legacy DISTRIBUTED tiers (distributed discovery
    *   aggregation, persisted snapshots, fullState join legs, the
    *   distributed affected-key fallback) — the 100x-state code path
    *   under the DRIVER's DuckDB oracle, not just a local spec.
    */
  def crmlsJoin(spark: SparkSession, dir: String,
                forceDistributedTiers: Boolean = false): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val orders = Tables.load(spark, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(32L)) === 0)
    val custs = Tables.load(spark, dir, "customer")
    def envs(df: org.apache.spark.sql.DataFrame,
             entity: String): Seq[(String, String)] =
      df.as[String].collect().toSeq.map(entity -> _)
    def listingEnv(v2: Boolean) = Crmls.envelopeCol(
      concat(lit("L"), col("o_orderkey").cast("string")),
      lit(if (v2) 2L else 1L),
      to_json(struct(
        concat(lit("LK"), col("o_orderkey").cast("string"),
          lit(if (v2) "V2" else "")).as("ListingKeyNumeric"),
        col("o_custkey").cast("string").as("ListAgentKeyNumeric"))))
    def agentEnv(v2: Boolean) = Crmls.envelopeCol(
      col("c_custkey").cast("string"), lit(if (v2) 2L else 1L),
      to_json(struct(lit(if (v2) "y" else "x").as("n"))))
    val batch1 =
      envs(orders.select(listingEnv(v2 = false).as("v")), "listings") ++
        envs(custs.select(agentEnv(v2 = false).as("v")), "agents")
    val batch2 = envs(custs.filter(pmod(col("c_custkey"), lit(4L)) === 0)
      .select(agentEnv(v2 = true).as("v")), "agents")
    val batch3 = envs(orders.filter(pmod(col("o_orderkey"), lit(64L)) === 0)
      .select(listingEnv(v2 = true).as("v")), "listings")

    val tmp = java.nio.file.Files
      .createTempDirectory("graft-stream-crmls").toString
    val store =
      if (forceDistributedTiers)
        new CrmlsStream.StateStore(spark, s"$tmp/state",
          localSnapshotMaxRows = 1, idxLocalMaxRows = 1)
      else new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/sink")
    val input = MemoryStream[(String, String)]
    val tagged = input.toDF().toDF("entity", "value")
    Seq(batch1, batch2, batch3).foreach { b =>
      input.addData(b: _*)
      (if (forceDistributedTiers)
         CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt",
           driverBatchMaxRows = 0, driverAffectedMaxRows = 0)
       else CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt"))
        .awaitTermination()
    }
    val out = sink.snapshot(spark).select(col("l_uc_pk"),
      col("l_listing_key"), col("aa_uc_pk"), col("aa_uc_created_ts"))
    // Detach like every other replay leg: the snapshot reads the
    // parquet sink under tmp, so collect + recreate before deleting
    // the temp tree — otherwise the result's lifetime is tied to the
    // temp files and each gate invocation leaks disk.
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
    out.collect().foreach(rows.add)
    val detached = spark.createDataFrame(rows, out.schema)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(tmp))
    detached
  }
}
