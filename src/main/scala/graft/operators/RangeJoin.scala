package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-interval (range) join decomposed into an equi-join.
  *
  * The reference's surface is equi-joins only (SURVEY §2.5), but a
  * training-data pipeline constantly needs "events of the same key
  * within a time window" (sessionized features, label windows,
  * click-attribution). The naive Spark plan for
  * `a JOIN b ON a.key = b.key AND b.ts BETWEEN a.ts - w AND a.ts`
  * is an equi-join on `key` with the range as a post-join filter —
  * fine until one key holds a long history, at which point the per-key
  * pair blowup is quadratic in that key's row count.
  *
  * Scale plan: coarsen time into buckets of `bucketMs` and make the
  * bucket part of the JOIN KEY. The build side lands in its own bucket;
  * each probe row explodes to the few buckets its window can overlap
  * (ceil(window/bucket) + 1 rows, = 2 at the default bucket width).
  * The join is then a plain shuffled equi-join on (key, bucket) with
  * the exact range predicate evaluated in-bucket, so per-reducer work
  * is bounded by bucket population, not key history, and the planner
  * never falls back to a nested loop. This is the standard
  * decomposition streaming engines use for interval joins, expressed
  * against Spark's batch/AQE machinery.
  */
object RangeJoin {

  /** Inner interval join: pairs (probe row, build row) with equal `key`
    * and `buildTs` within `[probeTs - lookbackMs, probeTs + lookaheadMs]`
    * (both ends inclusive). Build columns are emitted under
    * `buildPrefix` to keep the two sides' names disjoint.
    *
    * Inner-only by design: a probe row is exploded per candidate
    * bucket, so an outer variant would have to reconcile duplicate
    * unmatched copies — callers wanting left semantics aggregate the
    * pairs and left-join the aggregate back to the probe side (see
    * q_interval_join in the catalog), which is also the shape that
    * scales: the re-join key is the probe's primary key.
    *
    * @param bucketMs bucket width; 0 = window span (lookback+lookahead),
    *                 the fan-out-minimal default. Smaller buckets trade
    *                 probe fan-out for tighter in-bucket selectivity.
    */
  def intervalJoin(probe: DataFrame, build: DataFrame, key: String,
                   probeTs: String, buildTs: String,
                   lookbackMs: Long, lookaheadMs: Long = 0L,
                   bucketMs: Long = 0L,
                   buildPrefix: String = "b_"): DataFrame = {
    require(lookbackMs >= 0 && lookaheadMs >= 0,
      "lookbackMs/lookaheadMs must be >= 0")
    val span = lookbackMs + lookaheadMs
    require(span > 0, "window span must be positive")
    // both the bare internals and their prefixed aliases are reserved:
    // a probe column named like buildPrefix+"__ms" would be silently
    // swallowed by the final drop
    val reserved = Seq("__ms", "__bkt") ++
      Seq(s"${buildPrefix}__ms", s"${buildPrefix}__bkt")
    reserved.foreach { r =>
      require(!probe.columns.contains(r) && !build.columns.contains(r),
        s"column name $r is reserved by intervalJoin")
    }
    // prefixed build names must not collide with probe columns — the
    // join output would carry duplicate names (and `drop` below would
    // silently eat a probe column named like an internal one)
    val clash = build.columns.map(buildPrefix + _).toSet
      .intersect(probe.columns.toSet)
    require(clash.isEmpty,
      s"probe columns collide with prefixed build columns: $clash")

    // compare at MICROsecond precision — TimestampType's native unit —
    // so the window boundary agrees exactly with a plain
    // `buildTs BETWEEN probeTs - w AND probeTs + w` (a millisecond
    // truncation here would admit pairs whose true distance exceeds
    // the window by a sub-ms hair)
    val lookbackUs = math.multiplyExact(lookbackMs, 1000L)
    val lookaheadUs = math.multiplyExact(lookaheadMs, 1000L)
    val bucketUs = math.multiplyExact(if (bucketMs > 0) bucketMs else span, 1000L)
    // accept TIMESTAMP_NTZ inputs too: unix_micros is LTZ-strict, and a
    // cast from NTZ resolves via the session time zone (pinned to UTC in
    // GraftSession), so both sides convert identically either way. The
    // cast is applied ONLY to NTZ columns — a blanket cast would also
    // coerce strings/dates, turning an unparseable value into a silent
    // NULL row-drop instead of the analysis error unix_micros raises
    // resolve through Spark's own analyzer (df.select), not
    // StructType.apply — the latter is exact-case-only and would
    // reject names that col() resolves fine (case-insensitive config,
    // nested paths)
    def micros(df: DataFrame, tsCol: String): Column =
      df.select(col(tsCol)).schema.head.dataType match {
        case org.apache.spark.sql.types.TimestampNTZType =>
          unix_micros(col(tsCol).cast("timestamp"))
        case _ => unix_micros(col(tsCol))
      }
    // floor-division bucket id; epoch-us / bucket-us stays inside the
    // 2^53 exact range for any realistic bucket width, so the double
    // floor is exact
    def bucketOf(msCol: Column): Column =
      floor(msCol / lit(bucketUs.toDouble)).cast("long")

    val p = probe
      .withColumn("__ms", micros(probe, probeTs))
      .withColumn("__bkt", explode(sequence(
        bucketOf(col("__ms") - lit(lookbackUs)),
        bucketOf(col("__ms") + lit(lookaheadUs)))))
    val b = build
      .withColumn("__ms", micros(build, buildTs))
      .withColumn("__bkt", bucketOf(col("__ms")))
      .select(col("__bkt") +: col("__ms").as(s"${buildPrefix}__ms") +:
        build.columns.toSeq.map(c => col(c).as(s"$buildPrefix$c")): _*)

    p.join(b,
        p("__bkt") === b("__bkt") &&
          p.col(key) === b(s"$buildPrefix$key") &&
          b(s"${buildPrefix}__ms") >= p("__ms") - lit(lookbackUs) &&
          b(s"${buildPrefix}__ms") <= p("__ms") + lit(lookaheadUs),
        "inner")
      .drop("__ms", "__bkt", s"${buildPrefix}__ms")
  }

  /** Left windowed aggregate: every probe row, plus aggregates of the
    * build rows inside its window (null aggregates when none). The
    * probe key `probeId` must be unique per probe row.
    */
  def windowAggregate(probe: DataFrame, build: DataFrame, key: String,
                      probeId: String, probeTs: String, buildTs: String,
                      lookbackMs: Long, lookaheadMs: Long,
                      aggs: Seq[Column]): DataFrame = {
    val pairs = intervalJoin(probe, build, key, probeTs, buildTs,
      lookbackMs, lookaheadMs)
    val grouped = pairs.groupBy(col(probeId)).agg(aggs.head, aggs.tail: _*)
    probe.join(grouped, Seq(probeId), "left_outer")
  }
}
