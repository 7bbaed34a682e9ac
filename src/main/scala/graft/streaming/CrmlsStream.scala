package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.crmls.Crmls
import graft.operators.LatestVersion

/** Streaming realization of the reference's production job (SURVEY
  * §7.2(2), reference CRMLSJoiner.scala): six change-capture topics,
  * each reduced to latest-version-per-key, maintained as state, and an
  * 11-way left join whose result updates when EITHER side changes.
  *
  * Architecture (micro-batch, `foreachBatch`):
  *
  *  1. The six raw streams are UNIONED into one tagged stream — one
  *     streaming query, one checkpoint, arrival-order preserved per
  *     micro-batch.
  *  2. Per batch, each entity's delta upserts into its latest-state
  *     table (argmax merge: existing state UNION delta -> window max —
  *     same single-shuffle dedup as batch). State lives in a
  *     [[StateStore]]: parquet-backed here; Delta/Iceberg MERGE at
  *     production scale.
  *  3. Affected listing keys = listings whose pk appears in the batch's
  *     listing delta, PLUS listings referencing any updated dimension
  *     key — resolved against an incrementally-maintained REVERSE
  *     INDEX (`listing_ref_idx`: (ref_col, ref_val) -> l_uc_pk,
  *     bucketed by ref_val). Only those listings are re-joined and
  *     upserted — dimension updates propagate without recomputing the
  *     world, the same observable behavior as Flink's retract stream
  *     (new row supersedes old by l_uc_pk).
  *
  * Driver-job budget — the 100 TB latency constraint: a micro-batch
  * driver that schedules one Spark action per entity per sub-step is
  * the pipeline's bottleneck long before the data is (the reference
  * runs ONE continuously-scheduled dataflow; the micro-batch analog
  * must keep its per-batch job count O(1), not O(entities)). The whole
  * of [[processBatch]] is therefore FOUR actions, independent of how
  * many entities the batch touches:
  *
  *   J1  discovery — one aggregation over the tagged batch computing
  *       every touched-bucket set at once: per-entity state buckets,
  *       reverse-index write buckets, and (for listing/media/history
  *       deltas) the directly-affected listing + sink buckets.
  *   J2  state write — the six argmax merges AND the reverse-index
  *       set-merge union into ONE frame (canonical union schema,
  *       entity discriminator column) written by ONE dynamic-partition
  *       job; the driver then rename-swaps exactly the touched
  *       (entity, bucket) dirs ([[BucketedState.overwriteEntityBuckets]]).
  *   J3  (only when a dimension delta is present) affected-key
  *       discovery — bucket-pruned reverse-index lookup joined to the
  *       dim delta keys; collects just the affected listings' state +
  *       sink BUCKET ids, never the keys themselves.
  *   J4  re-join + sink upsert — affected listing buckets, semi-joined
  *       to the affected keys, through the 11-way join against the
  *       current dim states, merged into the sink's touched buckets
  *       (precomputed in J1/J3, so the sink schedules no discovery
  *       action of its own).
  *
  * All state reads pass static schemas ([[Crmls.projectionSchema]]) —
  * zero parquet-inference jobs.
  *
  * At 100 TB: every state table is hash-bucketed ([[BucketedState]]);
  * a batch WRITES only the buckets its keys touch, and step 3 READS
  * only the index/listing buckets its delta keys hash to — per-batch
  * I/O is proportional to the delta, not to the accumulated state.
  */
object CrmlsStream {

  /** Listing columns that reference dimension keys (agent x4,
    * office x4, open-house listing key) — the reverse-index key set.
    */
  private val ListingRefCols: Seq[String] = Seq(
    "l_list_agent_key", "l_buyer_agent_key",
    "l_co_list_agent_key", "l_co_buyer_agent_key",
    "l_list_office_key", "l_buyer_office_key",
    "l_co_list_office_key", "l_co_buyer_office_key",
    "l_listing_key")

  /** Reverse-index sub-table name and schema: (ref_col, ref_val) ->
    * l_uc_pk, bucketed by ref_val. Entries are append-only: when a
    * listing's reference CHANGES, the stale entry survives and can only
    * cause a harmless false-positive re-join of that listing.
    */
  private val IdxName = "listing_ref_idx"
  private val IdxSchema = StructType(Seq(
    StructField("ref_col", StringType), StructField("ref_val", StringType),
    StructField("l_uc_pk", StringType)))

  /** Which listing delta columns are candidate listing pks directly
    * (media/history reference the listing PK itself, so their delta
    * keys ARE candidate pks — nonexistent ones drop in the semi-join).
    */
  private val DirectPkSources: Seq[(String, String)] = Seq(
    "listings" -> "l_uc_pk",
    "media" -> "m_resource_record_key",
    "history" -> "h_resource_record_key")

  /** Dimension entities whose updates fan out to listings via the
    * reverse index: (entity, delta key column, index ref_cols).
    */
  private val DimLookups: Seq[(String, String, Seq[String])] = Seq(
    ("agents", "a_uc_pk", Seq(
      "l_list_agent_key", "l_buyer_agent_key",
      "l_co_list_agent_key", "l_co_buyer_agent_key")),
    ("openhouses", "o_listing_key", Seq("l_listing_key")),
    ("offices", "ofc_uc_pk", Seq(
      "l_list_office_key", "l_buyer_office_key",
      "l_co_list_office_key", "l_co_buyer_office_key")))

  /** Union schema over the six entity projections + the reverse index
    * (first occurrence wins on shared names — `l_uc_pk` is shared by
    * design). Every J2 write emits exactly these columns, so state
    * files have ONE physical schema regardless of which entities a
    * batch touched; per-entity reads column-prune back down to the
    * entity's own fields.
    */
  private lazy val canonicalFields: Seq[StructField] = {
    val all = Crmls.allEntities.flatMap(s => Crmls.projectionSchema(s).fields) ++
      IdxSchema.fields
    all.foldLeft(Vector.empty[StructField]) { (acc, f) =>
      if (acc.exists(_.name == f.name)) acc else acc :+ f
    }
  }

  private def canonicalize(df: DataFrame, entity: String,
                           bucket: Column): DataFrame = {
    val have = df.columns.toSet
    df.select(
      lit(entity).as(BucketedState.EntityColName) +:
        bucket.as(BucketedState.BucketColName) +:
        canonicalFields.map(f =>
          (if (have(f.name)) col(f.name)
           else lit(null).cast(f.dataType)).as(f.name)): _*)
  }

  private def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

  /** Driver-tier cap for the reverse-index probe: past this many index
    * rows the affected-key resolution falls back to a distributed join.
    */
  private val DriverAffectedMaxRows: Int = 100000

  /** Bucket ids of a bounded key list, computed WITHOUT a job: the
    * projection over a local relation folds at optimize time, so the
    * same xxhash64-based bucket expression the state was written with
    * evaluates driver-side (never reimplement the hash on the JVM side
    * — drift between the two would silently read wrong buckets).
    */
  private def localBuckets(spark: SparkSession, vals: Seq[String],
                           n: Int): Seq[Int] =
    spark.createDataset(vals)(org.apache.spark.sql.Encoders.STRING).toDF("v")
      .select(BucketedState.bucketOf(col("v"), n).as("b"))
      .collect().map(_.getInt(0)).distinct.sorted

  /** Latest-state storage abstraction: hash-bucketed parquet dirs for
    * tests/local ([[BucketedState]]), MERGE-capable table format in
    * production. A batch rewrites only the buckets containing its keys
    * — the reference's RocksDB state is incremental the same way
    * (CRMLSJoiner.scala:57-59), and untouched buckets' files stay
    * byte-identical.
    */
  final class StateStore(spark: SparkSession,
                         private[streaming] val dir: String,
                         private[streaming] val nBuckets: Int = 16)
      extends Serializable {
    private[streaming] def path(entity: String) = s"$dir/$entity"

    def read(entity: String): Option[DataFrame] =
      BucketedState.readAll(spark, path(entity))

    /** Cross-batch snapshot cache for the DIMENSION states: the 11-way
      * join broadcasts each dim once per role per batch, and without a
      * cache every broadcast build re-lists and re-scans the entity's
      * whole bucket tree — that, not the join itself, dominated
      * micro-batch latency. A snapshot is served until a write touches
      * the entity. Dims at or under [[LocalSnapshotMaxRows]] are held
      * as driver-local relations — their broadcast builds then run
      * entirely driver-side, scheduling ZERO tasks per batch (the
      * RocksDB-resident-dim analog); larger dims fall back to a
      * persisted distributed snapshot. A dim too big for either would
      * already be past broadcastability, which is the real scale limit
      * of the join shape (Crmls.joinAll's documented fallback drops
      * the hint).
      */
    @transient private lazy val snapshots =
      scala.collection.mutable.Map.empty[String, Either[Array[Row], DataFrame]]

    /** Lookup-map tier over the local snapshots ([[DimEnrich]]): one
      * driver-built hash map per dimension, shipped via
      * `SparkContext.broadcast` ONCE and reused across batches until
      * the dimension's state changes. This is what lets the J4
      * enrichment probe dims with zero per-batch broadcast-exchange
      * builds (the RocksDB-resident-state analog).
      */
    @transient private lazy val dimMaps = scala.collection.mutable.Map
      .empty[String, org.apache.spark.broadcast.Broadcast[Map[String, Array[Any]]]]

    private def rebuildMap(entity: String, rows: Array[Row],
                           schema: StructType, keyCol: String)
        : org.apache.spark.broadcast.Broadcast[Map[String, Array[Any]]] = {
      dimMaps.remove(entity).foreach(_.destroy())
      val bc = spark.sparkContext.broadcast(
        DimEnrich.buildLookup(rows.iterator, schema, keyCol))
      dimMaps(entity) = bc
      bc
    }

    /** The entity's current lookup map, building (and caching) it from
      * the local snapshot on first use. None = the entity's state is
      * past the local tier — the caller must fall back to the SQL join
      * form. An entity with no state at all gets an empty map (a left
      * join against an empty dim).
      */
    private[streaming] def lookupMap(spec: Crmls.EntitySpec,
        schema: StructType)
        : Option[org.apache.spark.broadcast.Broadcast[Map[String, Array[Any]]]] =
      synchronized {
        dimMaps.get(spec.name).map(Some(_)).getOrElse {
          cachedReadAll(spec.name, schema) match {
            case None =>
              Some(rebuildMap(spec.name, Array.empty, schema, spec.dedupKeyCol))
            case Some(_) => snapshots.get(spec.name) match {
              case Some(Left(rows)) =>
                Some(rebuildMap(spec.name, rows, schema, spec.dedupKeyCol))
              case _ => None
            }
          }
        }
      }

    private[streaming] val LocalSnapshotMaxRows: Int = 200000

    private def localDf(rows: Array[Row],
                        schema: StructType): DataFrame =
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)

    private[streaming] def cachedReadAll(
        entity: String, schema: StructType): Option[DataFrame] =
      synchronized {
        snapshots.get(entity) match {
          case Some(Left(rows)) => Some(localDf(rows, schema))
          case Some(Right(df)) => Some(df)
          case None =>
            BucketedState.readAll(spark, path(entity), Some(schema)).map { df =>
              val probe = df.limit(LocalSnapshotMaxRows + 1).collect()
              if (probe.length <= LocalSnapshotMaxRows) {
                snapshots(entity) = Left(probe)
                localDf(probe, schema)
              } else {
                val p = df.persist()
                snapshots(entity) = Right(p)
                p
              }
            }
        }
      }

    /** In-place refresh of a LOCAL snapshot (and its lookup map) after
      * a batch merged `touchedBuckets`: untouched rows are kept
      * (filtered driver-side — a LocalRelation filter folds at optimize
      * time, no job; when no snapshot exists yet they are bootstrapped
      * from the untouched buckets' files) and the touched buckets' new
      * content is collected from the lazy merged frame (one small job
      * over only those buckets). Returns true when refreshed; false
      * means the entity is past the local tier (caller should
      * invalidate instead). Avoids re-probing the whole bucket tree
      * every batch for a dim that changes by a handful of keys.
      *
      * Runs BEFORE the batch's state write: `merged` reads the
      * pre-write file generation, so on a write failure + replay the
      * recomputation converges to the same rows (idempotent).
      */
    private[streaming] def tryRefreshLocal(
        spec: Crmls.EntitySpec, schema: StructType,
        touchedBuckets: Seq[Int], merged: DataFrame): Boolean =
      synchronized {
        val keyCol = col(spec.dedupKeyCol)
        val untouchedOpt: Option[Array[Row]] = snapshots.get(spec.name) match {
          case Some(Left(rows)) =>
            Some(localDf(rows, schema)
              .filter(!BucketedState.bucketOf(keyCol, nBuckets)
                .isin(touchedBuckets: _*))
              .collect())
          case Some(Right(_)) => None
          case None =>
            val others = BucketedState.listBuckets(path(spec.name))
              .filterNot(touchedBuckets.toSet)
            BucketedState.readBuckets(spark, path(spec.name), others,
                Some(schema)) match {
              case None => Some(Array.empty[Row])
              case Some(df) =>
                val probe = df.limit(LocalSnapshotMaxRows + 1).collect()
                if (probe.length > LocalSnapshotMaxRows) None else Some(probe)
            }
        }
        untouchedOpt match {
          case None => false
          case Some(untouched) =>
            val fresh = merged.collect()
            if (untouched.length + fresh.length <= LocalSnapshotMaxRows) {
              val rows = untouched ++ fresh
              snapshots(spec.name) = Left(rows)
              rebuildMap(spec.name, rows, schema, spec.dedupKeyCol)
              true
            } else { invalidate(spec.name); false }
        }
      }

    /** Drop (and unpersist) a cached snapshot and its lookup map —
      * MUST NOT run while a reader of the current generation is in
      * flight.
      */
    private[streaming] def invalidate(entity: String): Unit = synchronized {
      snapshots.remove(entity).foreach {
        case Right(df) => df.unpersist()
        case Left(_) => ()
      }
      dimMaps.remove(entity).foreach(_.destroy())
    }

    /** Argmax-merge a delta into the entity's latest-state table
      * (standalone single-table form; [[processBatch]] fuses all its
      * merges into one write instead — see the J2 job note above).
      *
      * Tie note: state tables keep exactly ONE row per key
      * (`latestOne`, keyed tiebreak), where the reference's batch dedup
      * keeps all rows tying on max ts (`latestAll`). An upsert sink
      * needs a unique key, so ties collapse deterministically here; the
      * batch pipeline preserves the reference's tie-keeping semantics.
      */
    def upsertLatest(entity: String, delta: DataFrame, keyCol: String,
                     tsCol: String): DataFrame = {
      invalidate(entity)
      val cached = delta.cache()
      try {
        // which buckets does this batch touch? (one tiny job; the delta
        // is cached so the merge below doesn't recompute the projection)
        val touched = cached
          .select(BucketedState.bucketOf(col(keyCol), nBuckets).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
        // merge against ONLY the touched buckets' current rows. The
        // state's column set must match the delta's: a store populated
        // by processBatch carries the canonical UNION schema, and
        // silently unioning a narrower delta against it would either
        // throw deep in the union or — worse — rewrite buckets with a
        // narrower schema and corrupt later schema-less reads. Fail
        // with the actual mismatch instead.
        val merged = BucketedState.readBuckets(spark, path(entity), touched) match {
          case Some(cur) =>
            val curCols = cur.columns.toSet
            val deltaCols = cached.columns.toSet
            require(curCols == deltaCols,
              s"upsertLatest($entity): delta columns $deltaCols do not match " +
                s"existing state columns $curCols — a store written by " +
                "processBatch (union schema) must be updated via processBatch")
            tieTagged(cur, 0).unionByName(tieTagged(cached, 1))
          case None => tieTagged(cached, 1)
        }
        val latest = LatestVersion.latestOne(
          merged, keyCol, tsCol, tiebreakCol = "__tie").drop("__tie")
          .withColumn(BucketedState.BucketColName,
            BucketedState.bucketOf(col(keyCol), nBuckets))
        BucketedState.overwriteBuckets(spark, path(entity), latest, touched)
      } finally cached.unpersist()
      read(entity).get
    }
  }

  /** Deterministic merge-tie tag: newer batch wins over existing state;
    * within one batch, ties fall to a content-hash order — never to
    * shuffle arrival order (task retries must converge).
    */
  private def tieTagged(df: DataFrame, isNew: Int): DataFrame =
    df.withColumn("__tie",
      struct(lit(isNew), xxhash64(struct(df.columns.map(col): _*))))

  /** Per-batch merge + affected-key re-join + upsert — four Spark
    * actions total (see the job-budget scaladoc above). Factored out of
    * the streaming query so batch tests can drive it directly.
    *
    * @param taggedBatch columns: entity (string), value (envelope JSON)
    */
  def processBatch(spark: SparkSession, taggedBatch: DataFrame,
                   store: StateStore, sink: UpsertJoin.UpsertSink): Unit = {
    import Crmls._
    val profile = sys.env.contains("SPARK_GRAFT_SB_PROFILE")
    var t0 = System.nanoTime()
    def mark(phase: String): Unit = if (profile) {
      val t1 = System.nanoTime()
      println(f"[profile] $phase%-12s ${(t1 - t0) / 1e9}%6.2fs")
      t0 = t1
    }
    val storeN = store.nBuckets
    // a micro-batch is tiny relative to its source partitioning (a
    // unioned multi-topic stream easily carries 40 rows in 40+
    // partitions) and every J1 discovery branch re-scans it — coalesce
    // first or task-launch count, not data, dominates the batch. But a
    // CATCH-UP batch (backfill, Trigger.AvailableNow) can carry
    // millions of rows: one task would then parse every envelope
    // serially and one executor would hold the whole cache. Partition
    // count is the zero-job proxy for batch size: narrow sources stay
    // at 1 (the latency regime this path is tuned for), wide sources
    // keep bounded parallelism.
    val srcParts = taggedBatch.rdd.getNumPartitions
    val cached = taggedBatch
      .coalesce(if (srcParts <= 16) 1 else math.min(64, srcParts / 4))
      .cache()
    val scratch = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      val deltas: Map[String, DataFrame] = allEntities.map(s =>
        s.name -> project(
          cached.filter(col("entity") === s.name).select("value"), s)).toMap

      def directKeys(name: String, keyCol: String): DataFrame =
        deltas(name).select(col(keyCol).as("l_uc_pk"))
          .filter(col("l_uc_pk").isNotNull)

      val refEntries = deltas("listings").select(col("l_uc_pk"),
          explode(array(ListingRefCols.map(c =>
            struct(lit(c).as("ref_col"), col(c).as("ref_val"))): _*)).as("r"))
        .select(col("r.ref_col"), col("r.ref_val"), col("l_uc_pk"))
        .filter(col("ref_val").isNotNull)

      // ---- J1: ONE discovery aggregation for every touched-bucket set
      // AND the (bounded) key values the driver tier needs: direct
      // candidate pks and dim delta keys ride the same collect, so no
      // later step schedules a job just to learn a key list. The
      // collect is CAPPED: bucket rows are bounded by construction
      // ((entities + 1) x nBuckets) and the value rows by the driver
      // budget, so the limit detects a catch-up batch whose key lists
      // would OOM the driver. On overflow the bucket legs re-collect
      // alone (bounded; one extra job on the rare path only) and the
      // key lists fall to the distributed J3 fallback — truncated
      // driver lists are never used.
      def tb(tag: String, df: DataFrame, key: Column, n: Int) =
        df.select(lit(tag).as("t"), BucketedState.bucketOf(key, n).as("b"),
          lit(null).cast("string").as("v"))
      def tv(tag: String, df: DataFrame, value: Column) =
        df.select(lit(tag).as("t"), lit(null).cast("int").as("b"),
          value.as("v"))
      val bucketLegs =
        allEntities.map(s => tb(s.name, deltas(s.name), col(s.dedupKeyCol), storeN)) ++
          Seq(tb(IdxName, refEntries, col("ref_val"), storeN))
      val discovery = bucketLegs ++
          DirectPkSources.map { case (n, k) =>
            tv("__pk", directKeys(n, k), col("l_uc_pk")) } ++
          DimLookups.map { case (n, k, _) =>
            tv("__dim:" + n,
              deltas(n).select(col(k).as("__k")).filter(col("__k").isNotNull),
              col("__k")) }
      val discLimit =
        (allEntities.size + 1) * storeN + DriverAffectedMaxRows + 1
      var discRows = discovery.reduce(_ unionByName _).distinct()
        .limit(discLimit).collect()
      val discoveryOverflow = discRows.length >= discLimit
      if (discoveryOverflow) {
        discRows = bucketLegs.reduce(_ unionByName _).distinct().collect()
      }
      val touched: Map[String, Seq[Int]] = discRows.filter(!_.isNullAt(1))
        .groupBy(_.getString(0))
        .map { case (t, rs) => t -> rs.map(_.getInt(1)).toSeq.sorted }
      val directPks: Seq[String] = discRows
        .filter(r => r.getString(0) == "__pk" && !r.isNullAt(2))
        .map(_.getString(2)).toSeq
      val dimKeys: Map[String, Set[String]] = discRows
        .filter(_.getString(0).startsWith("__dim:"))
        .groupBy(_.getString(0).stripPrefix("__dim:"))
        .map { case (n, rs) => n -> rs.map(_.getString(2)).toSet }
      val present = allEntities.map(_.name).filter(touched.contains)
      mark("J1:discover")
      if (present.isEmpty) return

      // ---- merged latest-state frames per present entity: LAZY plans
      // over the PRE-write file generation. Both the persistence write
      // (J2) and the re-join (J4) consume these, which is what lets
      // the two jobs run CONCURRENTLY — neither reads anything the
      // other mutates (the inflight write creates new files only;
      // bucket promotion waits for both).
      val specByName = allEntities.map(s => s.name -> s).toMap
      val mergedByName: Map[String, DataFrame] = present.map { name =>
        val spec = specByName(name)
        val schema = projectionSchema(spec)
        val all = BucketedState.readBuckets(
            spark, store.path(name), touched(name), Some(schema)) match {
          case Some(cur) => tieTagged(cur, 0).unionByName(tieTagged(deltas(name), 1))
          case None => tieTagged(deltas(name), 1)
        }
        name -> LatestVersion.latestOne(all, spec.dedupKeyCol,
          spec.prefix + "uc_created_ts", tiebreakCol = "__tie").drop("__tie")
      }.toMap
      val entityBranches = present.map { name =>
        val spec = specByName(name)
        canonicalize(mergedByName(name), name,
          BucketedState.bucketOf(col(spec.dedupKeyCol), storeN))
      }
      val idxBranch = touched.get(IdxName).map { idxTouched =>
        val merged = (BucketedState.readBuckets(
            spark, store.path(IdxName), idxTouched, Some(IdxSchema)) match {
          case Some(cur) => cur.unionByName(refEntries)
          case None => refEntries
        }).distinct()
        canonicalize(merged, IdxName,
          BucketedState.bucketOf(col("ref_val"), storeN))
      }
      val touchedByEntity = (present.map(n => n -> touched(n)) ++
        idxBranch.map(_ => IdxName -> touched(IdxName))).toMap

      // ---- J3 (dims only): affected listing pks = direct + reverse-
      // index fan-out, resolved against the PRE-write index. Equivalent
      // to post-write: the entries this batch adds come from its own
      // listing delta, and those listings are already in the direct set.
      //
      // TIERED like duplicateClusters: the normal case collects only
      // the PROBED index buckets (bounded: |dim delta keys| buckets,
      // each 1/nBuckets of the index) and resolves the fan-out
      // driver-side — the affected set then rides the plan as a local
      // relation, so its broadcast and both bucket computations
      // schedule ZERO jobs. A probe past DriverAffectedMaxRows falls
      // back to the distributed lookup join, degrading to one extra
      // job, never to driver memory.
      val dims = DimLookups.filter(d => present.contains(d._1))
      val affectedLocalPks: Option[Seq[String]] =
        if (discoveryOverflow) None // key lists overflowed the driver budget
        else if (dims.isEmpty) Some(directPks.distinct)
        else {
          val lookupBuckets = dims.flatMap(d => touched(d._1)).distinct
          BucketedState.readBuckets(spark, store.path(IdxName),
              lookupBuckets, Some(IdxSchema)) match {
            case None => Some(directPks.distinct)
            case Some(idx) =>
              val probe = idx.limit(DriverAffectedMaxRows + 1).collect()
              if (probe.length > DriverAffectedMaxRows) None
              else {
                val fanout = dims.flatMap { case (name, _, refCols) =>
                  val keys = dimKeys.getOrElse(name, Set.empty)
                  val rc = refCols.toSet
                  probe.iterator
                    .filter(r => rc.contains(r.getString(0)) &&
                      keys.contains(r.getString(1)))
                    .map(_.getString(2))
                }
                Some((directPks ++ fanout).distinct)
              }
          }
        }
      val affectedOpt: Option[(DataFrame, Seq[Int], Seq[Int])] =
        affectedLocalPks match {
          case Some(pks) if pks.isEmpty => None
          case Some(pks) =>
            val affDf = spark.createDataset(pks)(
              org.apache.spark.sql.Encoders.STRING).toDF("l_uc_pk")
            Some((affDf, localBuckets(spark, pks, storeN),
              sink.bucketCount.map(n => localBuckets(spark, pks, n))
                .getOrElse(Nil)))
          case None =>
            // distributed fallback: lookup join + bucket collect
            val direct = DirectPkSources.filter(p => present.contains(p._1))
              .map { case (n, k) => directKeys(n, k) }
            val idxRead = BucketedState.readBuckets(spark, store.path(IdxName),
              dims.flatMap(d => touched(d._1)), Some(IdxSchema))
            val fanout = idxRead.toSeq.flatMap { idx =>
              dims.map { case (name, keyCol, refCols) =>
                val keys = deltas(name).select(col(keyCol).as("__k"))
                  .filter(col("__k").isNotNull).distinct()
                idx.filter(col("ref_col").isin(refCols: _*))
                  .join(broadcast(keys), col("ref_val") === col("__k"))
                  .select(col("l_uc_pk"))
              }
            }
            if (direct.isEmpty && fanout.isEmpty) None
            else {
              val aff = (direct ++ fanout).reduce(_ unionByName _)
                .filter(col("l_uc_pk").isNotNull).distinct().cache()
              scratch += aff
              val pairs = aff.select(
                  BucketedState.bucketOf(col("l_uc_pk"), storeN).as("sb"),
                  sink.bucketCount.map(n =>
                    BucketedState.bucketOf(col("l_uc_pk"), n))
                    .getOrElse(lit(-1)).as("kb"))
                .distinct().collect()
              Some((aff, pairs.map(_.getInt(0)).distinct.sorted,
                pairs.map(_.getInt(1)).distinct.sorted))
            }
        }
      mark("J3:affected")

      // ---- dim snapshot + lookup-map maintenance, BEFORE the join:
      // dims whose state changed this batch fold their merged content
      // into the local snapshot and broadcast map NOW (one small job
      // each over only the touched buckets — the job the post-write
      // refresh used to run anyway), so J4 probes post-merge values
      // with ZERO per-batch broadcast-exchange builds. Unchanged dims
      // serve their cached map untouched.
      val refreshed: Set[String] = DimEnrich.dimEntities
        .filter(s => present.contains(s.name))
        .filter(spec => store.tryRefreshLocal(spec, projectionSchema(spec),
          touched(spec.name), mergedByName(spec.name)))
        .map(_.name).toSet
      // the map-enrichment tier applies only when EVERY dim resolves a
      // lookup map with post-merge content; any dim past the local
      // tier falls the whole join back to the joinAll broadcast plan
      val dimMapsOpt = {
        val ms = DimEnrich.dimEntities.flatMap { spec =>
          if (present.contains(spec.name) && !refreshed.contains(spec.name))
            None
          else store.lookupMap(spec, projectionSchema(spec))
            .map(spec.name -> _)
        }
        if (ms.size == DimEnrich.dimEntities.size) Some(ms.toMap) else None
      }
      mark("J3:dimmaps")

      // ---- J2 ∥ J4: launch the inflight state write on a worker
      // thread, run the re-join + sink merge on this one. Neither
      // mutates live files; promotion + cache invalidation happen after
      // both so no path-based open can land on a moved file. Crash
      // consistency is unchanged: an exception on either side leaves
      // the previous state generation live, the batch replays, and both
      // merges are idempotent keyed upserts.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val unionFrame = (entityBranches ++ idxBranch.toSeq).reduce(_ unionByName _)
      val stateWrite = Future {
        BucketedState.writeEntityInflight(spark, store.dir, unionFrame,
          touchedByEntity)
      }
      try {
        affectedOpt.foreach { case (affected, affBuckets, sinkBuckets) =>
          // touched listing buckets come from the lazy merged frame
          // (this batch's updates included); untouched-but-affected
          // buckets read from disk — files this batch never replaces
          val lSchema = projectionSchema(listings)
          val listingParts = BucketedState.readBuckets(
              spark, store.path("listings"),
              affBuckets.filterNot(touched.getOrElse("listings", Nil).toSet),
              Some(lSchema)).toSeq ++ mergedByName.get("listings").toSeq
          if (listingParts.nonEmpty) {
            val affectedListings = listingParts.reduce(_ unionByName _)
              .join(broadcast(affected), Seq("l_uc_pk"), "left_semi")
            // dim state for the fallback SQL join: cached snapshot
            // minus touched buckets, plus the lazy merged frame — but a
            // dim already refreshed above serves its (post-merge)
            // snapshot directly
            def fullState(spec: Crmls.EntitySpec): DataFrame = {
              val schema = projectionSchema(spec)
              val snap = store.cachedReadAll(spec.name, schema)
              if (!present.contains(spec.name) ||
                  refreshed.contains(spec.name))
                snap.getOrElse(emptyOf(spark, schema))
              else {
                val untouched = snap
                  .map(_.filter(!BucketedState.bucketOf(
                    col(spec.dedupKeyCol), storeN)
                    .isin(touched(spec.name): _*)))
                  .getOrElse(emptyOf(spark, schema))
                untouched.unionByName(mergedByName(spec.name))
              }
            }
            val joined = dimMapsOpt match {
              case Some(maps) => DimEnrich.enrich(affectedListings, maps)
              case None => joinAll(affectedListings, fullState(agents),
                fullState(openHouses), fullState(offices), fullState(media),
                fullState(history))
            }
            sink.upsertPrepared("l_uc_pk", joined, sinkBuckets)
          }
        }
        mark("J4:join-sink")
      } finally Await.ready(stateWrite, Duration.Inf)
      Await.result(stateWrite, Duration.Inf) // rethrow a write failure
      // dims were refreshed pre-join; anything not refreshable there
      // (past the local tier) is invalidated and re-probed on demand
      BucketedState.promoteEntityBuckets(store.dir, touchedByEntity)
      present.filterNot(refreshed).foreach(store.invalidate)
      mark("J2:promote")
    } finally {
      scratch.foreach(_.unpersist())
      cached.unpersist()
    }
  }

  /** Bind the per-batch logic to a streaming tagged source. */
  def run(tagged: DataFrame, store: StateStore, sink: UpsertJoin.UpsertSink,
          checkpointDir: String): StreamingQuery =
    tagged.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch.sparkSession, batch, store, sink)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
