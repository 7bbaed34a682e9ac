package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
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

  /** Latest-state storage abstraction: hash-bucketed parquet dirs for
    * tests/local ([[BucketedState]]), MERGE-capable table format in
    * production. A batch rewrites only the buckets containing its keys
    * — the reference's RocksDB state is incremental the same way
    * (CRMLSJoiner.scala:57-59), and untouched buckets' files stay
    * byte-identical.
    */
  final class StateStore(spark: SparkSession, dir: String,
                         nBuckets: Int = 16) extends Serializable {
    private def path(entity: String) = s"$dir/$entity"

    def read(entity: String): Option[DataFrame] =
      BucketedState.readAll(spark, path(entity))

    /** Argmax-merge a delta into the entity's latest-state table.
      *
      * Tie note: state tables keep exactly ONE row per key
      * (`latestOne`, keyed tiebreak), where the reference's batch dedup
      * keeps all rows tying on max ts (`latestAll`). An upsert sink
      * needs a unique key, so ties collapse deterministically here; the
      * batch pipeline preserves the reference's tie-keeping semantics.
      */
    def upsertLatest(entity: String, delta: DataFrame, keyCol: String,
                     tsCol: String): DataFrame = {
      import org.apache.spark.sql.functions.col
      // deterministic tie resolution: newer batch wins over existing
      // state; within one batch, ties fall to a content-hash order —
      // never to shuffle arrival order (task retries must converge).
      def tagged(df: DataFrame, isNew: Int) = df.withColumn("__tie",
        org.apache.spark.sql.functions.struct(
          org.apache.spark.sql.functions.lit(isNew),
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.struct(df.columns.map(
              org.apache.spark.sql.functions.col): _*))))
      val cached = delta.cache()
      try {
        // which buckets does this batch touch? (one tiny job; the delta
        // is cached so the merge below doesn't recompute the projection)
        val touched = cached
          .select(BucketedState.bucketOf(col(keyCol), nBuckets).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
        // merge against ONLY the touched buckets' current rows
        val merged = BucketedState.readBuckets(spark, path(entity), touched) match {
          case Some(cur) => tagged(cur, 0).unionByName(tagged(cached, 1))
          case None => tagged(cached, 1)
        }
        val latest = LatestVersion.latestOne(
          merged, keyCol, tsCol, tiebreakCol = "__tie").drop("__tie")
          .withColumn(BucketedState.BucketColName,
            BucketedState.bucketOf(col(keyCol), nBuckets))
        BucketedState.overwriteBuckets(spark, path(entity), latest, touched)
      } finally cached.unpersist()
      read(entity).get
    }

    /** Set-merge a delta into a bucketed table (distinct rows, no
      * timestamp semantics) — used for secondary-index state.
      */
    def upsertSet(entity: String, delta: DataFrame, bucketKeyCol: String): Unit = {
      import org.apache.spark.sql.functions.col
      val cached = delta.cache()
      try {
        val touched = cached
          .select(BucketedState.bucketOf(col(bucketKeyCol), nBuckets).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
        val merged = (BucketedState.readBuckets(spark, path(entity), touched) match {
          case Some(cur) => cur.unionByName(cached)
          case None => cached
        }).distinct()
          .withColumn(BucketedState.BucketColName,
            BucketedState.bucketOf(col(bucketKeyCol), nBuckets))
        BucketedState.overwriteBuckets(spark, path(entity), merged, touched)
      } finally cached.unpersist()
    }

    /** Bucket-pruned read: only the buckets that could contain the
      * given key values (the state's bucket column must be the same
      * expression the table was written with). At scale this is the
      * difference between probing a few index buckets and scanning the
      * whole state table per micro-batch.
      */
    def readForKeys(entity: String, keys: DataFrame,
                    keyCol: String): Option[DataFrame] = {
      import org.apache.spark.sql.functions.col
      val touched = keys
        .select(BucketedState.bucketOf(col(keyCol), nBuckets).as("__b"))
        .distinct().collect().map(_.getInt(0)).toSeq
      BucketedState.readBuckets(spark, path(entity), touched)
    }
  }

  /** Per-batch merge + affected-key re-join + upsert. Factored out of
    * the streaming query so batch tests can drive it directly.
    *
    * @param taggedBatch columns: entity (string), value (envelope JSON)
    */
  def processBatch(spark: SparkSession, taggedBatch: DataFrame,
                   store: StateStore, sink: UpsertJoin.UpsertSink): Unit = {
    import Crmls._
    val specs = allEntities.map(s => s.name -> s).toMap
    val cached = taggedBatch.cache()
    val scratch = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    try {
      // one action to learn which entities this batch touches (not six
      // per-entity isEmpty probes — driver round-trips per micro-batch
      // are the latency floor of the whole pipeline)
      val present = cached.select("entity").distinct()
        .collect().map(_.getString(0)).toSet
      // 1-2. project + merge each entity's delta into latest-state
      val deltas: Map[String, DataFrame] = specs.flatMap { case (name, spec) =>
        if (!present.contains(name)) None
        else {
          val raw = cached.filter(col("entity") === name).select("value")
          val projected = project(raw, spec)
          store.upsertLatest(name, projected, spec.dedupKeyCol,
            spec.prefix + "uc_created_ts")
          Some(name -> projected)
        }
      }
      if (deltas.isEmpty) return

      def state(spec: Crmls.EntitySpec): DataFrame =
        store.read(spec.name).getOrElse(
          project(spark.emptyDataset[String](
            org.apache.spark.sql.Encoders.STRING).toDF("value"), spec))

      // 2b. maintain the listing reference index: (ref_col, ref_val) ->
      // l_uc_pk for every dimension-join column. The index is bucketed
      // by ref_val, so a dimension delta's reverse lookup reads only
      // the buckets its keys hash to — never the full listing state.
      // Entries are append-only: when a listing's reference CHANGES,
      // the stale entry survives and can only cause a harmless
      // false-positive re-join of that listing.
      deltas.get("listings").foreach { ld =>
        val refEntries = ld.select(col("l_uc_pk"),
            explode(array(ListingRefCols.map(c =>
              struct(lit(c).as("ref_col"), col(c).as("ref_val"))): _*)).as("r"))
          .select(col("r.ref_col"), col("r.ref_val"), col("l_uc_pk"))
          .filter(col("ref_val").isNotNull)
        store.upsertSet("listing_ref_idx", refEntries, bucketKeyCol = "ref_val")
      }

      // 3. affected listing pks: listing deltas + bucket-pruned
      // reverse-index lookups for updated dimension keys. Media and
      // history reference the listing PK itself, so their delta keys
      // ARE candidate pks (nonexistent ones drop in the semi-join
      // below) — no lookup needed at all.
      def affectedVia(deltaName: String, dimKey: String,
                      listingCols: Seq[String]): DataFrame = {
        // cached: evaluated once for the bucket-discovery collect in
        // readForKeys and again in the index join
        val keys = deltas(deltaName).select(col(dimKey).as("__k"))
          .filter(col("__k").isNotNull).distinct().cache()
        scratch += keys
        store.readForKeys("listing_ref_idx", keys, "__k") match {
          case Some(idx) =>
            idx.filter(col("ref_col").isin(listingCols: _*))
              .join(broadcast(keys), col("ref_val") === col("__k"))
              .select(col("l_uc_pk"))
          case None => spark.emptyDataFrame.select(lit("").as("l_uc_pk")).limit(0)
        }
      }
      val fromListings = deltas.get("listings")
        .map(_.select(col("l_uc_pk"))).toSeq
      val fromAgents = deltas.get("agents")
        .map(_ => affectedVia("agents", "a_uc_pk", Seq(
          "l_list_agent_key", "l_buyer_agent_key",
          "l_co_list_agent_key", "l_co_buyer_agent_key"))).toSeq
      val fromOh = deltas.get("openhouses")
        .map(_ => affectedVia("openhouses", "o_listing_key", Seq("l_listing_key"))).toSeq
      val fromOffices = deltas.get("offices")
        .map(_ => affectedVia("offices", "ofc_uc_pk", Seq(
          "l_list_office_key", "l_buyer_office_key",
          "l_co_list_office_key", "l_co_buyer_office_key"))).toSeq
      val fromMedia = deltas.get("media")
        .map(_.select(col("m_resource_record_key").as("l_uc_pk"))).toSeq
      val fromHistory = deltas.get("history")
        .map(_.select(col("h_resource_record_key").as("l_uc_pk"))).toSeq

      // cached: evaluated for the bucket-discovery collect in
      // readForKeys below and again in the left-semi join
      val affected = (fromListings ++ fromAgents ++ fromOh ++ fromOffices ++
        fromMedia ++ fromHistory)
        .reduce(_ unionByName _).filter(col("l_uc_pk").isNotNull).distinct()
        .cache()
      scratch += affected

      // 4. re-join only the affected listings against current dim
      // states; the listing state read is bucket-pruned by the
      // affected pks (listing state is bucketed by l_uc_pk)
      val affectedListings = store
        .readForKeys("listings", affected, "l_uc_pk")
        .getOrElse(state(listings))
        .join(broadcast(affected), Seq("l_uc_pk"), "left_semi")
      val joined = joinAll(affectedListings, state(agents), state(openHouses),
        state(offices), state(media), state(history))
      sink.upsert("l_uc_pk", joined)
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
