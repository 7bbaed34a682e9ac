package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import scala.collection.concurrent.TrieMap

/** Retract-stream emulation (SURVEY §7.2.1): the reference materializes
  * its join as a Flink retract stream — (false, oldRow) / (true, newRow)
  * pairs (reference CRMLSJoiner.scala:489). Spark has no retractions;
  * the equivalent observable is a keyed UPSERT sink: per micro-batch,
  * join the delta against the dimension views and merge by key. The
  * final table is identical; only the wire format differs.
  */
object UpsertJoin {

  /** Minimal keyed upsert sink. In production this is a
    * `foreachBatch { MERGE INTO }` against a lakehouse table; for tests
    * an in-memory map with the same merge semantics.
    */
  trait UpsertSink {
    def upsert(keyCol: String, batch: DataFrame): Unit
    def snapshot(spark: SparkSession): DataFrame

    /** Bucket count when the sink is hash-bucketed — lets a caller fold
      * sink-bucket discovery into its own discovery job instead of the
      * sink scheduling one more action per batch.
      */
    def bucketCount: Option[Int] = None

    /** Upsert with precomputed touched buckets (for bucketed sinks this
      * is a single write job; `touched` must cover every bucket the
      * batch's keys hash to — a superset is fine, extra buckets are
      * read-checked and left unswapped). Non-bucketed sinks ignore the
      * hint.
      */
    def upsertPrepared(keyCol: String, batch: DataFrame,
                       touched: Seq[Int]): Unit = upsert(keyCol, batch)
  }

  final class InMemorySink(schemaHolder: Array[org.apache.spark.sql.types.StructType])
      extends UpsertSink with Serializable {
    private val rows = TrieMap.empty[Any, Row]
    def upsert(keyCol: String, batch: DataFrame): Unit = {
      schemaHolder(0) = batch.schema
      batch.collect().foreach(r => rows.put(r.getAs[Any](keyCol), r))
    }
    def snapshot(spark: SparkSession): DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.values.toSeq), schemaHolder(0))
  }

  def newInMemorySink(): InMemorySink =
    new InMemorySink(Array(new org.apache.spark.sql.types.StructType()))

  /** Durable keyed upsert sink over hash-bucketed parquet
    * ([[BucketedState]]): merge = touched buckets' snapshot UNION
    * batch, keep one row per key — batch beats state, and ties WITHIN a
    * batch fall to a content-hash order, so the survivor is
    * deterministic under task retries and shuffle reordering. Only the
    * buckets containing batch keys are rewritten (each swapped in by
    * rename — see BucketedState's durability note); untouched buckets'
    * files are byte-identical across batches. This is the
    * Delta/Iceberg-`MERGE INTO`-shaped sink realized on plain parquet;
    * at production scale swap the directory layer for a real MERGE —
    * the streaming side is unchanged. Snapshot size is one row per
    * live key, not history.
    */
  /** @param changelogDir when set, every upsert ALSO appends the
    *   batch's delta as a retract-style changelog — (op=false, oldRow)
    *   / (op=true, newRow) pairs stamped with a monotone batch_id.
    *   This is the wire observable the reference actually emits
    *   (`toRetractStream`, reference CRMLSJoiner.scala:489): the upsert
    *   table is the CONVERGED state, the changelog is the change
    *   stream; replaying the changelog in batch order reconstructs the
    *   snapshot exactly (ChangelogSinkSpec). No-op upserts (key
    *   rewritten with identical content) emit nothing, so the log
    *   carries changes, not traffic. The log is plain append-only
    *   parquet: a replayed batch appends its delta twice (the upsert
    *   table itself stays correct — the merge is idempotent);
    *   production points this at a transactional log (e.g. a table
    *   format's CDF) for exactly-once.
    */
  final class ParquetUpsertSink(spark: SparkSession, dir: String,
                                nBuckets: Int = 16,
                                changelogDir: Option[String] = None)
      extends UpsertSink with Serializable {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    private var epoch: Long = 0L

    override def bucketCount: Option[Int] = Some(nBuckets)

    def upsert(keyCol: String, batch: DataFrame): Unit = {
      val cached = batch.cache()
      try {
        val touched = cached
          .select(BucketedState.bucketOf(col(keyCol), nBuckets).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
        mergeWrite(keyCol, cached, touched, readSchema = None)
      } finally cached.unpersist()
    }

    /** Precomputed-bucket path: no discovery collect, and the current
      * sink rows are read with the batch's schema (the merge schema by
      * construction) — zero inference jobs, ONE write job per batch.
      */
    override def upsertPrepared(keyCol: String, batch: DataFrame,
                                touched: Seq[Int]): Unit =
      if (touched.nonEmpty)
        mergeWrite(keyCol, batch, touched.sorted, Some(batch.schema))

    private def mergeWrite(keyCol: String, batch: DataFrame,
                           touched: Seq[Int],
                           readSchema: Option[org.apache.spark.sql.types.StructType]): Unit = {
      def tagged(df: DataFrame, isNew: Int) = df.withColumn("__tie",
        struct(lit(isNew), xxhash64(struct(df.columns.map(col): _*))))
      val cur = BucketedState.readBuckets(spark, dir, touched, readSchema)
      val all = cur match {
        case Some(c) => tagged(c, 0).unionByName(tagged(batch, 1))
        case None => tagged(batch, 1)
      }
      val w = Window.partitionBy(col(keyCol)).orderBy(col("__tie").desc)
      val merged = all.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .drop("__tie", "__rn")
        .withColumn(BucketedState.BucketColName,
          BucketedState.bucketOf(col(keyCol), nBuckets))
      // changelog append reads the PRE-write generation — it must
      // complete before overwriteBuckets swaps the bucket files
      changelogDir.foreach { clDir =>
        emitChangelog(clDir, keyCol, cur, merged.drop(BucketedState.BucketColName),
          batch)
      }
      BucketedState.overwriteBuckets(spark, dir, merged, touched)
    }

    /** Retract-pair delta for one upsert batch: for every batch key,
      * (false, previous row) if one existed and changed, (true, new
      * row) if inserted or changed. Row-level exceptAll does the
      * change detection — identical rewrites cancel out.
      */
    private def emitChangelog(clDir: String, keyCol: String,
                              cur: Option[DataFrame], merged: DataFrame,
                              batch: DataFrame): Unit = {
      val batchKeys = batch.select(col(keyCol)).distinct()
      val newRows = merged.join(batchKeys, Seq(keyCol), "left_semi")
      val oldRows = cur.map(_.join(batchKeys, Seq(keyCol), "left_semi"))
      val inserts = oldRows.fold(newRows)(o => newRows.exceptAll(o))
        .withColumn("op", lit(true))
      val deletes = oldRows.map(_.exceptAll(newRows).withColumn("op", lit(false)))
      val delta = deletes.fold(inserts)(d => d.unionByName(inserts))
        .withColumn("batch_id", lit(epoch))
      epoch += 1
      delta.write.mode("append").parquet(clDir)
    }

    def snapshot(spark: SparkSession): DataFrame =
      BucketedState.readAll(spark, dir).getOrElse(
        throw new IllegalStateException(s"no state written yet under $dir"))
  }

  /** Drive a streaming fact source through a per-batch join against
    * (re-evaluated) dimension frames and upsert the result.
    *
    * @param fact     streaming DataFrame (the listings delta)
    * @param joinWith given the micro-batch delta, produce the joined
    *                 rows (evaluates dimension views at batch time, so
    *                 dimension updates are picked up on the next batch)
    * @param upsertKey output column to merge on
    */
  def run(fact: DataFrame, joinWith: DataFrame => DataFrame,
          upsertKey: String, sink: UpsertSink,
          checkpointDir: String): StreamingQuery =
    fact.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) sink.upsert(upsertKey, joinWith(batch))
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
