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
  final class ParquetUpsertSink(spark: SparkSession, dir: String,
                                nBuckets: Int = 16)
      extends UpsertSink with Serializable {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    def upsert(keyCol: String, batch: DataFrame): Unit = {
      def tagged(df: DataFrame, isNew: Int) = df.withColumn("__tie",
        struct(lit(isNew), xxhash64(struct(df.columns.map(col): _*))))
      val cached = batch.cache()
      try {
        val touched = cached
          .select(BucketedState.bucketOf(col(keyCol), nBuckets).as("__b"))
          .distinct().collect().map(_.getInt(0)).toSeq.sorted
        val all = BucketedState.readBuckets(spark, dir, touched) match {
          case Some(cur) => tagged(cur, 0).unionByName(tagged(cached, 1))
          case None => tagged(cached, 1)
        }
        val w = Window.partitionBy(col(keyCol)).orderBy(col("__tie").desc)
        val merged = all.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__tie", "__rn")
          .withColumn(BucketedState.BucketColName,
            BucketedState.bucketOf(col(keyCol), nBuckets))
        BucketedState.overwriteBuckets(spark, dir, merged, touched)
      } finally cached.unpersist()
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
