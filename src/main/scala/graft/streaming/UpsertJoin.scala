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

  /** Durable keyed upsert sink over parquet: merge = existing snapshot
    * UNION batch, keep the batch's row per key (row_number with a
    * batch-wins flag), rewrite atomically via a temp dir. This is the
    * Delta/Iceberg-`MERGE INTO`-shaped sink realized on plain parquet;
    * at production scale swap the rewrite for a real MERGE — the
    * streaming side is unchanged. Snapshot size is one row per live
    * key, not history.
    */
  final class ParquetUpsertSink(spark: SparkSession, dir: String)
      extends UpsertSink with Serializable {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    private def exists = new java.io.File(dir).exists()

    def upsert(keyCol: String, batch: DataFrame): Unit = {
      val merged =
        if (!exists) batch
        else {
          val cur = spark.read.parquet(dir).withColumn("__new", lit(0))
          val w = Window.partitionBy(col(keyCol))
            .orderBy(col("__new").desc)
          cur.unionByName(batch.withColumn("__new", lit(1)))
            .withColumn("__rn", row_number().over(w))
            .filter(col("__rn") === 1)
            .drop("__new", "__rn")
        }
      val tmp = dir + "__tmp"
      merged.write.mode("overwrite").parquet(tmp)
      spark.read.parquet(tmp).write.mode("overwrite").parquet(dir)
    }

    def snapshot(spark: SparkSession): DataFrame = spark.read.parquet(dir)
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
