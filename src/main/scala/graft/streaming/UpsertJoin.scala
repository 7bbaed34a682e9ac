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
