package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming source/sink bindings — the reference's S1-S10 surface
  * (six Kafka consumers with JSON key/value deserialization, a Kafka
  * JSON sink, console sink, socket source, in-memory fixtures;
  * reference CRMLSJoiner.scala:94-95, FlinkJoiner_backup.txt:592-665,
  * WordCount.scala:40).
  *
  * All bindings return plain streaming DataFrames, so every operator in
  * the library composes with them unchanged (stream/table duality:
  * what Flink does with `fromDataStream`/`registerTable`, Spark does by
  * making the streaming frame just another DataFrame).
  *
  * The Kafka formats require the `spark-sql-kafka-0-10` connector on
  * the cluster classpath (standard for any Spark+Kafka deployment); in
  * this repo's offline test environment they compile but are exercised
  * via `MemoryStream`/file sources instead.
  */
object Streams {

  /** S1/S2: one Kafka topic, earliest offsets, value as JSON string
    * (the reference's `JSONKeyValueDeserializationSchema` keeps key and
    * value; we surface value plus Kafka metadata columns).
    */
  def kafkaJsonSource(spark: SparkSession, bootstrap: String, topic: String,
                      startingOffsets: String = "earliest"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .load()
      .select(
        col("key").cast("string").as("key"),
        col("value").cast("string").as("value"),
        col("topic"), col("partition"), col("offset"), col("timestamp"))

  /** S5: raw string value only. */
  def kafkaStringSource(spark: SparkSession, bootstrap: String,
                        topic: String): DataFrame =
    kafkaJsonSource(spark, bootstrap, topic).select("value")

  /** S7: JSON-encode every column into the Kafka value. */
  def kafkaJsonSink(df: DataFrame, bootstrap: String, topic: String,
                    checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)

  /** S8: console sink (the reference's `.print()`). */
  def consoleSink(df: DataFrame): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("console").option("truncate", "false")

  /** S10: socket text source (reference WordCount.scala:40). */
  def socketSource(spark: SparkSession, host: String, port: Int): DataFrame =
    spark.readStream.format("socket")
      .option("host", host).option("port", port).load()

  /** File-drop JSON-lines source: each line is one envelope `value` —
    * the batch-replayable stand-in for a Kafka topic (also how 100 TB
    * of history lands in practice: object-store files, not a broker).
    */
  def jsonLinesSource(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.format("text").load(dir)

  /** T2: bounded-out-of-orderness watermark (reference
    * CustomTimestampExtractor, FlinkJoiner.scala:342-349 — 100 s bound).
    */
  def withLateness(df: DataFrame, tsCol: String,
                   bound: String = "100 seconds"): DataFrame =
    df.withWatermark(tsCol, bound)
}
