package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * this repo's offline test environment there is no broker, so the
  * CONTRACT is made testable instead: the option sets and the record
  * projection are pure functions, pinned by StreamsContractSpec against
  * the reference's consumer/producer configuration.
  */
object Streams {

  /** Canonical reader options for one topic (reference
    * CRMLSJoiner.scala:94-95: `FlinkKafkaConsumer(topic, props)` with
    * earliest replay — T8 — realized as `startingOffsets`).
    */
  def kafkaSourceOptions(bootstrap: String, topic: String,
                         startingOffsets: String = "earliest"): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets)

  /** S2-shape record projection over the Kafka wire schema (key/value
    * binary + metadata): the reference's
    * `JSONKeyValueDeserializationSchema` keeps key and value; we
    * surface both as strings plus the Kafka metadata columns. Exposed
    * separately so the projection is unit-testable on a Kafka-shaped
    * static frame.
    */
  def projectKafkaRecords(raw: DataFrame): DataFrame =
    raw.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"), col("timestamp"))

  /** S1/S2: one Kafka topic, earliest offsets, value as JSON string. */
  def kafkaJsonSource(spark: SparkSession, bootstrap: String, topic: String,
                      startingOffsets: String = "earliest"): DataFrame =
    projectKafkaRecords(
      spark.readStream
        .format("kafka")
        .options(kafkaSourceOptions(bootstrap, topic, startingOffsets))
        .load())

  /** S5: raw string value only. */
  def kafkaStringSource(spark: SparkSession, bootstrap: String,
                        topic: String): DataFrame =
    kafkaJsonSource(spark, bootstrap, topic).select("value")

  /** Canonical writer options (reference producer props,
    * CRMLSJoiner.scala:504-519: bootstrap servers + target topic).
    */
  def kafkaSinkOptions(bootstrap: String, topic: String,
                       checkpointDir: String): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "topic" -> topic,
      "checkpointLocation" -> checkpointDir)

  /** S7 payload encoding: every column JSON-encoded into the Kafka
    * `value` (the reference emits the joined row as a JSON object
    * string). Pure, so the wire format is unit-testable.
    */
  def encodeKafkaValue(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.map(col): _*)).as("value"))

  /** S7: JSON-encode every column into the Kafka value. */
  def kafkaJsonSink(df: DataFrame, bootstrap: String, topic: String,
                    checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    encodeKafkaValue(df)
      .writeStream
      .format("kafka")
      .options(kafkaSinkOptions(bootstrap, topic, checkpointDir))

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

  /** S6 schema-inference variant — the reference's historical
    * `new Json().deriveSchema()` table source
    * (FlinkJoiner_backup.txt:597-600): derive the JSON schema from a
    * sampled record instead of declaring it, then project every field.
    * Inference is a one-row driver action; the projection itself is the
    * same codegen'd `from_json` as the declared-schema path, so this
    * costs nothing at scan scale. Use the declared `Crmls.EntitySpec`
    * path when the schema is known — inference is for exploration and
    * schema drift detection.
    */
  def inferredJsonTable(raw: DataFrame, valueCol: String = "value"): DataFrame =
    jsonTableWithSchema(raw, inferJsonSchemaDdl(raw, valueCol), valueCol)

  /** Derive the JSON schema DDL from one sampled record of a STATIC
    * frame (inference is an eager action, so it cannot run on a
    * streaming frame — sample the topic's landed history or a file
    * batch instead, then apply the schema to the stream with
    * [[jsonTableWithSchema]]).
    */
  def inferJsonSchemaDdl(sample: DataFrame, valueCol: String = "value"): String = {
    require(!sample.isStreaming,
      "schema inference samples a record (an eager action): infer from a " +
        "static sample, then apply it to the stream via jsonTableWithSchema")
    val row = sample.select(col(valueCol)).filter(col(valueCol).isNotNull)
      .limit(1).collect().headOption.getOrElse(throw new IllegalArgumentException(
        s"cannot infer a JSON schema: no non-null '$valueCol' rows in the sample"))
    sample.sparkSession.range(1)
      .select(schema_of_json(lit(row.getString(0))).as("s")).head().getString(0)
  }

  /** Project a (batch or streaming) frame's JSON `valueCol` through a
    * known schema DDL — the apply side of [[inferJsonSchemaDdl]].
    */
  def jsonTableWithSchema(raw: DataFrame, schemaDdl: String,
                          valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol), schemaDdl, Map.empty[String, String]).as("__row"))
      .select("__row.*")
}
