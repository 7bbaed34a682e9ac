package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase

/** No broker ships in this environment, so the Kafka surface is pinned
  * as a CONTRACT: the option sets the reader/writer are built from, the
  * record projection over the Kafka wire schema, and the sink's value
  * encoding (reference CRMLSJoiner.scala:94-95 consumer, :504-519
  * producer). A real cluster run only adds the connector jar — every
  * code path below is the one the builders execute.
  */
class StreamsContractSpec extends SparkTestBase {
  import spark.implicits._

  test("source options: subscribe model, earliest replay default (T8)") {
    val opts = Streams.kafkaSourceOptions("broker:9092", "listings-topic")
    assert(opts === Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "listings-topic",
      "startingOffsets" -> "earliest"))
    // offset override passes through (the reference flips between
    // earliest replay and group offsets)
    assert(Streams.kafkaSourceOptions("b:9092", "t", "latest")("startingOffsets")
      === "latest")
  }

  test("sink options: bootstrap + topic + checkpoint (exactly-once restart)") {
    assert(Streams.kafkaSinkOptions("broker:9092", "out-topic", "/ckpt") === Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "topic" -> "out-topic",
      "checkpointLocation" -> "/ckpt"))
  }

  test("record projection: Kafka wire schema -> string key/value + metadata") {
    // a static frame with the exact schema the kafka source emits
    val wire = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(
          "k1".getBytes, """{"uc_pk":"L1"}""".getBytes, "topicA", 0,
          42L, new Timestamp(1000L), 0)),
      StructType(Seq(
        StructField("key", BinaryType), StructField("value", BinaryType),
        StructField("topic", StringType), StructField("partition", IntegerType),
        StructField("offset", LongType), StructField("timestamp", TimestampType),
        StructField("timestampType", IntegerType))))
    val got = Streams.projectKafkaRecords(wire)
    assert(got.schema.map(f => (f.name, f.dataType)) === Seq(
      ("key", StringType), ("value", StringType), ("topic", StringType),
      ("partition", IntegerType), ("offset", LongType),
      ("timestamp", TimestampType)))
    val row = got.head()
    assert(row.getString(0) === "k1")
    assert(row.getString(1) === """{"uc_pk":"L1"}""")
    assert(row.getString(2) === "topicA" && row.getLong(4) === 42L)
  }

  test("sink encoding: one JSON value column carrying every input field") {
    val enc = Streams.encodeKafkaValue(
      Seq(("L1", 7L, "x")).toDF("l_uc_pk", "n", "s"))
    assert(enc.schema.map(_.name) === Seq("value"))
    assert(enc.head().getString(0) === """{"l_uc_pk":"L1","n":7,"s":"x"}""")
  }

  test("S6 inference guards: streaming frames and empty samples fail loudly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val streaming = MemoryStream[String].toDF().toDF("value")
    val e1 = intercept[IllegalArgumentException] {
      Streams.inferJsonSchemaDdl(streaming)
    }
    assert(e1.getMessage.contains("static sample"))
    val e2 = intercept[IllegalArgumentException] {
      Streams.inferJsonSchemaDdl(Seq.empty[String].toDF("value"))
    }
    assert(e2.getMessage.contains("no non-null"))
  }

  test("S6 inference: schema derived from a sample round-trips the projection") {
    val lines = Seq(
      """{"uc_pk":"L1","uc_created_ts":"100","data":{"k":"v1"},"n":1}""",
      """{"uc_pk":"L2","uc_created_ts":"200","data":{"k":"v2"},"n":2}"""
    ).toDF("value")
    val got = Streams.inferredJsonTable(lines)
    assert(got.columns.toSet === Set("uc_pk", "uc_created_ts", "data", "n"))
    val rows = got.select(col("uc_pk"), col("data.k"), col("n"))
      .as[(String, String, Long)].collect().toSet
    assert(rows === Set(("L1", "v1", 1L), ("L2", "v2", 2L)))
  }
}
