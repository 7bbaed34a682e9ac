package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.crmls.Crmls
import graft.sources.Streams

/** S11: Kafka round-trip harness — the runnable analogue of the
  * reference's produce/consume smoke tooling (reference
  * `run_code.sh:3-11` replays six topics through the job).
  *
  * Produces `n` synthetic CRMLS envelopes to a topic (batch Kafka
  * write), reads them back from earliest (the same option set the
  * streaming source uses — `Streams.kafkaSourceOptions`), runs the
  * listings projection, and checks count + key integrity.
  *
  * REQUIREMENTS: a reachable broker and the `spark-sql-kafka-0-10`
  * connector on the classpath — standard on any Spark+Kafka cluster,
  * absent from this repo's offline container. Offline, the option
  * wiring and record projection this harness exercises are pinned by
  * `StreamsContractSpec`; this main is the on-cluster closing of the
  * loop.
  *
  * Usage: KafkaRoundTrip <bootstrap> <topic> [n=1000]
  */
object KafkaRoundTrip {

  /** Reference form of one synthetic envelope (kept as the spec's
    * parity oracle for [[envelopeCol]]).
    */
  def envelope(pk: Long): String =
    s"""{"data":"{\\"ListingKeyNumeric\\":\\"LK$pk\\"}","uc_pk":"L$pk",""" +
      s""""uc_update_ts":"u$pk","uc_version":"1","uc_created_ts":"$pk",""" +
      s""""uc_row_type":"r","uc_type":"t","uc_valid_day":"1","uc_valid_ts":"$pk"}"""

  /** Pure-column envelope builder over the SHARED producer
    * ([[Crmls.envelopeCol]] — nested `to_json`, codegen'd, no UDF),
    * byte-identical to [[envelope]] (pinned by KafkaRoundTripSpec).
    */
  def envelopeCol(pk: Column): Column = {
    val s = pk.cast("string")
    Crmls.envelopeCol(
      concat(lit("L"), s), pk,
      to_json(struct(concat(lit("LK"), s).as("ListingKeyNumeric"))))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: KafkaRoundTrip <bootstrap> <topic> [n]")
    val (bootstrap, topic) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 1000
    val spark = GraftSession.local()
    import spark.implicits._

    // produce: one JSON envelope per record, keyed by pk
    spark.range(n)
      .select(col("id").cast("string").as("key"),
        envelopeCol(col("id")).as("value"))
      .write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .save()

    // consume from earliest with the engine's canonical source options,
    // project through the real listings pipeline
    val raw = spark.read.format("kafka")
      .options(Streams.kafkaSourceOptions(bootstrap, topic))
      .load()
    val records = Streams.projectKafkaRecords(raw)
    val listings = Crmls.project(records, Crmls.listings)

    val got = listings.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("l_uc_pk")).as("keys")).head()
    val ok = got.getLong(0) >= n && got.getLong(1) >= n
    println(s"""{"produced":$n,"consumed":${got.getLong(0)},""" +
      s""""distinct_keys":${got.getLong(1)},"pass":$ok}""")
    spark.stop()
    if (!ok) sys.exit(1)
  }
}
