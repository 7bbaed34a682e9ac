package graft.tools

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkTestBase
import graft.crmls.Crmls
import graft.sources.Streams

/** Offline leg of the S11 round-trip harness: everything the tool runs
  * except the broker hop — the pure-column envelope producer (pinned
  * byte-for-byte against the reference string form) and the
  * consume-side projection over a Kafka-shaped static frame. A cluster
  * run only adds the connector jar and a reachable broker.
  */
class KafkaRoundTripSpec extends SparkTestBase {
  import spark.implicits._

  test("envelopeCol matches the reference string envelope byte-for-byte") {
    val got = spark.range(50)
      .select(col("id"), KafkaRoundTrip.envelopeCol(col("id")).as("v"))
      .as[(Long, String)].collect()
    got.foreach { case (pk, v) =>
      assert(v === KafkaRoundTrip.envelope(pk), s"pk=$pk")
    }
  }

  test("produced envelopes survive the consume projection with key integrity") {
    val n = 100
    // the produce leg's exact output, shaped as the Kafka source would
    // hand it back (binary key/value + metadata)
    val wire = spark.range(n)
      .select(
        col("id").cast("string").cast("binary").as("key"),
        KafkaRoundTrip.envelopeCol(col("id")).cast("binary").as("value"),
        lit("t").as("topic"), lit(0).as("partition"),
        col("id").as("offset"), lit(new Timestamp(1000L)).as("timestamp"))
    val listings = Crmls.project(
      Streams.projectKafkaRecords(wire), Crmls.listings)
    val got = listings.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("l_uc_pk")).as("keys")).head()
    assert(got.getLong(0) === n.toLong)
    assert(got.getLong(1) === n.toLong)
    // the nested data payload round-trips through the double encoding
    val row = listings.filter(col("l_uc_pk") === "L7")
      .select(col("l_listing_key"), col("l_uc_created_ts")).head()
    assert(row.getString(0) === "LK7")
    assert(row.getLong(1) === 7L)
  }
}
