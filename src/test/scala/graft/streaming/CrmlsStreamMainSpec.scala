package graft.streaming

import graft.SparkTestBase

/** The production CLI contract (reference run_code.sh:3-11): flag
  * parsing, defaults, and rejection — everything about the entry point
  * that doesn't need a broker.
  */
class CrmlsStreamMainSpec extends SparkTestBase {

  private val full = Array(
    "--bootstrap-server", "b1:9092,b2:9092",
    "--state-path", "/tmp/state",
    "--sink-path", "/tmp/sink",
    "--listings-topic", "tl", "--agents-topic", "ta",
    "--oh-topic", "to", "--office-topic", "tf",
    "--media-topic", "tm", "--history-topic", "th")

  test("parses the reference-shaped argument list") {
    val cfg = CrmlsStreamMain.parse(full)
    assert(cfg.bootstrap == "b1:9092,b2:9092")
    assert(cfg.topics == Map("listings" -> "tl", "agents" -> "ta",
      "openhouses" -> "to", "offices" -> "tf", "media" -> "tm",
      "history" -> "th"))
    assert(cfg.checkpointDir == "/tmp/state/ckpt") // defaulted
    assert(cfg.startingOffsets == "earliest")      // T8 replay default
    assert(cfg.changelogDir.isEmpty &&             // retract log opt-in
      cfg.changelogCheckpointEvery == 0)
  }

  test("changelog flags wire the retract log and checkpoint cadence") {
    val cfg = CrmlsStreamMain.parse(full ++ Array(
      "--changelog-dir", "/tmp/state/cl",
      "--changelog-checkpoint-every", "64"))
    assert(cfg.changelogDir.contains("/tmp/state/cl"))
    assert(cfg.changelogCheckpointEvery == 64)
    // cadence without a log dir would silently checkpoint nothing
    val e = intercept[IllegalArgumentException] {
      CrmlsStreamMain.parse(full ++ Array("--changelog-checkpoint-every", "64"))
    }
    assert(e.getMessage.contains("--changelog-dir"))
    // a non-numeric cadence fails with the usage line, like every flag
    val e2 = intercept[IllegalArgumentException] {
      CrmlsStreamMain.parse(full ++ Array(
        "--changelog-dir", "/tmp/cl", "--changelog-checkpoint-every", "x"))
    }
    assert(e2.getMessage.contains("usage:"))
  }

  test("rejects unknown and missing flags with the usage line") {
    val e1 = intercept[IllegalArgumentException] {
      CrmlsStreamMain.parse(full ++ Array("--bogus", "x"))
    }
    assert(e1.getMessage.contains("--bogus"))
    val e2 = intercept[IllegalArgumentException] {
      CrmlsStreamMain.parse(full.dropRight(2)) // no history topic
    }
    assert(e2.getMessage.contains("--history-topic"))
  }

  test("tagged union: six streams, (entity, value) schema, all tags present") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val streams = CrmlsStreamMain.topicFlags.map { case (_, e) =>
      val ms = MemoryStream[String]
      ms.addData(s"payload-$e")
      e -> (ms, ms.toDF().toDF("value"))
    }
    val df = CrmlsStreamMain.taggedUnionOf(
      streams.map { case (e, (_, d)) => e -> d }.toMap)
    assert(df.isStreaming)
    assert(df.columns.toSeq == Seq("entity", "value"))
    val out = df.writeStream.format("memory").queryName("tagged_union_t")
      .outputMode("append").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    out.awaitTermination()
    val rows = spark.table("tagged_union_t")
      .as[(String, String)].collect().toMap
    assert(rows == CrmlsStreamMain.topicFlags.map(_._2)
      .map(e => e -> s"payload-$e").toMap)
  }

  test("kafka leg is wired but environment-blocked in this image") {
    // the offline image has no spark-sql-kafka connector: the binding
    // must fail by ASKING for the kafka format (proving the wiring),
    // not with an unrelated error.
    val cfg = CrmlsStreamMain.parse(full)
    val e = intercept[Exception] {
      CrmlsStreamMain.taggedUnion(spark, cfg)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }
}
