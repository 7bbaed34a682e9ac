package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.crmls.Crmls

/** Two CRMLS streaming jobs batching CONCURRENTLY in one JVM — the
  * scenario behind the per-thread projector cache: the compiled
  * envelope projectors reuse mutable UnsafeRow buffers, so a shared
  * instance across two foreachBatch threads would silently corrupt
  * rows (not throw). Each stream gets its own store/sink but shares
  * every object-level cache (envProjectors, tieHashers); both final
  * tables must match their own per-stream oracle exactly.
  */
class ConcurrentStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def env(pk: String, ts: Long, data: String): String = {
    val d = data.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"data":"$d","uc_pk":"$pk","uc_update_ts":"u$ts","uc_version":"1",""" +
      s""""uc_created_ts":"$ts","uc_row_type":"r","uc_type":"t",""" +
      s""""uc_valid_day":"1","uc_valid_ts":"$ts"}"""
  }

  test("two concurrent streams converge independently (no cross-query corruption)") {
    implicit val sqlCtx = spark.sqlContext
    val nBatches = 6
    val perBatch = 8

    final class Job(val tag: String) {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-cc-$tag").toString
      val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
      val sink = UpsertJoin.newInMemorySink()
      val input = MemoryStream[(String, String)]
      val tagged = input.toDF().toDF("entity", "value")
      var failure: Option[Throwable] = None
      val thread = new Thread(() => {
        try {
          (0 until nBatches).foreach { b =>
            val rows = (0 until perBatch).map { j =>
              val id = b * perBatch + j
              if (j % 4 == 3)
                ("agents", env(s"$tag-A${id % 5}", 100L + id,
                  s"""{"n":"$tag-v$id"}"""))
              else
                ("listings", env(s"$tag-L${id % 7}", 100L + id,
                  s"""{"ListingKeyNumeric":"$tag-LK${id % 7}","ListAgentKeyNumeric":"$tag-A${id % 5}"}"""))
            }
            input.addData(rows: _*)
            CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt")
              .awaitTermination()
          }
        } catch { case t: Throwable => failure = Some(t) }
      })
    }

    val a = new Job("sa")
    val b = new Job("sb")
    a.thread.start(); b.thread.start()
    a.thread.join(); b.thread.join()
    a.failure.foreach(throw _)
    b.failure.foreach(throw _)

    // per-stream oracle: latest listing version per pk, joined to the
    // latest agent version — all content is a pure function of (tag, id)
    def expect(tag: String): Set[(String, String, Long)] = {
      val lastListing = (0 until nBatches * perBatch)
        .filter(_ % 4 != 3).groupBy(_ % 7).map { case (k, ids) => (k, ids.max) }
      val lastAgent = (0 until nBatches * perBatch)
        .filter(_ % 4 == 3).groupBy(_ % 5).map { case (k, ids) => (k, ids.max) }
      lastListing.map { case (k, id) =>
        val agentKey = id % 5
        (s"$tag-L$k", s"$tag-LK$k",
          lastAgent.get(agentKey).map(100L + _).getOrElse(-1L))
      }.toSet
    }
    def got(j: Job): Set[(String, String, Long)] =
      j.sink.snapshot(spark)
        .select(col("l_uc_pk"), col("l_listing_key"),
          coalesce(col("aa_uc_created_ts"), lit(-1L)))
        .as[(String, String, Long)].collect().toSet

    assert(got(a) === expect("sa"), "stream A diverged")
    assert(got(b) === expect("sb"), "stream B diverged")
  }
}
