package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Randomized cross-tier convergence: the fused driver merge
  * (driverMerged's hash-map argmax + tieHasher) and the distributed
  * window merge (latestOne over the lazy frames) claim BIT-IDENTICAL
  * winner selection — newer ts wins, state-vs-delta ties fall to the
  * delta, within-batch ties fall to the xxhash64 content order, null
  * ts never replaces. Hand-written cases can't cover that lattice;
  * seeded-random histories with DELIBERATE collisions (small key pool,
  * ts drawn from {1..3} so exact ties are common, duplicate payloads,
  * occasional missing-ts envelopes) can. Each history runs through the
  * fused tier and through the caps-forced distributed tiers; the
  * converged sink tables must be identical row for row.
  */
class TierConvergencePropertySpec extends SparkTestBase {
  import spark.implicits._

  private def env(pk: String, ts: Option[Long], data: String): String = {
    val d = data.replace("\\", "\\\\").replace("\"", "\\\"")
    val tsField = ts.map(t => s""""uc_created_ts":"$t",""").getOrElse("")
    s"""{"data":"$d","uc_pk":"$pk","uc_update_ts":"u","uc_version":"1",""" +
      tsField +
      s""""uc_row_type":"r","uc_type":"t","uc_valid_day":"1","uc_valid_ts":"1"}"""
  }

  private val compareCols = Seq("l_uc_pk", "l_uc_created_ts",
    "l_listing_key", "l_data", "aa_uc_pk", "aa_uc_created_ts", "aa_data",
    "m_resource_record_key", "m_uc_created_ts")

  private def randomHistory(rng: scala.util.Random): Seq[(String, String)] = {
    val n = 12 + rng.nextInt(10)
    (0 until n).map { _ =>
      // small pools force pk collisions; ts in {1..3} forces exact
      // ties; payload pool of 2 forces identical-content ties too
      val ts = if (rng.nextInt(8) == 0) None else Some(1L + rng.nextInt(3))
      rng.nextInt(3) match {
        case 0 =>
          val pk = s"L${rng.nextInt(4)}"
          ("listings", env(pk, ts,
            s"""{"ListingKeyNumeric":"LK${rng.nextInt(3)}","ListAgentKeyNumeric":"A${rng.nextInt(3)}"}"""))
        case 1 =>
          ("agents", env(s"A${rng.nextInt(3)}", ts,
            s"""{"n":"v${rng.nextInt(2)}"}"""))
        case _ =>
          ("media", env(s"M${rng.nextInt(3)}", ts,
            s"""{"ResourceRecordKeyNumeric":"L${rng.nextInt(4)}"}"""))
      }
    }
  }

  private def splits(rng: scala.util.Random,
                     h: Seq[(String, String)]): Seq[Seq[(String, String)]] = {
    val cuts = (0 until 3).map(_ => rng.nextInt(h.size)).distinct.sorted
    (Seq(0) ++ cuts ++ Seq(h.size)).distinct.sliding(2)
      .map { case Seq(a, b) => h.slice(a, b) }.filter(_.nonEmpty).toSeq
  }

  private def converged(batches: Seq[Seq[(String, String)]],
                        distributed: Boolean): Set[Seq[Any]] = {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-prop").toString
    val store =
      if (distributed)
        new CrmlsStream.StateStore(spark, s"$tmp/state",
          localSnapshotMaxRows = 1, idxLocalMaxRows = 1)
      else new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = UpsertJoin.newInMemorySink()
    val input = MemoryStream[(String, String)]
    val tagged = input.toDF().toDF("entity", "value")
    batches.foreach { b =>
      input.addData(b: _*)
      (if (distributed)
         CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt",
           driverBatchMaxRows = 0, driverAffectedMaxRows = 0)
       else CrmlsStream.run(tagged, store, sink, s"$tmp/ckpt"))
        .awaitTermination()
    }
    sink.snapshot(spark).select(compareCols.map(col): _*)
      .collect().map(_.toSeq).toSet
  }

  test("envelope projectors are per-thread instances (UnsafeProjection " +
      "buffers must not be shared across concurrent queries)") {
    val spec = graft.crmls.Crmls.listings
    val here = CrmlsStream.envProjector(spark, spec)
    assert(CrmlsStream.envProjector(spark, spec) eq here,
      "same thread must reuse its compiled projector")
    @volatile var other: org.apache.spark.sql.Row => org.apache.spark.sql.Row = null
    val t = new Thread(() => { other = CrmlsStream.envProjector(spark, spec) })
    t.start(); t.join()
    assert(other ne null)
    assert(!(other eq here),
      "a second thread must get its own projector instance — the " +
        "compiled UnsafeProjection reuses a mutable result buffer")
    // and both evaluate identically
    val row = org.apache.spark.sql.Row(
      """{"data":"{\"ListingKeyNumeric\":\"LK1\"}","uc_pk":"L1","uc_created_ts":"7"}""")
    assert(here(row) === other(row))
  }

  test("fused and distributed tiers converge identically on random " +
      "tie-heavy histories") {
    (1 to 4).foreach { seed =>
      val rng = new scala.util.Random(seed * 7919L)
      val h = randomHistory(rng)
      val bs = splits(rng, h)
      val fused = converged(bs, distributed = false)
      val dist = converged(bs, distributed = true)
      assert(fused === dist,
        s"seed $seed: tiers diverged on history=$h splits=${bs.map(_.size)}")
      assert(fused.nonEmpty, s"seed $seed produced an empty table")
    }
  }
}
