package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The pending-delta (LSM) state tier: fused batches append per-batch
  * winner rows as pending generations instead of rewriting every
  * touched bucket; any file-reading path folds first. These tests pin
  * the crash shapes the design doc claims:
  *  - unfolded pendings + a fresh JVM (new StateStore over the same
  *    dir) recover by the cold fold — LATEST GENERATION wins per key,
  *    never the argmax over file content;
  *  - a batch after the fold sees identical state to a store that
  *    never used pendings (kill switch off);
  *  - stale pendings left by a crash between the fold's bucket swaps
  *    and gen deletion are a content-identical no-op to re-fold.
  */
class PendingStateSpec extends SparkTestBase {
  import spark.implicits._

  private def env(pk: String, ts: Long, data: String): String = {
    val d = data.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"data":"$d","uc_pk":"$pk","uc_update_ts":"u$ts","uc_version":"1",""" +
      s""""uc_created_ts":"$ts","uc_row_type":"r","uc_type":"t",""" +
      s""""uc_valid_day":"1","uc_valid_ts":"$ts"}"""
  }

  private def batch(rows: Seq[(String, String)]) =
    rows.toDF("entity", "value")

  private def agentTs(store: CrmlsStream.StateStore): Map[String, Long] =
    store.read("agents").map(_.select("a_uc_pk", "a_uc_created_ts")
      .as[(String, Long)].collect().toMap).getOrElse(Map.empty)

  test("pendings appear for fused batches and a fresh store folds them") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pend").toString
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out")
    CrmlsStream.processBatch(spark, batch(Seq(
      ("listings", env("L1", 100,
        """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1"}""")),
      ("agents", env("A1", 10, """{"n":"v1"}""")))), store, sink)
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 20, """{"n":"v2"}""")),
      ("agents", env("A2", 5, """{"n":"w1"}""")))), store, sink)
    // fused batches appended pendings (not yet folded)
    val pendDirs = new java.io.File(s"$tmp/state/agents/__pending")
      .listFiles()
    assert(pendDirs != null && pendDirs.exists(_.getName.startsWith("g")),
      "fused batches should append pending generations")
    // a COMPLETELY fresh store over the same dir (the crashed-JVM
    // shape): its first read folds, and the folded state carries the
    // latest generation's winners
    val cold = new CrmlsStream.StateStore(spark, s"$tmp/state")
    assert(agentTs(cold) === Map("A1" -> 20L, "A2" -> 5L))
    // fold consumed the gens
    val after = new java.io.File(s"$tmp/state/agents/__pending").listFiles()
    assert(after == null || !after.exists(_.getName.startsWith("g")))
  }

  test("latest generation wins over argmax-ambiguous file content") {
    // two pendings for the same key with EQUAL timestamps but different
    // payloads: the merge that produced gen 2 already decided against
    // gen 1's row (isNew axis), and that axis is not in the files — the
    // cold fold must pick by generation, not re-run a content tiebreak
    val tmp = java.nio.file.Files.createTempDirectory("graft-pend2").toString
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out")
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 10, """{"n":"first"}""")))), store, sink)
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 10, """{"n":"second"}""")))), store, sink)
    // in-memory truth after batch 2: the argmax kept ONE deterministic
    // winner; whichever it is, the cold fold must agree with it
    val live = store.read("agents").get
      .select("a_data").as[String].collect().toSeq
    val cold = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val folded = cold.read("agents").get
      .select("a_data").as[String].collect().toSeq
    assert(folded === live)
    assert(folded.size === 1)
  }

  test("stale pendings after a folded crash window re-fold to identical state") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pend3").toString
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out")
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 10, """{"n":"v1"}""")))), store, sink)
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 20, """{"n":"v2"}""")))), store, sink)
    // simulate the crash window: copy the pending dir aside, fold (via
    // a cold store read), then restore the stale pendings
    val pendSrc = java.nio.file.Paths.get(s"$tmp/state/agents/__pending")
    val aside = java.nio.file.Paths.get(s"$tmp/aside")
    def copyTree(a: java.nio.file.Path, b: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(a).forEach { p =>
        val t = b.resolve(a.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    copyTree(pendSrc, aside)
    val cold1 = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val folded = agentTs(cold1)
    copyTree(aside, pendSrc) // the stale gens reappear
    val cold2 = new CrmlsStream.StateStore(spark, s"$tmp/state")
    assert(agentTs(cold2) === folded)
    assert(folded === Map("A1" -> 20L))
  }

  test("a crashed (unmarked) pending generation is ignored and swept") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-pend5").toString
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out")
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 10, """{"n":"v1"}""")))), store, sink)
    // simulate a crash mid-append: a gen dir with a (garbage) part
    // file but NO _SUCCESS marker — the sweep must drop it before any
    // fold reads it
    val ghost = java.nio.file.Paths.get(
      s"$tmp/state/agents/__pending/g999")
    java.nio.file.Files.createDirectories(ghost)
    java.nio.file.Files.write(ghost.resolve("part-00000.parquet"),
      "not parquet".getBytes)
    val cold = new CrmlsStream.StateStore(spark, s"$tmp/state")
    assert(agentTs(cold) === Map("A1" -> 10L))
    assert(!java.nio.file.Files.exists(ghost),
      "the unmarked generation must be swept")
  }

  test("over-budget affected fan-out folds pendings before the file probe " +
      "(young store: the index lives only in __pending)") {
    // batch 1 (fused, LSM on) leaves the ENTIRE reverse index as
    // pending generations — the bucket dirs don't exist yet. Batch 2
    // is a dim update whose fan-out budget is forced to 0, so the
    // affected-key resolution takes the DISTRIBUTED fallback, which
    // reads index bucket FILES. Without the pre-read fold those files
    // are missing/incomplete and the agent update silently never
    // reaches the joined row.
    val tmp = java.nio.file.Files.createTempDirectory("graft-pend7").toString
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state")
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out")
    CrmlsStream.processBatch(spark, batch(Seq(
      ("listings", env("L1", 100,
        """{"ListingKeyNumeric":"LK1","ListAgentKeyNumeric":"A1"}""")),
      ("agents", env("A1", 10, """{"n":"v1"}""")))), store, sink)
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 20, """{"n":"v2"}""")))), store, sink,
      driverAffectedMaxRows = 0)
    val joined = sink.snapshot(spark)
      .select("l_uc_pk", "aa_uc_created_ts")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(joined === Map("L1" -> 20L),
      "the dim update must propagate through the fallback's file probe")
  }

  test("kill switch off produces identical converged state") {
    def runAll(tmp: String, pendingOn: Boolean): Map[String, Long] = {
      val store = new CrmlsStream.StateStore(spark, s"$tmp/state",
        pendingEnabled = pendingOn)
      val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out")
      (1 to 12).foreach { i =>
        CrmlsStream.processBatch(spark, batch(Seq(
          ("agents", env(s"A${i % 4}", 100 + i, s"""{"n":"v$i"}""")))),
          store, sink)
      }
      if (pendingOn) {
        // the LSM tier really ran: pendings exist now or were folded by
        // the PendingFoldEvery amortization; either way NO full bucket
        // rewrite happened per batch — pendings must have appeared at
        // some point, so at least assert the fold path is live by
        // reading through a cold store (forces ensureFoldedAuto)
      } else {
        val pend = new java.io.File(s"$tmp/state/agents/__pending")
        assert(pend.listFiles() == null ||
          !pend.listFiles().exists(_.getName.startsWith("g")),
          "kill switch off must never append pending generations")
      }
      // read through a cold store so the pending path (when on) is
      // forced through its fold
      agentTs(new CrmlsStream.StateStore(spark, s"$tmp/state"))
    }
    val expected =
      Map("A1" -> 109L, "A2" -> 110L, "A3" -> 111L, "A0" -> 112L)
    val on = runAll(
      java.nio.file.Files.createTempDirectory("graft-pend4").toString,
      pendingOn = true)
    val off = runAll(
      java.nio.file.Files.createTempDirectory("graft-pend4b").toString,
      pendingOn = false)
    assert(on === expected)
    assert(off === expected)
    assert(on === off)
  }

  test("fused over-cap fallback folds pendings before rewriting base " +
      "(stale pendings must not regress the batch after a restart)") {
    // Accumulate pending generations under the LSM tier, then force a
    // snapshot-cap overflow: the batch stays FUSED (snapshots resident
    // when admission is decided) but refreshFromDelta fails for agents,
    // so usePendings=false and the fused fallback rewrites the base
    // buckets with full merged content. Without the pre-write fold the
    // outstanding pendings (older content, higher __gen than base's -1)
    // would win the next cold fold and silently roll A1 back.
    val tmp = java.nio.file.Files.createTempDirectory("graft-pend6").toString
    // cap of 3: A1..A3 fit; the 4th key overflows
    val store = new CrmlsStream.StateStore(spark, s"$tmp/state",
      localSnapshotMaxRows = 3)
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out")
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 10, """{"n":"v1"}""")),
      ("agents", env("A2", 10, """{"n":"w1"}""")))), store, sink)
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 20, """{"n":"v2"}""")))), store, sink)
    // pendings exist and hold A1@10/A2@10 (gen 0) and A1@20 (gen 1)
    val pend = new java.io.File(s"$tmp/state/agents/__pending")
    assert(pend.listFiles() != null &&
      pend.listFiles().count(_.getName.startsWith("g")) === 2)
    // overflow batch: updates A1 again AND adds two new keys -> 3+2 > 3
    CrmlsStream.processBatch(spark, batch(Seq(
      ("agents", env("A1", 30, """{"n":"v3"}""")),
      ("agents", env("A3", 5, """{"n":"x1"}""")),
      ("agents", env("A4", 6, """{"n":"y1"}""")))), store, sink)
    // the fallback write must have folded + consumed the pendings
    val after = new java.io.File(s"$tmp/state/agents/__pending").listFiles()
    assert(after == null || !after.exists(_.getName.startsWith("g")),
      "fused fallback write must fold outstanding pendings first")
    // cold restart: the batch's updates survive (A1@30, not a pending
    // rollback to A1@20 or A1@10)
    val cold = new CrmlsStream.StateStore(spark, s"$tmp/state")
    assert(agentTs(cold) ===
      Map("A1" -> 30L, "A2" -> 10L, "A3" -> 5L, "A4" -> 6L))
  }
}
