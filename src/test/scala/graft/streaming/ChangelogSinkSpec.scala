package graft.streaming

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The retract-stream observable (reference CRMLSJoiner.scala:489
  * `toRetractStream`): the upsert sink's optional changelog must emit
  * (false, oldRow)/(true, newRow) pairs whose in-order replay
  * reconstructs the converged snapshot exactly.
  */
class ChangelogSinkSpec extends SparkTestBase {
  import spark.implicits._

  test("changelog replay reconstructs the snapshot; updates emit retract pairs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl").toString
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 8, changelogDir = Some(s"$tmp/cl"))

    sink.upsert("k", Seq(("a", 1L, "v1"), ("b", 1L, "v1")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("a", 2L, "v2"), ("c", 1L, "v1")).toDF("k", "ts", "p"))
    // no-op rewrite: identical content must emit NO changelog rows
    sink.upsert("k", Seq(("b", 1L, "v1")).toDF("k", "ts", "p"))

    val log = spark.read.parquet(s"$tmp/cl")
      .select("batch_id", "op", "k", "ts", "p")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        (r.getString(2), r.getLong(3), r.getString(4))))

    // batch 0: two inserts, no retracts
    assert(log.filter(_._1 == 0).toSet ===
      Set((0L, true, ("a", 1L, "v1")), (0L, true, ("b", 1L, "v1"))))
    // batch 1: a's update = retract pair; c = plain insert
    assert(log.filter(_._1 == 1).toSet ===
      Set((1L, false, ("a", 1L, "v1")), (1L, true, ("a", 2L, "v2")),
        (1L, true, ("c", 1L, "v1"))))
    // batch 2: idempotent rewrite emitted nothing
    assert(!log.exists(_._1 == 2))

    // replay: apply batches in order into a keyed map — false removes
    // the row, true upserts it; the result must equal the sink snapshot
    val replayed = scala.collection.mutable.Map.empty[String, (String, Long, String)]
    log.sortBy(_._1).foreach {
      case (_, true, row) => replayed(row._1) = row
      case (_, false, row) => if (replayed.get(row._1).contains(row)) replayed.remove(row._1)
    }
    val snapshot = sink.snapshot(spark).select("k", "ts", "p")
      .collect().map(r => r.getString(0) -> ((r.getString(0), r.getLong(1), r.getString(2))))
      .toMap
    assert(replayed.toMap === snapshot)
  }

  test("restarted sink resumes batch_id past the existing log") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-rs").toString
    val first = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 8, changelogDir = Some(s"$tmp/cl"))
    first.upsert("k", Seq(("a", 1L, "v1")).toDF("k", "ts", "p"))
    first.upsert("k", Seq(("a", 2L, "v2")).toDF("k", "ts", "p"))

    // a NEW sink instance over the same dirs (process restart): its
    // batches must stamp AFTER the existing log, or a batch_id-ordered
    // replay would put this update before the old tail and lose it
    val restarted = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 8, changelogDir = Some(s"$tmp/cl"))
    restarted.upsert("k", Seq(("a", 3L, "v3")).toDF("k", "ts", "p"))

    val log = spark.read.parquet(s"$tmp/cl")
      .select("batch_id", "op", "k", "ts", "p")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        (r.getString(2), r.getLong(3), r.getString(4))))
    assert(log.map(_._1).max === 2L,
      s"restart must continue at batch 2, got ${log.map(_._1).toSet}")

    val replayed = scala.collection.mutable.Map.empty[String, (String, Long, String)]
    log.sortBy(_._1).foreach {
      case (_, true, row) => replayed(row._1) = row
      case (_, false, row) => if (replayed.get(row._1).contains(row)) replayed.remove(row._1)
    }
    assert(replayed.toMap === Map("a" -> (("a", 3L, "v3"))))
  }

  test("LSM (delta) mode emits one retract-pair batch per compaction window") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-lsm").toString
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 8, changelogDir = Some(s"$tmp/cl"), deltaCompactEvery = 2)

    // window 1 (two appends -> compaction): a v1->v2 collapses to the
    // window's NET change (insert a@v2, insert b); intermediate v1
    // never reaches the log — the documented compaction granularity
    sink.upsert("k", Seq(("a", 1L, "v1"), ("b", 1L, "v1")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("a", 2L, "v2")).toDF("k", "ts", "p"))
    sink.awaitCompaction()
    val w1 = spark.read.parquet(s"$tmp/cl")
      .select("batch_id", "op", "k", "ts", "p")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        (r.getString(2), r.getLong(3), r.getString(4))))
    assert(w1.toSet === Set(
      (0L, true, ("a", 2L, "v2")), (0L, true, ("b", 1L, "v1"))))

    // window 2: an update against compacted base -> retract pair; a
    // no-op rewrite of b emits nothing
    sink.upsert("k", Seq(("a", 3L, "v3")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("b", 1L, "v1")).toDF("k", "ts", "p"))
    sink.awaitCompaction()
    val log = spark.read.parquet(s"$tmp/cl")
      .select("batch_id", "op", "k", "ts", "p")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        (r.getString(2), r.getLong(3), r.getString(4))))
    assert(log.filter(_._1 == 1L).toSet === Set(
      (1L, false, ("a", 2L, "v2")), (1L, true, ("a", 3L, "v3"))))

    // replay reconstructs the compacted snapshot
    val replayed = scala.collection.mutable.Map.empty[String, (String, Long, String)]
    log.sortBy(_._1).foreach {
      case (_, true, row) => replayed(row._1) = row
      case (_, false, row) =>
        if (replayed.get(row._1).contains(row)) replayed.remove(row._1)
    }
    val snapshot = sink.snapshot(spark).select("k", "ts", "p")
      .collect().map(r => r.getString(0) ->
        ((r.getString(0), r.getLong(1), r.getString(2)))).toMap
    assert(replayed.toMap === snapshot)
  }

  test("column-family changelog: shared batch stamp, join-time reassembly " +
      "equals the row-major CDC feed batch for batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-cf").toString
    val fams: Seq[(String, String => Boolean)] =
      Seq("hot" -> ((c: String) => c == "ts"))
    val cf = new ColumnFamilySink(spark, s"$tmp/cf", fams, nBuckets = 4,
      changelogDir = Some(s"$tmp/cfcl"))
    val rm = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/rm",
      nBuckets = 4, changelogDir = Some(s"$tmp/rmcl"))

    // identical mixed workload: full rows (split across families),
    // a cross-family update, a partial (single-family) update, a new
    // key arriving via partial, and a no-op rewrite
    def drive(s: UpsertJoin.UpsertSink): Unit = {
      s.upsert("k", Seq(("a", 1L, "v1"), ("b", 1L, "w1")).toDF("k", "ts", "p"))
      s.upsert("k", Seq(("a", 2L, "v2")).toDF("k", "ts", "p"))          // both fams
      s.upsertPartialUnique("k", Seq(("b", 9L)).toDF("k", "ts"),        // hot only
        Seq(0, 1, 2, 3))
      s.upsertPartialUnique("k", Seq(("c", "x1")).toDF("k", "p"),       // base only, new key
        Seq(0, 1, 2, 3))
      s.upsert("k", Seq(("a", 2L, "v2")).toDF("k", "ts", "p"))          // no-op
    }
    drive(cf)
    drive(rm)

    // one stamp per logical batch, shared across the family logs: the
    // cross-family update (batch 1) appears in BOTH family logs under
    // the SAME id; the hot-only update (batch 2) only in hot's
    val hotIds = spark.read.parquet(s"$tmp/cfcl/cf_hot")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    val baseIds = spark.read.parquet(s"$tmp/cfcl/cf_base")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(hotIds === Set(0L, 1L, 2L), s"hot log batches: $hotIds")
    assert(baseIds === Set(0L, 1L, 3L), s"base log batches: $baseIds")

    // replay the row-major log to batch b (the pinned replay rule)
    def rmAt(b: Long): Map[String, (Option[Long], Option[String])] = {
      val log = spark.read.parquet(s"$tmp/rmcl")
        .filter(col("batch_id") <= b)
        .select("batch_id", "op", "k", "ts", "p").collect()
        .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getString(4))))
      val m = scala.collection.mutable.Map
        .empty[String, (Option[Long], Option[String])]
      log.sortBy(e => (e._1, e._2)).foreach {
        case (_, true, k, ts, p) => m(k) = (ts, p)
        case (_, false, k, ts, p) =>
          if (m.get(k).contains((ts, p))) m.remove(k)
      }
      m.toMap
    }
    def cfAt(b: Long): Map[String, (Option[Long], Option[String])] =
      cf.changelogSnapshotAt(spark, b).select("k", "ts", "p").collect()
        .map(r => r.getString(0) -> ((
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getString(2))))).toMap
    (0L to 4L).foreach { b =>
      assert(cfAt(b) === rmAt(b), s"reassembly diverged at batch $b")
    }
    // and the final reassembly equals the live cf table
    val live = cf.snapshot(spark).select("k", "ts", "p").collect()
      .map(r => r.getString(0) -> ((
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2))))).toMap
    assert(cfAt(4L) === live)

    // restart recovery: a fresh instance stamps past every family log
    val cf2 = new ColumnFamilySink(spark, s"$tmp/cf", fams, nBuckets = 4,
      changelogDir = Some(s"$tmp/cfcl"))
    cf2.upsert("k", Seq(("a", 5L, "v5")).toDF("k", "ts", "p"))
    val afterIds = spark.read.parquet(s"$tmp/cfcl/cf_hot")
      .select("batch_id").distinct().collect().map(_.getLong(0)).toSet
    assert(afterIds.max === 4L,
      s"restarted cf sink must stamp 4 next, got $afterIds")
  }

  test("checkpoint + schema widening: a column born AFTER the anchor " +
      "checkpoint folds correctly across the ckpt/tail union") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-ckw").toString
    val cl = s"$tmp/cl"
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 4, changelogDir = Some(cl), changelogCheckpointEvery = 2)
    // batches 0,1 carry (k, ts, p); checkpoint lands at 1. Batch 2
    // widens the schema with column q via a partial upsert — the
    // checkpoint has no q, the tail does
    sink.upsert("k", Seq(("a", 1L, "v1"), ("b", 1L, "w1")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("a", 2L, "v2")).toDF("k", "ts", "p"))
    assert(UpsertJoin.listChangelogCheckpoints(cl) === Seq(1L))
    sink.upsertPartialUnique("k", Seq(("a", "x1")).toDF("k", "q"),
      Seq(0, 1, 2, 3))
    def at(b: Long): Map[String, (Long, String, Option[String])] = {
      val df = sink.snapshotAt("k", b)
      val cols = df.columns.toSet
      df.select(col("k"), col("ts"), col("p"),
          if (cols("q")) col("q") else lit(null).cast("string").as("q"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
          if (r.isNullAt(3)) None else Some(r.getString(3))))).toMap
    }
    // anchored at ckpt 1, tail = batch 2: a gains q, keeps ts/p; b
    // (only in the checkpoint) gets a typed NULL q
    assert(at(2L) === Map(
      "a" -> ((2L, "v2", Some("x1"))),
      "b" -> ((1L, "w1", None))))
    // as-of the checkpoint itself: no q column materializes values
    assert(at(1L) === Map(
      "a" -> ((2L, "v2", None)), "b" -> ((1L, "w1", None))))
    // and the live table agrees with the last batch
    val live = sink.snapshot(spark).select("k", "ts", "p", "q").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getString(3))))).toMap
    assert(at(2L) === live)
  }

  test("column-family changelog checkpoints: per-family anchors, " +
      "reassembly equals the pure-replay reassembly at every batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-cfck").toString
    val fams: Seq[(String, String => Boolean)] =
      Seq("hot" -> ((c: String) => c == "ts"))
    val ck = new ColumnFamilySink(spark, s"$tmp/ck", fams, nBuckets = 4,
      changelogDir = Some(s"$tmp/ckcl"), changelogCheckpointEvery = 2)
    val pr = new ColumnFamilySink(spark, s"$tmp/pr", fams, nBuckets = 4,
      changelogDir = Some(s"$tmp/prcl"))
    def drive(s: UpsertJoin.UpsertSink): Unit = {
      s.upsert("k", Seq(("a", 1L, "v1"), ("b", 1L, "w1")).toDF("k", "ts", "p"))
      s.upsert("k", Seq(("a", 2L, "v2")).toDF("k", "ts", "p"))
      s.upsertPartialUnique("k", Seq(("b", 9L)).toDF("k", "ts"),
        Seq(0, 1, 2, 3))
      s.upsertPartialUnique("k", Seq(("c", "x1")).toDF("k", "p"),
        Seq(0, 1, 2, 3))
      s.upsert("k", Seq(("a", 3L, "v3")).toDF("k", "ts", "p"))
    }
    drive(ck)
    drive(pr)
    // cadence 2 = checkpoint on odd shared stamps each family saw:
    // hot emits at 0,1,2,4 -> ckpt 1; base at 0,1,3,4 -> ckpts 1,3
    assert(UpsertJoin.listChangelogCheckpoints(s"$tmp/ckcl/cf_hot")
      .nonEmpty, "hot family must have a checkpoint")
    assert(UpsertJoin.listChangelogCheckpoints(s"$tmp/ckcl/cf_base")
      .nonEmpty, "base family must have a checkpoint")
    def view(s: ColumnFamilySink, b: Long): Map[String, (Option[Long], Option[String])] =
      s.changelogSnapshotAt(spark, b).select("k", "ts", "p").collect()
        .map(r => r.getString(0) -> ((
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getString(2))))).toMap
    (0L to 4L).foreach { b =>
      assert(view(ck, b) === view(pr, b),
        s"checkpoint-anchored reassembly diverged at batch $b")
    }
  }

  test("column-family changelog refuses delta mode (shared stamp would tear)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-cfx").toString
    val e = intercept[IllegalArgumentException] {
      new ColumnFamilySink(spark, s"$tmp/cf",
        Seq("hot" -> ((c: String) => c == "ts")), nBuckets = 4,
        deltaCompactEvery = 2, changelogDir = Some(s"$tmp/cl"))
    }
    assert(e.getMessage.contains("merge-on-write"))
  }

  test("snapshotAt reconstructs any point in history; last == live table") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-tt").toString
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 8, changelogDir = Some(s"$tmp/cl"))
    sink.upsert("k", Seq(("a", 1L, "v1"), ("b", 1L, "w1")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("a", 2L, "v2"), ("c", 1L, "x1")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("b", 9L, "w9")).toDF("k", "ts", "p"))

    def at(b: Long): Map[String, (Long, String)] =
      sink.snapshotAt("k", b).select("k", "ts", "p").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap

    // mid-history points DIVERGE from the live table as they must
    assert(at(0L) === Map("a" -> ((1L, "v1")), "b" -> ((1L, "w1"))))
    assert(at(1L) === Map("a" -> ((2L, "v2")), "b" -> ((1L, "w1")),
      "c" -> ((1L, "x1"))))
    // last batch == live snapshot, row for row
    val live = sink.snapshot(spark).select("k", "ts", "p").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(at(2L) === live)
    // a replayed delta (crash between changelog append and promote
    // re-appends under the NEXT stamp, pre-images unchanged) must fold
    // to the same rows: simulate by appending batch 2's pairs again
    val dup = spark.read.parquet(s"$tmp/cl").filter(col("batch_id") === 2L)
      .withColumn("batch_id", lit(3L))
      .withColumn("cl_shard", lit(3L / UpsertJoin.ChangelogShardEvery))
    dup.write.mode("append").partitionBy("cl_shard").parquet(s"$tmp/cl")
    assert(at(3L) === live, "duplicate replay delta must not change the fold")
  }

  test("changelog checkpoints: snapshotAt matches ground truth at every " +
      "point; torn/missing checkpoints fall back; prune retires shards " +
      "and refuses pre-floor travel") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-ckpt").toString
    val cl = s"$tmp/cl"
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 4, changelogDir = Some(cl), changelogCheckpointEvery = 4)
    // 21 batches (0..20): `a` updates every batch, `b` arrives at 5 —
    // enough history to cross a shard boundary (ShardEvery = 16) so the
    // prune below can retire a whole shard dir
    (0 to 20).foreach { i =>
      val rows = if (i == 5) Seq(("a", i.toLong, s"v$i"), ("b", 1L, "w1"))
                 else Seq(("a", i.toLong, s"v$i"))
      sink.upsert("k", rows.toDF("k", "ts", "p"))
    }
    def expected(b: Long): Map[String, (Long, String)] =
      Map("a" -> ((b, s"v$b"))) ++
        (if (b >= 5) Map("b" -> ((1L, "w1"))) else Map.empty)
    def at(b: Long): Map[String, (Long, String)] =
      sink.snapshotAt("k", b).select("k", "ts", "p").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap

    // cadence 4 => checkpoints at batches 3, 7, 11, 15, 19
    assert(UpsertJoin.listChangelogCheckpoints(cl) === Seq(3L, 7L, 11L, 15L, 19L))
    // every history point folds correctly, whichever checkpoint (or
    // none, for b < 3) anchors the fold
    (0L to 20L).foreach(b => assert(at(b) === expected(b), s"at batch $b"))

    // a torn checkpoint write (crash mid-dump) stays dot-prefixed and
    // invisible; a MISSING checkpoint just means the fold anchors one
    // checkpoint earlier — correctness never depends on one existing
    val torn = new java.io.File(s"$cl/_ckpt/.tmp-99")
    torn.mkdirs()
    java.nio.file.Files.write(new java.io.File(torn, "junk").toPath,
      Array[Byte](1, 2, 3))
    def rmTree(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rmTree)
      f.delete(): Unit
    }
    rmTree(new java.io.File(s"$cl/_ckpt/ckpt=11"))
    assert(UpsertJoin.listChangelogCheckpoints(cl) === Seq(3L, 7L, 15L, 19L))
    assert(at(13L) === expected(13L), "fold must fall back to ckpt 7")

    // prune: keep from the newest checkpoint <= 20 (= 19). Shard 0
    // (batches 0..15, all < 19) is retired; shard 1 and ckpt 19 stay
    assert(UpsertJoin.pruneChangelogBefore(cl, 20L) === Some(19L))
    assert(!new java.io.File(s"$cl/cl_shard=0").exists(), "shard 0 retired")
    assert(new java.io.File(s"$cl/cl_shard=1").exists(), "shard 1 kept")
    assert(UpsertJoin.listChangelogCheckpoints(cl) === Seq(19L))
    assert(UpsertJoin.changelogFloor(cl) === 19L)
    // points >= the floor still serve (ONLY possible via the checkpoint
    // now — the prefix log is gone), earlier points refuse loudly
    assert(at(19L) === expected(19L))
    assert(at(20L) === expected(20L))
    intercept[IllegalStateException] { sink.snapshotAt("k", 12L) }

    // life goes on: post-prune upserts stamp forward, the next
    // checkpoint (batch 23) lands and sweeps the torn tmp dir
    (21 to 23).foreach { i =>
      sink.upsert("k", Seq(("a", i.toLong, s"v$i")).toDF("k", "ts", "p"))
    }
    assert(at(23L) === expected(23L))
    assert(UpsertJoin.listChangelogCheckpoints(cl) === Seq(19L, 23L))
    assert(!torn.exists(), "checkpoint writer must sweep torn tmp dirs")

    // restart over the PRUNED log: epoch recovery reads the max shard
    // dir (O(1) in history), so the next stamp continues past 23
    val restarted = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 4, changelogDir = Some(cl), changelogCheckpointEvery = 4)
    restarted.upsert("k", Seq(("a", 24L, "v24")).toDF("k", "ts", "p"))
    val maxBatch = spark.read.parquet(cl).agg(max(col("batch_id")))
      .head().getLong(0)
    assert(maxBatch === 24L, s"restart must stamp 24, got $maxBatch")
  }

  test("changelogChangesBetween nets the window per key from the tail " +
      "alone: insert/update/delete emitted, touched-but-reverted silent") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-diff").toString
    val cl = s"$tmp/cl"
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 4, changelogDir = Some(cl))
    // batch 0: a, b, d          (the pre-window base)
    // batch 1: a updated        (inside the diff window)
    // batch 2: c inserted, a updated again
    // batch 3: b rewritten to its ORIGINAL value (revert — nets out)
    sink.upsert("k", Seq(("a", 1L, "v1"), ("b", 1L, "w1"), ("d", 1L, "x1"))
      .toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("a", 2L, "v2")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("c", 1L, "y1"), ("a", 3L, "v3")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("b", 2L, "w2")).toDF("k", "ts", "p"))
    sink.upsert("k", Seq(("b", 1L, "w1")).toDF("k", "ts", "p"))
    // synthetic delete of d at batch 5 (the sink has no delete API;
    // the log format does — a bare retract, as the LSM delete path
    // emits): state(5) drops d
    Seq((false, "d", 1L, "x1", 5L, 5L / UpsertJoin.ChangelogShardEvery))
      .toDF("op", "k", "ts", "p", "batch_id", "cl_shard")
      .write.mode("append").partitionBy("cl_shard").parquet(cl)

    def diff(a: Long, b: Long): Map[String, (String, Option[(Long, String)], Option[(Long, String)])] =
      UpsertJoin.changelogChangesBetween(spark, cl, "k", a, b)
        .select("k", "change", "ts", "p", "old_ts", "old_p").collect()
        .map { r =>
          def side(ti: Int, pi: Int) =
            if (r.isNullAt(ti)) None else Some((r.getLong(ti), r.getString(pi)))
          r.getString(0) -> ((r.getString(1), side(2, 3), side(4, 5)))
        }.toMap

    // window (0, 5]: a updated (v1->v3), c inserted, d deleted;
    // b reverted to w1 inside the window -> silent
    assert(diff(0L, 5L) === Map(
      "a" -> (("update", Some((3L, "v3")), Some((1L, "v1")))),
      "c" -> (("insert", Some((1L, "y1")), None)),
      "d" -> (("delete", None, Some((1L, "x1"))))))
    // window (1, 3]: a's pre-image is the FIRST retract inside the
    // window (v2, not v1), b's w1->w2 is visible (the later revert is
    // outside), d's delete hasn't happened yet
    assert(diff(1L, 3L) === Map(
      "a" -> (("update", Some((3L, "v3")), Some((2L, "v2")))),
      "b" -> (("update", Some((2L, "w2")), Some((1L, "w1")))),
      "c" -> (("insert", Some((1L, "y1")), None))))
    // created-then-deleted inside one window nets to nothing: d over a
    // window that starts before batch 0 would be an insert+delete pair
    // — instead check (4, 5]: only d's delete is in the tail
    assert(diff(4L, 5L) === Map(
      "d" -> (("delete", None, Some((1L, "x1"))))))
    // empty window
    assert(diff(3L, 3L) === Map.empty)
    // the whole-history window sees c created; d created AND deleted
    // nets out entirely
    val whole = diff(-1L, 5L)
    assert(!whole.contains("d"), s"d must net out of the full window: $whole")
    assert(whole("c") === (("insert", Some((1L, "y1")), None)))
  }

  test("prune is crash-safe and idempotent: a floor written before any " +
      "deletion keeps every surviving read correct; re-prune completes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-prx").toString
    val cl = s"$tmp/cl"
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 4, changelogDir = Some(cl), changelogCheckpointEvery = 4)
    (0 to 20).foreach { i =>
      sink.upsert("k", Seq(("a", i.toLong, s"v$i")).toDF("k", "ts", "p"))
    }
    def at(b: Long): (Long, String) = {
      val r = sink.snapshotAt("k", b).select("ts", "p").head()
      (r.getLong(0), r.getString(1))
    }
    // simulate the crash window: the floor marker lands (19 = the
    // checkpoint a prune at 20 keeps) but NO file was deleted yet.
    // Below-floor reads must refuse FROM THIS MOMENT — the marker, not
    // the deletions, is the guard. (A crash later in the window may
    // have removed prefix shards while older checkpoints survive;
    // anchoring on one would fold a truncated tail and serve a
    // silently stale state, so "anchor exists" is not a safe test.)
    java.nio.file.Files.write(
      new java.io.File(cl, "_pruned_below").toPath,
      "19".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    intercept[IllegalStateException] { sink.snapshotAt("k", 12L) }
    assert(at(20L) === ((20L, "v20")), "at-or-above-floor reads still serve")
    assert(at(19L) === ((19L, "v19")))
    // re-running the prune completes the interrupted deletes and
    // running it AGAIN is a no-op with the same floor
    assert(UpsertJoin.pruneChangelogBefore(cl, 20L) === Some(19L))
    assert(!new java.io.File(s"$cl/cl_shard=0").exists())
    assert(UpsertJoin.pruneChangelogBefore(cl, 20L) === Some(19L))
    assert(at(20L) === ((20L, "v20")))
    intercept[IllegalStateException] { sink.snapshotAt("k", 12L) }
  }

  test("empty upsert batch on a changelog sink: no crash, epoch still " +
      "advances, state untouched") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cl-empty").toString
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out",
      nBuckets = 4, changelogDir = Some(s"$tmp/cl"))
    sink.upsert("k", Seq(("a", 1L)).toDF("k", "ts"))
    // a batch whose rows all vanished upstream (run()'s joinWith can
    // produce this): zero touched buckets — must not stage an empty
    // write whose read-back cannot infer a schema (r12 advice)
    sink.upsert("k", Seq.empty[(String, Long)].toDF("k", "ts"))
    sink.upsert("k", Seq(("b", 2L)).toDF("k", "ts"))
    val snap = sink.snapshot(spark).select("k", "ts")
      .as[(String, Long)].collect().toSet
    assert(snap === Set(("a", 1L), ("b", 2L)))
    // the empty batch consumed epoch 1, so b's insert lands at 2
    val log = spark.read.parquet(s"$tmp/cl").select("batch_id", "op", "k")
      .as[(Long, Boolean, String)].collect().toSet
    assert(log === Set((0L, true, "a"), (2L, true, "b")))
    // and time travel across the empty epoch works
    assert(UpsertJoin.snapshotAt(spark, s"$tmp/cl", "k", 1L)
      .select("k").as[String].collect().toSet === Set("a"))
  }

  test("changelog off by default: no side output, merge unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nocl").toString
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/out", nBuckets = 4)
    sink.upsert("k", Seq(("a", 1L, "x")).toDF("k", "ts", "p"))
    assert(!new java.io.File(s"$tmp/cl").exists())
    assert(sink.snapshot(spark).count() === 1)
  }
}
