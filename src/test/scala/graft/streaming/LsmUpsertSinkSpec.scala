package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The delta-mode (LSM) upsert sink must be OBSERVATIONALLY IDENTICAL
  * to merge-on-write: same snapshot after any upsert sequence, however
  * compactions interleave; appends between compactions must not touch
  * a single bucket file (that is the entire point of the mode); and a
  * restarted instance must read pending deltas correctly and fold them
  * in on its next compaction.
  */
class LsmUpsertSinkSpec extends SparkTestBase {
  import spark.implicits._

  private def batchDf(rows: Seq[(String, Int, String)]) =
    rows.toDF("k", "v", "tag")

  // same upsert sequence, keys overlapping within and across batches
  private val batches = Seq(
    Seq(("a", 1, "b0"), ("b", 1, "b0"), ("c", 1, "b0")),
    Seq(("b", 2, "b1"), ("d", 1, "b1")),
    Seq(("a", 3, "b2"), ("d", 2, "b2"), ("e", 1, "b2")),
    Seq(("e", 2, "b3"), ("f", 1, "b3"), ("a", 4, "b3")),
    Seq(("c", 2, "b4"))
  )

  private def drive(sink: UpsertJoin.UpsertSink): Unit =
    batches.foreach(b => sink.upsert("k", batchDf(b)))

  private def rowsOf(sink: UpsertJoin.UpsertSink): Set[(String, Int, String)] =
    sink.snapshot(spark).select("k", "v", "tag")
      .as[(String, Int, String)].collect().toSet

  test("delta-mode snapshot equals merge-on-write, compacted or not") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsm").toString
    val merge = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/m", nBuckets = 4)
    drive(merge)
    val expected = rowsOf(merge)
    assert(expected.nonEmpty)

    // never compacts within the sequence (threshold > batches)
    val lazyLsm = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/l", 4,
      deltaCompactEvery = 100)
    drive(lazyLsm)
    assert(rowsOf(lazyLsm) === expected, "uncompacted merge-on-read")

    // compacts twice mid-sequence
    val eager = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/e", 4,
      deltaCompactEvery = 2)
    drive(eager)
    assert(rowsOf(eager) === expected, "compaction must not change the table")
  }

  test("appends between compactions write only delta files") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsm2").toString
    val sink = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/s", 4,
      deltaCompactEvery = 100)
    sink.upsert("k", batchDf(batches.head))
    // compact by hand so bucket files exist, then snapshot the tree
    val compacted = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/s", 4,
      deltaCompactEvery = 1)
    compacted.upsert("k", batchDf(batches(1)))
    compacted.awaitCompaction() // compaction runs async off the batch path
    val before = graft.StreamBench.fileSizes(Seq(s"$tmp/s"))
    assert(before.keys.exists(_.contains("bucket_")), "compaction ran")

    val appender = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/s", 4,
      deltaCompactEvery = 100)
    appender.upsert("k", batchDf(batches(2)))
    val after = graft.StreamBench.fileSizes(Seq(s"$tmp/s"))
    val changedBuckets = after.collect {
      case (p, sz) if p.contains("bucket_") && !before.get(p).contains(sz) => p
    }
    assert(changedBuckets.isEmpty,
      s"a delta append modified bucket files:\n${changedBuckets.mkString("\n")}")
    assert(after.keys.exists(_.contains("__delta")), "the delta file landed")
  }

  test("restart with pending deltas: snapshot correct, next upsert folds them") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsm3").toString
    val first = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/s", 4,
      deltaCompactEvery = 100)
    batches.take(3).foreach(b => first.upsert("k", batchDf(b)))

    // fresh instance over the same dir (e.g. after a driver restart)
    val second = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/s", 4,
      deltaCompactEvery = 100)
    val merge = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/m", nBuckets = 4)
    batches.take(3).foreach(b => merge.upsert("k", batchDf(b)))
    assert(rowsOf(second) === rowsOf(merge), "restart reads pending deltas")

    // restart-with-deltas forces compaction on the next upsert; later
    // batches must still beat the replayed earlier generations
    second.upsert("k", batchDf(batches(3)))
    merge.upsert("k", batchDf(batches(3)))
    assert(rowsOf(second) === rowsOf(merge), "post-restart fold keeps order")
    assert(!new java.io.File(s"$tmp/s/__delta").exists() ||
      new java.io.File(s"$tmp/s/__delta").listFiles()
        .forall(!_.getName.startsWith("g")),
      "forced compaction cleared the pending deltas")
  }

  test("jobless driver-array appends are observationally identical to frame appends") {
    // upsertPreparedRowsUnique (chunked LocalParquet, zero jobs) vs
    // upsertPreparedUnique (frame path): same gens-on-disk semantics,
    // same snapshot, same compaction fold, same restart recovery —
    // including multi-part gen dirs (chunked writes)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsm4").toString
    val viaRows = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/r", 4,
      deltaCompactEvery = 3)
    val viaFrame = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/f", 4,
      deltaCompactEvery = 3)
    val schema = batchDf(batches.head).schema
    batches.foreach { b =>
      val df = batchDf(b)
      viaRows.upsertPreparedRowsUnique(spark, "k", df.collect(), schema,
        0 until 4)
      viaFrame.upsertPreparedUnique("k", df, 0 until 4)
    }
    viaRows.awaitCompaction(); viaFrame.awaitCompaction()
    assert(rowsOf(viaRows) === rowsOf(viaFrame))
    // restart over the rows-appended dir (pending gens survive)
    val reopened = new UpsertJoin.ParquetUpsertSink(spark, s"$tmp/r", 4,
      deltaCompactEvery = 3)
    assert(rowsOf(reopened) === rowsOf(viaFrame))
  }
}
