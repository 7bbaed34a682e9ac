package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The reliable-checkpoint flag of the iterative operators
  * ([[Checkpoints.materialize]]): `reliableCheckpoint = true` swaps
  * executor-local localCheckpoint blocks for writes into the
  * sparkContext checkpoint dir. The flag trades per-round write cost
  * for executor-loss survival — NEVER results: both modes must
  * converge to identical tables on the worst-case (deep-diameter
  * chain) fixture, and the reliable mode must actually hit the
  * checkpoint dir.
  */
class ReliableCheckpointSpec extends SparkTestBase {
  import spark.implicits._

  // a 40-link chain: diameter forces many propagation rounds, so both
  // modes checkpoint repeatedly before converging
  private def chainPairs = (0L until 40L).map(i => (i, i + 1L))
    .toDF("id_a", "id_b")

  test("distributed CC: reliable and local checkpointing converge identically") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      // driverThreshold = 1 forces the distributed label-propagation
      // loop (the only tier that checkpoints)
      val local = DedupOps.duplicateClusters(chainPairs, maxIter = 64,
        driverThreshold = 1L)
        .as[(Long, Long)].collect().toSet
      val reliable = DedupOps.duplicateClusters(chainPairs, maxIter = 64,
        driverThreshold = 1L, reliableCheckpoint = true)
        .as[(Long, Long)].collect().toSet
      assert(reliable === local)
      assert(local === (0L to 40L).map(i => (i, 0L)).toSet,
        "the chain must collapse to one cluster rooted at 0")
      // the reliable mode really wrote to the checkpoint dir
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, "reliable mode must persist checkpoint files")
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("reliable checkpoints: superseded generations are deleted, " +
      "retention is O(1) not O(rounds)") {
    def rddDirs(ckpt: String): Long =
      java.nio.file.Files.walk(java.nio.file.Paths.get(ckpt))
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("rdd-")).count()
    // CC over the 40-link chain: ~40 propagation rounds, each
    // checkpointing one label table — without per-round release the
    // dir would retain ~40 rdd-* tables for the application lifetime
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt3").toString
    val prev = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(ckpt)
    try {
      DedupOps.duplicateClusters(chainPairs, maxIter = 64,
        driverThreshold = 1L, reliableCheckpoint = true).collect()
      assert(rddDirs(ckpt) <= 3,
        s"CC retained ${rddDirs(ckpt)} checkpoint tables — superseded " +
          "rounds must be released")
      // BFS: 12 hops, visited re-materialized every 3 — frontiers and
      // covered visited checkpoints must be released as they retire
      val ckpt2 = java.nio.file.Files.createTempDirectory("graft-ckpt4").toString
      spark.sparkContext.setCheckpointDir(ckpt2)
      GraphMetrics.bfsHops(chainPairs, Seq(0L).toDF("id"), maxHops = 12,
        checkpointEvery = 3, reliableCheckpoint = true).collect()
      assert(rddDirs(ckpt2) <= 3,
        s"bfsHops retained ${rddDirs(ckpt2)} checkpoint tables")
    } finally prev.foreach(spark.sparkContext.setCheckpointDir)
  }

  test("bfsHops: reliable and local checkpointing converge identically") {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    val seeds = Seq(0L).toDF("id")
    val local = GraphMetrics.bfsHops(chainPairs, seeds, maxHops = 12,
      cacheEdges = true, checkpointEvery = 3)
      .as[(Long, Int)].collect().toSet
    val reliable = GraphMetrics.bfsHops(chainPairs, seeds, maxHops = 12,
      cacheEdges = true, checkpointEvery = 3, reliableCheckpoint = true)
      .as[(Long, Int)].collect().toSet
    assert(reliable === local)
    assert(local === (0 to 12).map(i => (i.toLong, i)).toSet)
  }

}
