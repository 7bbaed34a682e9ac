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
