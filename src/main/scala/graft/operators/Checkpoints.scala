package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization strategy for iterative operators (connected
  * components, BFS, and friends): every convergence round must
  * truncate its plan to a materialized leaf or the logical tree grows
  * multiplicatively per round (cache() materializes DATA, not lineage —
  * the k^t analysis blowup the chain-diameter stress caught).
  *
  * Two tiers, one flag:
  *
  *  - `reliable = false` (default): `localCheckpoint()` — eager,
  *    executor-local RDD blocks, zero external I/O. The fast choice,
  *    and the right one on local[n] or when the loop's INPUT is cheap
  *    to recompute: blocks are unreplicated with truncated lineage, so
  *    losing an executor mid-loop fails the job and the caller
  *    restarts from the (recomputable) input.
  *  - `reliable = true`: `checkpoint()` into
  *    `spark.sparkContext.getCheckpointDir` — each round's table is
  *    written to the reliable store (HDFS/S3 at cluster scale), so an
  *    executor loss recomputes from the last checkpoint instead of
  *    failing the traversal. Costs one distributed write per
  *    checkpointed round; worth it when rounds are expensive (deep
  *    diameters, huge label tables) or executors churn (spot fleets).
  *
  * Both forms are EAGER and content-identical — the flag trades
  * per-round write cost against executor-loss survival, never results
  * (ReliableCheckpointSpec pins the equivalence).
  */
object Checkpoints {

  /** Materialize `df` as a plan leaf under the chosen strategy. */
  def materialize(df: DataFrame, reliable: Boolean): DataFrame =
    if (!reliable) df.localCheckpoint()
    else {
      val sc = df.sparkSession.sparkContext
      require(sc.getCheckpointDir.isDefined,
        "reliableCheckpoint=true needs a checkpoint dir: call " +
          "spark.sparkContext.setCheckpointDir(<reliable store path>) " +
          "before running the iterative operator")
      df.checkpoint()
    }

  /** Delete the reliable-checkpoint files backing a SUPERSEDED
    * generation of an iterative loop. Without this, every round's full
    * label/frontier table lives in the checkpoint store for the
    * application lifetime (the ContextCleaner only removes checkpoint
    * files under `spark.cleaner.referenceTracking.cleanCheckpoints`,
    * default false, and then only on GC) — a 100-round traversal would
    * retain 100 full tables. CALLER CONTRACT: nothing still references
    * `df`'s lineage — release a round's table only after every frame
    * derived from it has itself been materialized to a leaf (the loops
    * below release a generation once the next one is a leaf and any
    * accumulator union covering it has been checkpointed). No-op for
    * localCheckpoint frames (executor-local blocks, freed on GC) and
    * for frames that were never checkpointed.
    */
  def release(df: DataFrame): Unit =
    org.apache.spark.sql.graftx.ColumnBridge.checkpointFile(df).foreach {
      file =>
        val p = new org.apache.hadoop.fs.Path(file)
        val fs = p.getFileSystem(
          df.sparkSession.sparkContext.hadoopConfiguration)
        fs.delete(p, true)
    }
}
