package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-assembly operators for training pipelines (SURVEY §2.10):
  * deterministic splits, sampling, and global shuffling.
  *
  * All three are CONTENT-ADDRESSED — the decision for a row is a pure
  * function of (seed, row id) via md5, never `rand()` or partition
  * position. That is the property that matters at 100 TB:
  *  - re-running the job (or re-computing a lost partition) assigns
  *    every row the same way, so exactly-once sinks and incremental
  *    re-builds stay consistent;
  *  - adding documents later never moves an existing document across
  *    splits (no train/test leakage when the corpus grows);
  *  - any other engine can reproduce the assignment from the same
  *    (seed, id) — md5 is md5 everywhere.
  * Cost: one hash per row, no shuffle for split/sample; the shuffle op
  * is one range-exchange + in-partition sort, Spark's scalable form of
  * a global ORDER BY.
  */
object TrainingOps {

  /** 32-hex-char deterministic key for (seed, id). */
  private def hashKey(idCol: Column, seed: String): Column =
    md5(concat(lit(seed), lit(":"), idCol.cast("string")))

  /** Add a `split` column ("train" / "val" / "test") with the given
    * fractions (test gets the remainder). Assignment = first two hex
    * chars of md5(seed:id), i.e. 256 uniform buckets; fractions are
    * realized at 1/256 granularity.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  trainFrac: Double = 0.8, valFrac: Double = 0.1,
                  seed: String = "split"): DataFrame = {
    require(trainFrac >= 0 && valFrac >= 0 && trainFrac + valFrac <= 1.0,
      "fractions must be non-negative and sum to <= 1")
    val trainMax = f"${math.floor(256 * trainFrac).toInt}%02x"
    val valMax = f"${math.floor(256 * (trainFrac + valFrac)).toInt}%02x"
    val bucket = substring(hashKey(col(idCol), seed), 1, 2)
    df.withColumn("split",
      when(bucket < lit(trainMax), "train")
        .when(bucket < lit(valMax), "val")
        .otherwise("test"))
  }

  /** Keep ~`fraction` of rows, decided per row by hash bucket (65536
    * buckets from the first four hex chars). Unlike `df.sample`, the
    * kept set is a pure function of (seed, id): stable across reruns,
    * task retries, and engines.
    */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 seed: String = "sample"): DataFrame = {
    require(fraction >= 0 && fraction <= 1.0, "fraction must be in [0, 1]")
    val max = f"${math.floor(65536 * fraction).toInt}%04x"
    df.filter(substring(hashKey(col(idCol), seed), 1, 4) < lit(max))
  }

  /** Deterministic global shuffle: order rows by md5(seed:id). The sort
    * is a range-partitioned exchange + per-partition sort (Spark's
    * distributed ORDER BY) — no single-reducer bottleneck, and writing
    * the result partition-by-partition preserves the global order.
    * Changing `seed` gives an independent permutation (per-epoch
    * reshuffling).
    */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           seed: String = "epoch0"): DataFrame =
    df.withColumn("shuffle_key", hashKey(col(idCol), seed))
      .orderBy(col("shuffle_key"))
}
