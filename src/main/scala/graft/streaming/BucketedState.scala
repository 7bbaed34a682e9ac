package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed parquet state directory: the incremental-maintenance
  * substrate behind [[CrmlsStream.StateStore]] and
  * [[UpsertJoin.ParquetUpsertSink]].
  *
  * The reference keeps its join state in RocksDB, where an upsert
  * touches only the SSTs holding the key (reference
  * CRMLSJoiner.scala:57-59). The parquet analog is key-hash bucket
  * directories: a micro-batch rewrites ONLY the buckets containing its
  * keys, so per-batch I/O is O(touched buckets x bucket size), not
  * O(live keys) — at production scale the same layout maps 1:1 onto a
  * table format's `MERGE INTO` with partition pruning.
  *
  * Durability note (honest): a bucket swap is two directory renames
  * (live -> trash, fresh -> live). A crash between them leaves that one
  * bucket's previous content in `.old_bucket_N`; [[recover]] (run
  * before every read and overwrite) restores it, so a partial swap
  * heals to the last committed state instead of serving a hole. This
  * is still NOT a transactional commit across buckets — swap the
  * directory layer for Delta/Iceberg when multi-bucket atomicity is
  * needed. Untouched buckets are never opened, so their files stay
  * byte-identical across batches (asserted by BucketedStateSpec).
  */
object BucketedState {

  val BucketColName = "__bucket"

  /** Deterministic key -> bucket assignment (stable across JVMs, so
    * state written by one run is readable by the next).
    */
  def bucketOf(key: Column, nBuckets: Int): Column =
    pmod(xxhash64(key), lit(nBuckets)).cast("int")

  private def bucketDir(dir: String, b: Int): Path =
    Paths.get(dir, s"bucket_$b")

  def listBuckets(dir: String): Seq[Int] = {
    recover(dir)
    val d = new java.io.File(dir)
    if (!d.exists()) Nil
    else d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("bucket_"))
      .map(_.getName.stripPrefix("bucket_").toInt).sorted
  }

  /** Crash repair for the two-rename bucket swap: a death between
    * `live -> trash` and `fresh -> live` leaves `.old_bucket_N` with no
    * live dir — restore it (the fresh content was never promoted, so
    * the old content is the last committed state). A death after
    * promotion but before cleanup leaves both — the trash is superseded
    * and is deleted. Runs before every read/overwrite, so partial
    * swaps are healed instead of silently serving a hole.
    */
  def recover(dir: String): Unit = {
    val d = new java.io.File(dir)
    if (!d.exists()) return
    d.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith(".old_bucket_"))
      .foreach { trash =>
        val live = bucketDir(dir, trash.getName.stripPrefix(".old_bucket_").toInt)
        if (Files.exists(live)) deleteRecursively(trash.toPath)
        else Files.move(trash.toPath, live, StandardCopyOption.ATOMIC_MOVE)
      }
  }

  /** Read only the given buckets' current rows (None if none exist —
    * e.g. the very first batch).
    */
  def readBuckets(spark: SparkSession, dir: String,
                  buckets: Seq[Int]): Option[DataFrame] = {
    recover(dir)
    val existing = buckets.filter(b => Files.exists(bucketDir(dir, b)))
    if (existing.isEmpty) None
    else Some(spark.read.parquet(existing.map(b => bucketDir(dir, b).toString): _*))
  }

  /** Full-state read across every bucket. */
  def readAll(spark: SparkSession, dir: String): Option[DataFrame] =
    readBuckets(spark, dir, listBuckets(dir))

  private def deleteRecursively(p: Path): Unit = {
    val f = p.toFile
    if (f.exists()) {
      if (f.isDirectory) f.listFiles().foreach(c => deleteRecursively(c.toPath))
      Files.delete(p)
    }
  }

  /** Replace exactly the `touched` buckets with the corresponding
    * partitions of `merged` (which must carry [[BucketColName]]). One
    * Spark job writes every touched bucket (dynamic `partitionBy`);
    * the swaps are driver-side renames.
    */
  def overwriteBuckets(spark: SparkSession, dir: String, merged: DataFrame,
                       touched: Seq[Int]): Unit = {
    if (touched.isEmpty) return
    recover(dir)
    val tmp = Paths.get(dir, ".inflight")
    deleteRecursively(tmp)
    merged.filter(col(BucketColName).isin(touched: _*))
      .write.partitionBy(BucketColName).mode("overwrite").parquet(tmp.toString)
    touched.foreach { b =>
      val fresh = tmp.resolve(s"$BucketColName=$b")
      // a touched bucket with no surviving rows keeps its old content
      // only if the merge genuinely emitted nothing for it — in the
      // upsert flows every touched bucket retains >=1 row per key, so
      // a missing partition dir means "no change", not "delete all"
      if (Files.exists(fresh)) {
        val live = bucketDir(dir, b)
        val trash = Paths.get(dir, s".old_bucket_$b")
        deleteRecursively(trash)
        if (Files.exists(live))
          Files.move(live, trash, StandardCopyOption.ATOMIC_MOVE)
        Files.move(fresh, live, StandardCopyOption.ATOMIC_MOVE)
        deleteRecursively(trash)
      }
    }
    deleteRecursively(tmp)
  }
}
