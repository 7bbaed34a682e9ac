package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming form of the interval join (batch form:
  * operators/RangeJoin): a Spark stream-stream inner join whose
  * condition is an equi-key plus an event-time bound.
  *
  * This is the one join shape Spark's stream-stream machinery supports
  * with BOUNDED state: the watermarks on both inputs plus the time-range
  * join condition let the symmetric hash join evict a buffered row as
  * soon as the other side's watermark proves nothing can still match it
  * (probe rows age out after `lookback + lateness`, build rows after
  * `lateness`). Contrast the reference's unbounded-state 11-way join
  * (CRMLSJoiner.scala:471-487), which Spark refuses as a stream-stream
  * join precisely because nothing bounds its state — that path is
  * realized as latest-state tables + foreachBatch (CrmlsStream).
  */
object StreamingIntervalJoin {

  /** Pairs (probe, build) with equal `key` and
    * `buildTs` in `[probeTs - lookbackSec, probeTs]` (inclusive), as a
    * watermarked stream-stream inner join. Build columns are prefixed
    * with `buildPrefix`.
    */
  def joinWithin(probe: DataFrame, build: DataFrame, key: String,
                 probeTs: String, buildTs: String, lookbackSec: Long,
                 lateness: String = "100 seconds",
                 buildPrefix: String = "b_"): DataFrame = {
    require(lookbackSec > 0, "lookbackSec must be positive")
    // prefixed build names must not collide with probe columns (the
    // join would otherwise resolve ambiguously)
    val clash = build.columns.map(buildPrefix + _).toSet
      .intersect(probe.columns.toSet)
    require(clash.isEmpty,
      s"probe columns collide with prefixed build columns: $clash")
    val p = probe.withWatermark(probeTs, lateness)
    val b = build
      .select(build.columns.map(c => col(c).as(s"$buildPrefix$c")): _*)
      .withWatermark(s"$buildPrefix$buildTs", lateness)
    p.join(b,
      col(key) === col(s"$buildPrefix$key") &&
        col(s"$buildPrefix$buildTs") >=
          col(probeTs) - expr(s"INTERVAL $lookbackSec SECONDS") &&
        col(s"$buildPrefix$buildTs") <= col(probeTs),
      "inner")
  }
}
