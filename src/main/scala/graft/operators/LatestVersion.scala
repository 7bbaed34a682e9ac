package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-version-per-key deduplication — the reference's signature
  * operator (argmax-by-timestamp dedup).
  *
  * The reference expresses it nine times as
  * `SELECT * FROM t WHERE (pk, ts) IN (SELECT pk, MAX(ts) FROM t GROUP BY pk)`
  * (reference CRMLSJoiner.scala:182,235,295,348,406,465;
  * TestJoiner.scala:152,200,249). Flink compiles the tuple-IN into a
  * group-aggregate + left-semi join; on Spark the idiomatic and cheaper
  * plan is a single window `max` over the key partition — ONE shuffle on
  * the key, no join, and the aggregate is partial (map-side) before the
  * exchange. At 100 TB this matters: the semi-join form shuffles the
  * table twice (once for the aggregate, once for the join); the window
  * form shuffles once.
  */
object LatestVersion {

  /** Tuple-IN semantics: keeps ALL rows tying on the per-key max
    * timestamp, exactly like the reference SQL (a key with two rows at
    * the same max ts yields two rows).
    */
  def latestAll(df: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
    df.withColumn("__max_ts", max(col(tsCol)).over(w))
      .filter(col(tsCol) === col("__max_ts"))
      .drop("__max_ts")
  }

  /** Exactly-one-per-key variant: `row_number() = 1` with an explicit
    * deterministic tiebreak column (SURVEY §7.2.3 — `row_number` alone
    * would be nondeterministic under ts ties).
    */
  def latestOne(df: DataFrame, keyCol: String, tsCol: String,
                tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc, col(tiebreakCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Multi-column key variant of [[latestAll]]. */
  def latestAllMulti(df: DataFrame, keyCols: Seq[String], tsCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    df.withColumn("__max_ts", max(col(tsCol)).over(w))
      .filter(col(tsCol) === col("__max_ts"))
      .drop("__max_ts")
  }
}
