package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`,
  * on in GraftSession) splits oversized sort-merge partitions at
  * runtime and is the FIRST answer to skew. Salting is the explicit
  * fallback for the cases AQE cannot fix — e.g. one pathological key
  * holding >10% of a 100 TB fact table, or skew under a broadcast-less
  * stream-static join: the fact side gets a random salt in [0, S), the
  * dimension side is exploded S times, and the join key becomes
  * (key, salt), spreading one hot key over S reducers.
  *
  * The salt is derived from a stable row hash (not `rand()`) so
  * retries/recomputations of a task produce identical output — required
  * for exactly-once sinks and deterministic tests.
  */
object SkewJoin {

  /** Inner/left salted equi-join of `fact` (large, skewed) with `dim`
    * (larger than broadcastable, much smaller than fact).
    *
    * LIMITATION of the default salt: it hashes the fact row's CONTENT,
    * so fully duplicate rows (a common shape of pathological hot keys
    * in event data) all land in ONE salt bucket and the hot key stays
    * hot. When rows can be exact duplicates, pass `saltExpr` — any
    * deterministic per-row discriminator (an event id, a file+offset
    * pair, a pre-assigned row number). `rand()` or
    * `monotonically_increasing_id()` are NOT acceptable salts: they
    * change across task retries, breaking exactly-once sinks.
    *
    * @param saltBuckets number of ways to split each hot key
    * @param saltExpr    optional deterministic per-row expression to
    *                    salt by instead of the full row content
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int, joinType: String = "left_outer",
                 saltExpr: Option[Column] = None): DataFrame = {
    // right/full outer would emit saltBuckets copies of every unmatched
    // dim row (the dim side is exploded per salt) — reject them
    require(Set("inner", "left_outer", "left", "leftouter", "left_semi",
      "leftsemi").contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left join types, got $joinType")
    // a fact-side __salt would be silently overwritten (then dropped),
    // a dim-side one makes the join condition ambiguous — reject both
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "inputs use the reserved column name __salt; rename before the salted join")
    val basis = saltExpr.getOrElse(struct(fact.columns.map(col): _*))
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(basis), lit(saltBuckets)).cast("int"))
    val salts = explode(sequence(lit(0), lit(saltBuckets - 1))).as("__salt")
    val saltedDim = dim.select(col("*"), salts)
    saltedFact.join(saltedDim,
        saltedFact(key) === saltedDim(key) &&
          saltedFact("__salt") === saltedDim("__salt"), joinType)
      .drop(saltedDim(key)).drop(saltedDim("__salt")).drop("__salt")
  }

  /** Report the heaviest keys of a frame — the diagnosis step before
    * choosing saltBuckets (run on a sample at scale).
    */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc).limit(topN)
}
