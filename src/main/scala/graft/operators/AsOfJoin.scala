package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal / as-of (point-in-time) join.
  *
  * The reference demonstrates this with a Flink temporal table function:
  * `FROM listings l, LATERAL TABLE(JoinAgents(l.rowtime)) a WHERE
  * l.agent_id = a.agent_id` — each probe row joins the build-side version
  * valid at the probe's event time (reference FlinkJoiner.scala:231-232,
  * :246-257).
  *
  * Spark has no built-in as-of join. Two realizations:
  *
  *  - [[asOf]] (the scale path): tag probe and build rows, UNION them,
  *    and carry the last build row forward with
  *    `last(struct, ignoreNulls)` over a per-key time-ordered window.
  *    Cost: ONE shuffle on the key + one sort — independent of how many
  *    build versions precede each probe. This is the plan that survives
  *    100 TB: no row explosion, no range-join.
  *  - [[asOfViaJoin]] (oracle-shaped): equi-join on the key with a
  *    `buildTs <= probeTs` range predicate, then argmax per probe row.
  *    O(matches-per-key) blowup before the argmax — fine for small
  *    version counts, quadratic per key in the worst case. Kept because
  *    it is the direct SQL transliteration (what DuckDB runs as oracle).
  *
  * Tie semantics (pinned by both impls): the build row with the greatest
  * `buildTs <= probeTs` wins; among equal `buildTs`, the greatest
  * tiebreak column wins. Probes with no prior build row get nulls
  * (LEFT OUTER as-of).
  */
object AsOfJoin {

  /** Scalable union + last-value as-of join.
    *
    * @param probe     left side; every probe row is preserved
    * @param build     versioned right side
    * @param key       equi-join key column name (same name both sides)
    * @param probeTs   probe event-time column
    * @param buildTs   build version-time column
    * @param buildCols build columns to carry (emitted with `prefix`)
    * @param tiebreak  build column breaking equal-`buildTs` ties
    */
  /** Internal working-column names; inputs must not already use them. */
  private val reserved =
    Set("__t", "__side", "__btie", "__b", "__carried", "__pid", "__rn")

  private def assertNoReserved(df: DataFrame, side: String): Unit = {
    val clash = df.columns.filter(reserved)
    require(clash.isEmpty,
      s"$side input uses reserved internal column name(s) ${clash.mkString(", ")}; " +
        "rename them before the as-of join")
  }

  /** The carried build columns surface as `prefix + name` — those must
    * not collide with probe columns, or the output carries duplicate
    * names that detonate on first by-name reference downstream (the
    * same guard RangeJoin.intervalJoin applies).
    */
  private def assertNoPrefixClash(probe: DataFrame, buildCols: Seq[String],
                                  prefix: String): Unit = {
    val clash = buildCols.map(prefix + _).filter(probe.columns.contains)
    require(clash.isEmpty,
      s"prefixed build column(s) ${clash.mkString(", ")} collide with probe " +
        "columns; pick a different prefix")
  }

  def asOf(probe: DataFrame, build: DataFrame, key: String,
           probeTs: String, buildTs: String,
           buildCols: Seq[String], tiebreak: String,
           prefix: String = "b_"): DataFrame = {
    assertNoReserved(probe, "probe")
    assertNoReserved(build, "build")
    assertNoPrefixClash(probe, buildCols, prefix)
    val probeCols = probe.columns.toSeq
    // One unified schema: probe columns (null on build rows) + the build
    // payload packed in a struct (null on probe rows). Packing matters:
    // `last(ignoreNulls)` over a struct picks all carried columns from
    // the SAME build row, where per-column `last` could mix rows when
    // individual build columns are null.
    val bStruct = struct(buildCols.map(col): _*)
    val bStructType = org.apache.spark.sql.types.StructType(
      buildCols.map(c => build.schema(c)))
    val p = probe
      .withColumn("__t", col(probeTs))
      .withColumn("__side", lit(1))
      .withColumn("__btie", lit(null).cast(build.schema(tiebreak).dataType))
      .withColumn("__b", lit(null).cast(bStructType))
    // null-key build rows can never match any probe under equi-join
    // semantics; dropping them BEFORE the union also keeps them out of
    // the null-key window partition, where they would otherwise be
    // carried into null-key probes (which must emit null matches).
    // Null build TIMESTAMPS likewise never satisfy `buildTs <= probeTs`
    // in SQL — without this filter they would sort to the front of the
    // window and be carried as (-infinity)-versioned matches.
    val b = build.filter(col(key).isNotNull && col(buildTs).isNotNull)
      .select((col(key) +: probeCols.filterNot(_ == key).map(c => lit(null).cast(probe.schema(c).dataType).as(c))) :+
        col(buildTs).as("__t") :+ lit(0).as("__side") :+
        col(tiebreak).as("__btie") :+ bStruct.as("__b"): _*)
    // Order: time asc, build-before-probe at equal time (inclusive
    // `buildTs <= probeTs`), later tiebreak last so `last()` picks it.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t").asc, col("__side").asc, col("__btie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b)
      .withColumn("__carried", last(col("__b"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(probeCols.map(col) ++
        buildCols.map(c => col("__carried").getField(c).as(prefix + c)): _*)
  }

  /** Join + argmax as-of (direct SQL shape; use when the build side's
    * versions-per-key is small or the build side is broadcastable).
    */
  def asOfViaJoin(probe: DataFrame, build: DataFrame, key: String,
                  probeTs: String, buildTs: String,
                  buildCols: Seq[String], tiebreak: String,
                  prefix: String = "b_",
                  extraCond: Column = lit(true)): DataFrame = {
    assertNoReserved(probe, "probe")
    require(!build.columns.exists(_.startsWith("__r_")),
      "build input uses reserved internal prefix __r_; rename before the as-of join")
    assertNoPrefixClash(probe, buildCols, prefix)
    val probeCols = probe.columns.toSeq
    val b = build.select(((key +: buildTs +: tiebreak +: buildCols).distinct)
      .map(c => col(c).as("__r_" + c)): _*)
    // Unique per-probe-row id so duplicate probe rows each keep a match.
    val pid = probe.withColumn("__pid", monotonically_increasing_id())
    val joined = pid.join(
      b,
      col(key) === col("__r_" + key) &&
        col("__r_" + buildTs) <= col(probeTs) && extraCond,
      "left_outer")
    val w = Window.partitionBy(col("__pid"))
      .orderBy(col("__r_" + buildTs).desc_nulls_last, col("__r_" + tiebreak).desc_nulls_last)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(probeCols.map(col) ++
        buildCols.map(c => col("__r_" + c).as(prefix + c)): _*)
  }
}
