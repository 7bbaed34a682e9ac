package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftx.ColumnBridge

/** Custom whole-operator as-of join: logical node + planner strategy +
  * physical sort-merge exec (SURVEY §7.5's "optional custom
  * SparkStrategy" path, realized).
  *
  * Why a physical operator when the union+window rewrite
  * (operators/AsOfJoin.asOf) already works: the rewrite materializes a
  * unified probe/build schema and runs a window `last()` over every row
  * — fine, but it carries the build payload through the sort and cannot
  * stop scanning a key's versions early. This exec requires both
  * children hash-clustered on the key and sorted by (key, ts) — ONE
  * exchange per side, same as the rewrite — and then streams both
  * sorted iterators through a forward-only merge: O(|probe| + |build|)
  * per partition, zero extra materialization, early-out per key.
  *
  * Semantics (identical to AsOfJoin.asOf, pinned by the shared property
  * test): latest build row with `buildTs <= probeTs`; equal-ts ties go
  * to the greatest tiebreak; probes with no match emit nulls
  * (LEFT OUTER); null join keys never match.
  */
object AsOfJoinPlan {

  /** Logical node — constructed pre-resolved (expressions are the
    * children's own attributes), so analysis passes through.
    */
  final case class AsOfJoin(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression,
      rightTie: Expression) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
      copy(left = newLeft, right = newRight)
  }

  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoin(l, r, lk, rk, lts, rts, tie) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, tie) :: Nil
      case _ => Nil
    }
  }

  /** Physical sort-merge as-of exec.
    *
    * CODEGEN STANCE — the operator loop is deliberately interpreted,
    * and that is not a gap:
    *
    *  - every per-row computation inside the loop already runs through
    *    CODE-GENERATED machinery: `UnsafeProjection.create` and
    *    `RowOrdering.createNaturalAscendingOrdering` compile their
    *    expressions to bytecode at operator init, so key/ts extraction
    *    and comparisons are exactly the code a generated operator
    *    would emit; only the merge-loop CONTROL FLOW (a dozen branches
    *    per row) is interpreted.
    *  - the operator's real cost sits in its required exchanges and
    *    sorts, which are stock Tungsten/codegen'd operators; the merge
    *    itself is a forward-only O(|p|+|b|) pass. BENCH rows agree:
    *    q_asof_native (this exec) runs at parity with q_asof (the
    *    whole-stage-codegen'd union+window rewrite) at equal shuffle
    *    counts — the interpreted loop is not the bottleneck.
    *  - whole-stage codegen for a BINARY node needs produce/consume
    *    integration over zipped child iterators; Spark itself only
    *    gives SortMergeJoin codegen for a subset of join shapes.
    *    Buying a row-loop constant with that machinery is the wrong
    *    trade while the loop is not measurable in the profile.
    *
    * Iterator-state edges (empty build, exhausted build, all-null
    * keys, partition-count invariance) are pinned by
    * AsOfJoinPlanSpec's edge + property tests.
    */
  final case class AsOfJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression,
      rightTie: Expression) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def requiredChildDistribution: Seq[Distribution] = {
      // pin BOTH sides to the same partition count: doExecute zips
      // partitions pairwise, so AQE must not coalesce the two shuffles
      // to different counts (a requiredNumPartitions distribution is
      // exempt from coalescing)
      val n = org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions
      ClusteredDistribution(Seq(leftKey), requiredNumPartitions = Some(n)) ::
        ClusteredDistribution(Seq(rightKey), requiredNumPartitions = Some(n)) :: Nil
    }

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
        SortOrder(rightTie, Ascending)))

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyExprs = Seq(leftKey)
      val rKeyExprs = Seq(rightKey)
      val keyTypes = lKeyExprs.map(_.dataType)
      val nRight = right.output.size

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, left.output)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, right.output)
        val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
        val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
        val keyOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(keyTypes)
        val tsOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering
          .createNaturalAscendingOrdering(Seq(leftTs.dataType))
        val nullRight = new GenericInternalRow(nRight)
        val joined = new JoinedRow
        val out = UnsafeProjection.create(output, left.output ++ right.output)

        new Iterator[InternalRow] {
          private var rHead: InternalRow = _      // lookahead build row
          private var rHeadKey: InternalRow = _
          private var matchRow: InternalRow = _   // best build row for cur key
          private var matchKey: InternalRow = _
          private def advanceRight(): Unit =
            if (rIter.hasNext) {
              rHead = rIter.next()
              rHeadKey = rKeyProj(rHead).copy()
            } else { rHead = null; rHeadKey = null }
          advanceRight()

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyProj(l)
            if (lk.anyNull) {
              // null keys never match (SQL equi-join semantics)
              joined(l, nullRight)
            } else {
              // drop buffered match from a previous, different key
              if (matchKey != null && keyOrd.compare(matchKey, lk) != 0) {
                matchRow = null; matchKey = null
              }
              // skip build keys before this probe key
              while (rHead != null &&
                (rHeadKey.anyNull || keyOrd.compare(rHeadKey, lk) < 0))
                advanceRight()
              // consume build rows for this key up to the probe ts;
              // the LAST one consumed is the (ts, tie)-max candidate.
              // Null build timestamps sort first under the ascending
              // child ordering but can never satisfy `buildTs <=
              // probeTs` in SQL — skip them instead of recording a
              // (-infinity)-versioned match. A null PROBE ts matches
              // nothing for the same reason (null sorts below every
              // real ts, so the consume loop admits no build row).
              val lts = lTsProj(l).copy()
              val probeTsNull = lts.isNullAt(0)
              while (rHead != null && keyOrd.compare(rHeadKey, lk) == 0 &&
                tsOrd.compare(rTsProj(rHead), lts) <= 0) {
                if (!rTsProj(rHead).isNullAt(0) && !probeTsNull) {
                  matchRow = rHead.copy()
                  matchKey = rHeadKey
                }
                advanceRight()
              }
              if (matchRow != null && keyOrd.compare(matchKey, lk) == 0)
                joined(l, matchRow)
              else joined(l, nullRight)
            }
            out(joined)
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Builder: as-of join two DataFrames through the custom operator.
    * Registers the strategy on the session (idempotent) via the public
    * `experimental.extraStrategies` hook, so it works on sessions built
    * without GraftExtensions.
    */
  def asOf(probe: DataFrame, build: DataFrame, key: String,
           probeTs: String, buildTs: String, tiebreak: String,
           buildCols: Seq[String], prefix: String = "b_"): DataFrame = {
    val prefixClash = buildCols.map(prefix + _).filter(probe.columns.contains)
    require(prefixClash.isEmpty,
      s"prefixed build column(s) ${prefixClash.mkString(", ")} collide with " +
        "probe columns; pick a different prefix")
    val spark = probe.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val b = build.select((Seq(key, buildTs, tiebreak) ++ buildCols).distinct
      .map(c => build(c).as("__r_" + c)): _*)
    val plan = AsOfJoin(
      ColumnBridge.logicalPlan(probe), ColumnBridge.logicalPlan(b),
      ColumnBridge.expression(probe(key)),
      ColumnBridge.expression(b("__r_" + key)),
      ColumnBridge.expression(probe(probeTs)),
      ColumnBridge.expression(b("__r_" + buildTs)),
      ColumnBridge.expression(b("__r_" + tiebreak)))
    ColumnBridge.ofRows(spark, plan)
      .select(probe.columns.map(org.apache.spark.sql.functions.col).toSeq ++
        buildCols.map(c =>
          org.apache.spark.sql.functions.col("__r_" + c).as(prefix + c)): _*)
  }
}
