package graft.plans

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Walk an EXECUTED plan down through AQE wrappers to its file scans —
  * the empirical "which files did this query actually open" probe used
  * by the plan-hygiene specs and the stress harness. The scan metrics
  * (`numFiles`) live on FileSourceScanExec leaves, which a plain
  * children walk misses because AQE materializes stages behind
  * QueryStageExec boundaries; this helper is the single copy of that
  * unwrapping so a Spark upgrade changing the AQE node shapes is fixed
  * in one place.
  */
object PlanFiles {
  def fileScans(e: SparkPlan): Seq[FileSourceScanExec] = e match {
    case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    case q: QueryStageExec => fileScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case o => o.children.flatMap(fileScans)
  }

  /** Sum of the `numFiles` metric over every file scan in an executed
    * plan — call only after an action has run on the same
    * QueryExecution, or the metrics read zero.
    */
  def filesRead(e: SparkPlan): Long =
    fileScans(e).map(_.metrics("numFiles").value).sum
}
