package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an (entity, timestamp, type) event
  * log — the product-analytics surface a clickstream pipeline runs on
  * top of the same engine (SURVEY §2.10 widening; the reference's
  * keyed-stream shape, reference CRMLSJoiner.scala:214-230, realized
  * as batch sequence queries).
  *
  * Both operators key every exchange on the entity column and never
  * shuffle anything wider than (entity, timestamp): at 100 TB the
  * event log hash-partitions by user once per stage and all joins are
  * equi-joins on that same key, so AQE plans them as co-partitioned
  * sort-merge joins with no replicated side.
  */
object EventAnalytics {

  /** Ordered funnel: a user reaches stage 0 at their earliest
    * `stages(0)` event, and stage i>0 at their earliest `stages(i)`
    * event STRICTLY AFTER their stage-(i-1) reach time (the strict
    * sequential-conversion semantics — an early purchase before the
    * first view does not count).
    *
    * One row per stage: `(stage, stage_name, n_users, conv)` where
    * `conv` = n_users / stage-0 users rounded to 6 decimals.
    *
    * Plan shape: the log is filtered to the stage types once; stage 0
    * is one aggregation keyed on the user, and each later stage is one
    * equi-join on the user (with the range predicate as a join
    * residual) plus one aggregation on the same key. Stage count is a
    * constant, so the whole funnel is O(stages) passes over the
    * filtered log with every exchange keyed identically.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
             typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events
      .filter(col(typeCol).isin(stages: _*))
      .select(col(userCol).as("__u"), col(tsCol).as("__ts"),
        col(typeCol).as("__t"))

    // reach: one row per user that reached stage 0, with columns
    // __r0.. __r{i} = reach time per stage (null = not reached)
    var reach = ev.filter(col("__t") === stages.head)
      .groupBy("__u").agg(min("__ts").as("__r0"))
    for (i <- 1 until stages.length) {
      val si = ev.filter(col("__t") === stages(i))
        .select(col("__u").as("__su"), col("__ts").as("__sts"))
      val prior = "__r" + (i - 1)
      val keep = col("__u") +: (0 until i).map(j => col("__r" + j))
      reach = reach
        .join(si, col("__u") === col("__su") && col("__sts") > col(prior),
          "left")
        .groupBy(keep: _*)
        .agg(min("__sts").as("__r" + i))
    }

    val counts = reach.agg(
      count(col("__r0")).as("__n0"),
      (1 until stages.length).map(i => count(col("__r" + i)).as("__n" + i)): _*)

    // unpivot the single-row counts to one row per stage
    val stageRows = stages.zipWithIndex.map { case (name, i) =>
      struct(lit(i + 1).cast("long").as("stage"), lit(name).as("stage_name"),
        col("__n" + i).as("n_users"))
    }
    counts
      .select(explode(array(stageRows: _*)).as("s"), col("__n0"))
      .select(col("s.stage").as("stage"), col("s.stage_name").as("stage_name"),
        col("s.n_users").as("n_users"),
        round(col("s.n_users").cast("double") /
          col("__n0").cast("double"), 6).as("conv"))
  }

  /** Weekly cohort retention: cohort = Monday-truncated week of the
    * user's first event; a user counts as retained in `week_offset` w
    * iff they have any event in cohort_week + w weeks.
    *
    * One row per (cohort_week, week_offset):
    * `(cohort_week, week_offset, n_users, retention)` with retention =
    * n_users / cohort size (the offset-0 count, which by construction
    * contains every cohort member) rounded to 6 decimals.
    *
    * Plan shape: first-event aggregation keyed on user, one equi-join
    * back to the log on the same key, then a (cohort, offset)
    * aggregation whose key space is bounded by calendar weeks squared
    * — tiny at any data scale. Cohort sizes ride a broadcast join
    * (rows = number of distinct weeks).
    */
  def retention(events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val ev = events.select(col(userCol).as("__u"), col(tsCol).as("__ts"))
    val firsts = ev.groupBy("__u")
      .agg(to_date(date_trunc("week", min(col("__ts")))).as("cohort_week"))
    val active = ev
      .select(col("__u"), to_date(date_trunc("week", col("__ts"))).as("__wk"))
      .distinct()
    val cells = active.join(firsts, "__u")
      .groupBy(col("cohort_week"),
        (datediff(col("__wk"), col("cohort_week")) / 7)
          .cast("long").as("week_offset"))
      .agg(countDistinct(col("__u")).as("n_users"))
    val sizes = firsts.groupBy("cohort_week")
      .agg(countDistinct(col("__u")).as("__sz"))
    cells.join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        round(col("n_users").cast("double") /
          col("__sz").cast("double"), 6).as("retention"))
  }
}
