package graft.operators

import java.sql.Timestamp

import graft.SparkTestBase

class EventAnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // u1: full ordered path; u2: purchase BEFORE first view (must not
  // convert); u3: view only; u4: no view at all (not in funnel)
  private lazy val ev = Seq(
    (1L, ts("2024-01-01 10:00:00"), "view"),
    (1L, ts("2024-01-01 10:05:00"), "click"),
    (1L, ts("2024-01-01 10:10:00"), "purchase"),
    (2L, ts("2024-01-02 09:00:00"), "purchase"),
    (2L, ts("2024-01-02 09:30:00"), "view"),
    (2L, ts("2024-01-02 09:45:00"), "click"),
    (3L, ts("2024-01-03 08:00:00"), "view"),
    (4L, ts("2024-01-04 07:00:00"), "click"),
    (4L, ts("2024-01-04 07:01:00"), "purchase")
  ).toDF("user_id", "ts", "event_type")

  test("funnel: strict ordered semantics — early purchase does not convert") {
    val got = EventAnalytics
      .funnel(ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy("stage")
      .select("stage", "stage_name", "n_users", "conv")
      .as[(Long, String, Long, Double)].collect()
    // stage 0: u1, u2, u3 have views -> 3; stage 1: u1 + u2 clicked
    // after their first view -> 2; stage 2: only u1 purchased after
    // the click (u2's purchase predates the view chain)
    assert(got === Array(
      (1L, "view", 3L, 1.0),
      (2L, "click", 2L, 0.666667),
      (3L, "purchase", 1L, 0.333333)))
  }

  test("funnel: stage-i event exactly AT the prior reach time does not count") {
    val same = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 10:00:00"), "click")
    ).toDF("user_id", "ts", "event_type")
    val got = EventAnalytics
      .funnel(same, "user_id", "ts", "event_type", Seq("view", "click"))
      .orderBy("stage").select("n_users").as[Long].collect()
    assert(got === Array(1L, 0L), "strict > on the reach time")
  }

  test("retention: weekly cohorts with Monday truncation") {
    // 2024-01-01 is a Monday. u1 first event wk0, returns wk2;
    // u2 first event wk1 only.
    val log = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (1L, ts("2024-01-16 10:00:00")),
      (2L, ts("2024-01-10 10:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retention(log, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select($"cohort_week".cast("string"), $"week_offset", $"n_users", $"retention")
      .as[(String, Long, Long, Double)].collect()
    assert(got === Array(
      ("2024-01-01", 0L, 1L, 1.0),
      ("2024-01-01", 2L, 1L, 1.0),
      ("2024-01-08", 0L, 1L, 1.0)))
  }

  test("retention: rates divide by cohort size") {
    // two users in one cohort, one returns next week
    val log = Seq(
      (1L, ts("2024-01-02 10:00:00")),
      (2L, ts("2024-01-03 10:00:00")),
      (2L, ts("2024-01-09 10:00:00"))
    ).toDF("user_id", "ts")
    val got = EventAnalytics.retention(log, "user_id", "ts")
      .orderBy("week_offset")
      .select("week_offset", "n_users", "retention")
      .as[(Long, Long, Double)].collect()
    assert(got === Array((0L, 2L, 1.0), (1L, 1L, 0.5)))
  }

  test("funnel plan: joins keyed on the user — no broadcast nested loop") {
    val p = EventAnalytics
      .funnel(ev, "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "range predicate must ride the equi-join as a residual, not a nested loop")
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }
}
