package graft.operators

import java.sql.Timestamp
import graft.SparkTestBase

/** SCD2 interval builder: per key, intervals must chain (valid_to of
  * version n = valid_from of version n+1), exactly one current row per
  * key, ties broken deterministically.
  */
class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  private lazy val changes = Seq(
    (1L, ts(100), 1L, "bronze"),
    (1L, ts(200), 2L, "silver"),
    (1L, ts(300), 3L, "gold"),
    (2L, ts(150), 4L, "bronze"),
    // same-timestamp pair: event_id tiebreak orders 6 after 5
    (3L, ts(500), 5L, "a"),
    (3L, ts(500), 6L, "b")
  ).toDF("user_id", "ts", "event_id", "tier")

  private lazy val out = Scd2.intervals(
    changes, "user_id", "ts", "event_id", Seq("tier"))
    .as[(Long, Long, String, Timestamp, Option[Timestamp], Long)]
    .collect()
    .map { case (u, e, t, from, to, cur) => (u, e, t, from, to, cur) }

  test("intervals chain per key and close at the next change") {
    val u1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(u1.map(r => (r._3, r._4, r._5)).toSeq === Seq(
      ("bronze", ts(100), Some(ts(200))),
      ("silver", ts(200), Some(ts(300))),
      ("gold", ts(300), None)))
  }

  test("exactly one current row per key") {
    val currents = out.filter(_._6 == 1L).groupBy(_._1).view.mapValues(_.length)
    assert(currents.toMap === Map(1L -> 1, 2L -> 1, 3L -> 1))
    assert(out.filter(_._6 == 1L).forall(_._5.isEmpty),
      "current row must be the open interval")
  }

  test("same-timestamp changes order by the tiebreak column") {
    val u3 = out.filter(_._1 == 3L).sortBy(_._2)
    assert(u3.head._5 === Some(ts(500)),
      "first same-ts version must close at the same instant")
    assert(u3.last._6 === 1L && u3.last._3 === "b",
      "highest tiebreak wins the current slot")
  }
}
