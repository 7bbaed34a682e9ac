package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** As-of join semantics on the reference fixture shape
  * (FlinkJoiner.scala:280-297: listings join the image version valid at
  * the listing's event time), plus the edge cases the SQL oracle pins:
  * no-prior-build nulls, inclusive `<=`, equal-ts tiebreak.
  */
class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(60000L * min)

  private lazy val probes = Seq(
    (101L, 1L, ts(5)),  // after image 1.2@3 -> carries 1.2
    (102L, 1L, ts(2)),  // exactly at image 1.1@2 -> inclusive
    (103L, 2L, ts(1)),  // before first image of key 2 (@3) -> null
    (104L, 3L, ts(9))   // key with no images at all -> null
  ).toDF("probe_id", "key", "ts")

  private lazy val images = Seq(
    (1L, "img 1.0", ts(1), 11L),
    (1L, "img 1.1", ts(2), 12L),
    (1L, "img 1.2", ts(3), 13L),
    (2L, "img 2.0", ts(3), 14L),
    (2L, "img 2.0b", ts(3), 15L) // (key, ts) tie: max tiebreak wins
  ).toDF("key", "img", "ts", "img_id")

  private def run(f: => org.apache.spark.sql.DataFrame): Map[Long, Option[String]] =
    f.select(col("probe_id"), col("b_img"))
      .as[(Long, Option[String])].collect().toMap

  test("union+last-value as-of join: inclusive bound, nulls, tiebreak") {
    val got = run(AsOfJoin.asOf(probes, images, "key", "ts", "ts",
      buildCols = Seq("img", "ts"), tiebreak = "img_id", prefix = "b_"))
    assert(got === Map(
      101L -> Some("img 1.2"), 102L -> Some("img 1.1"),
      103L -> None, 104L -> None))
  }

  test("join+argmax as-of matches the union implementation") {
    val a = run(AsOfJoin.asOf(probes, images, "key", "ts", "ts",
      Seq("img", "ts"), "img_id", "b_"))
    val b = run(AsOfJoin.asOfViaJoin(probes, images, "key", "ts", "ts",
      Seq("img", "ts"), "img_id", "b_"))
    assert(a === b)
  }

  test("equal-ts build versions resolve to the max tiebreak") {
    val p = Seq((201L, 2L, ts(4))).toDF("probe_id", "key", "ts")
    val got = run(AsOfJoin.asOf(p, images, "key", "ts", "ts",
      Seq("img", "ts"), "img_id", "b_"))
    assert(got === Map(201L -> Some("img 2.0b")))
  }

  test("null join keys never match on either side (equi-join semantics)") {
    val p = Seq(
      (401L, Option.empty[Long], ts(9)),  // null-key probe
      (402L, Some(9L), ts(9))             // key with only null-key builds
    ).toDF("probe_id", "key", "ts")
    val b = Seq(
      (Option.empty[Long], "null-key build", ts(1), 90L),
      (Option.empty[Long], "null-key build 2", ts(2), 91L)
    ).toDF("key", "img", "ts", "img_id")
    val got = run(AsOfJoin.asOf(p, b, "key", "ts", "ts",
      Seq("img", "ts"), "img_id", "b_"))
    assert(got === Map(401L -> None, 402L -> None))
  }

  test("duplicate probe rows each keep their match (viaJoin)") {
    val p = Seq((301L, 1L, ts(5)), (301L, 1L, ts(5))).toDF("probe_id", "key", "ts")
    val got = AsOfJoin.asOfViaJoin(p, images, "key", "ts", "ts",
      Seq("img"), "img_id", "b_")
    assert(got.count() === 2)
  }
}
