package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

import scala.util.Random

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(ms: Long) = new Timestamp(ms)

  // naive reference: plain equi-join on key with the range as a filter
  private def naive(probe: DataFrame, build: DataFrame,
                    lookbackMs: Long, lookaheadMs: Long): Set[(Long, Long)] = {
    val b = build.select(col("id").as("b_id"), col("k").as("b_k"),
      col("t").as("b_t"))
    probe.join(b, col("k") === col("b_k") &&
        unix_millis(col("b_t")) >= unix_millis(col("t")) - lookbackMs &&
        unix_millis(col("b_t")) <= unix_millis(col("t")) + lookaheadMs)
      .select("id", "b_id").as[(Long, Long)].collect().toSet
  }

  private def pairs(probe: DataFrame, build: DataFrame, lookbackMs: Long,
                    lookaheadMs: Long, bucketMs: Long = 0): Set[(Long, Long)] =
    RangeJoin.intervalJoin(probe, build, "k", "t", "t",
        lookbackMs, lookaheadMs, bucketMs)
      .select("id", "b_id").as[(Long, Long)].collect().toSet

  test("intervalJoin matches the naive range join on a fixture") {
    val probe = Seq((1L, 10L, ts(10000)), (2L, 10L, ts(20000)),
      (3L, 20L, ts(15000))).toDF("id", "k", "t")
    val build = Seq((101L, 10L, ts(5000)), (102L, 10L, ts(10000)),
      (103L, 10L, ts(16000)), (104L, 20L, ts(4999)),
      (105L, 30L, ts(15000))).toDF("id", "k", "t")
    // lookback 5s, no lookahead: inclusive [t-5000, t]
    assert(pairs(probe, build, 5000, 0) ===
      Set((1L, 101L), (1L, 102L), (2L, 103L)))
    assert(pairs(probe, build, 5000, 0) === naive(probe, build, 5000, 0))
  }

  test("boundary rows at exactly t-lookback and t+lookahead are included") {
    val probe = Seq((1L, 1L, ts(100000))).toDF("id", "k", "t")
    val build = Seq((11L, 1L, ts(90000)), (12L, 1L, ts(110000)),
      (13L, 1L, ts(89999)), (14L, 1L, ts(110001))).toDF("id", "k", "t")
    assert(pairs(probe, build, 10000, 10000) === Set((1L, 11L), (1L, 12L)))
  }

  test("randomized agreement with the naive join, default and custom buckets") {
    val rnd = new Random(42)
    val probe = (1 to 300).map(i =>
      (i.toLong, rnd.nextInt(10).toLong, ts(rnd.nextInt(1000000).toLong)))
      .toDF("id", "k", "t")
    val build = (1 to 600).map(i =>
      (1000L + i, rnd.nextInt(10).toLong, ts(rnd.nextInt(1000000).toLong)))
      .toDF("id", "k", "t")
    val expected = naive(probe, build, 30000, 7000)
    assert(pairs(probe, build, 30000, 7000) === expected)
    // a bucket narrower than the span (more fan-out, same result)
    assert(pairs(probe, build, 30000, 7000, bucketMs = 10000) === expected)
    // a bucket wider than the span
    assert(pairs(probe, build, 30000, 7000, bucketMs = 120000) === expected)
  }

  test("windowAggregate keeps unmatched probes with null aggregates") {
    val probe = Seq((1L, 1L, ts(50000)), (2L, 2L, ts(50000)))
      .toDF("id", "k", "t")
    val build = Seq((11L, 1L, ts(45000), 2.5), (12L, 1L, ts(48000), 1.5))
      .toDF("id", "k", "t", "v")
    val out = RangeJoin.windowAggregate(probe, build, "k", "id", "t", "t",
        lookbackMs = 10000, lookaheadMs = 0,
        aggs = Seq(count(lit(1)).as("n"), sum("b_v").as("sv")))
      .select("id", "n", "sv")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(out(1L) === ((Some(2L), Some(4.0))))
    assert(out(2L) === ((None, None)))
  }

  test("reserved working-column names are rejected") {
    val bad = Seq((1L, 1L, ts(0), 0L)).toDF("id", "k", "t", "__bkt")
    val ok = Seq((1L, 1L, ts(0))).toDF("id", "k", "t")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalJoin(bad, ok, "k", "t", "t", 1000)
    }
  }
}
