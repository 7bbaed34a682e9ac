package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.FreqItemsAggregator

/** The streaming MG sketch must accumulate ACROSS micro-batches,
  * agree with the batch UDAF in the exact regime, keep its state
  * capacity-bounded, and preserve the survival guarantee for a
  * genuinely heavy term under a tiny capacity.
  */
class StreamingHeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  test("exact regime: streamed top-k after N batches == batch UDAF on the union") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val rows = input.toDF().toDF("lang", "term")
    val q = StreamingHeavyHitters
      .heavyHittersStream(rows, "lang", "term", capacity = 64, k = 3)
      .writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    val b1 = Seq("en" -> "a", "en" -> "a", "en" -> "b", "es" -> "x")
    val b2 = Seq("en" -> "a", "en" -> "c", "en" -> "c", "en" -> "c", "es" -> "x")
    input.addData(b1: _*); q.processAllAvailable()
    input.addData(b2: _*); q.processAllAvailable()
    q.stop()
    // last update per group (max est wins — the memory sink in update
    // mode appends every batch's emission; take the final batch's rows)
    val streamed = spark.table("hh_out")
      .groupBy("group", "term").agg(max("est").as("est"))
      .as[(String, String, Long)].collect().toSet
    val batch = FreqItemsAggregator
      .frequentTerms((b1 ++ b2).toDF("lang", "term"), "lang", "term",
        capacity = 64, k = 3)
      .select(col("lang"), col("term"), col("est"))
      .as[(String, String, Long)].collect().toSet
    assert(batch.subsetOf(streamed),
      s"streamed $streamed must contain the batch top-k $batch")
    // and the final counts are the exact ones
    assert(streamed.contains(("en", "a", 3L)))
    assert(streamed.contains(("en", "c", 3L)))
    assert(streamed.contains(("es", "x", 2L)))
  }

  test("state stays capacity-bounded and the heavy term survives decrements") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val rows = input.toDF().toDF("lang", "term")
    val q = StreamingHeavyHitters
      .heavyHittersStream(rows, "lang", "term", capacity = 4, k = 4)
      .writeStream.format("memory").queryName("hh_small_out")
      .outputMode("update").start()
    // 40 occurrences of HOT drowned in 36 singleton terms, 4 batches:
    // N = 76, N/(capacity+1) = 15.2 < 40 -> HOT must survive
    (0 until 4).foreach { b =>
      val noise = (0 until 9).map(i => "en" -> s"noise_${b}_$i")
      val hot = Seq.fill(10)("en" -> "HOT")
      input.addData(scala.util.Random.shuffle(hot ++ noise): _*)
      q.processAllAvailable()
    }
    q.stop()
    val last = spark.table("hh_small_out")
      .groupBy("term").agg(max("est").as("est"))
      .as[(String, Long)].collect().toMap
    assert(last.contains("HOT"), s"heavy term lost: $last")
    // MG estimates never overcount
    assert(last("HOT") <= 40L)
    // never more than `capacity` terms reported per batch
    assert(spark.table("hh_small_out").select(max("rank")).as[Int].head() <= 4)
  }

  test("works unchanged on a static frame (batch-stream API parity)") {
    val static = Seq("en" -> "a", "en" -> "a", "en" -> "b")
      .toDF("lang", "term")
    val got = StreamingHeavyHitters
      .heavyHittersStream(static, "lang", "term", capacity = 8, k = 2)
      .collect().toSet
    assert(got === Set(
      StreamingHeavyHitters.HeavyHitter("en", "a", 2L, 1),
      StreamingHeavyHitters.HeavyHitter("en", "b", 1L, 2)))
  }
}
