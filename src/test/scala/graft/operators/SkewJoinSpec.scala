package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals plain join (incl. unmatched fact rows)") {
    // hot key 1 dominates; key 99 has no dim row
    val fact = ((1 to 500).map(i => (1L, s"row$i")) ++
      Seq((2L, "two"), (99L, "orphan"))).toDF("k", "payload")
    val dim = Seq((1L, "dim one"), (2L, "dim two"), (3L, "unused"))
      .toDF("k", "dim_name")

    val plain = fact.join(dim, Seq("k"), "left_outer")
      .select("k", "payload", "dim_name")
      .as[(Long, String, Option[String])].collect().sorted
    val salted = SkewJoin.saltedJoin(fact, dim, "k", saltBuckets = 8)
      .select("k", "payload", "dim_name")
      .as[(Long, String, Option[String])].collect().sorted
    assert(salted === plain)
  }

  test("salted fact spreads a hot key over multiple salt buckets") {
    val fact = (1 to 1000).map(i => (1L, s"row$i")).toDF("k", "payload")
    val buckets = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(buckets >= 6, s"hot key only spread over $buckets buckets")
  }

  test("keySkewProfile surfaces the hot key first") {
    val fact = ((1 to 500).map(_ => (7L, "x")) ++ (1 to 10).map(i => (i.toLong + 100, "y")))
      .toDF("k", "payload")
    val top = SkewJoin.keySkewProfile(fact, "k", 1)
      .as[(Long, Long)].collect().head
    assert(top === ((7L, 500L)))
  }
}
