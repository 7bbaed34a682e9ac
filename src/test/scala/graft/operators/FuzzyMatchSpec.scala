package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class FuzzyMatchSpec extends SparkTestBase {
  import spark.implicits._

  // two "widget" rows share a value (mass 2); "bolt" in its own block
  private lazy val rows = Seq(
    "red widget", "red widget", "rad widget", "blue widget", "red bolt"
  ).toDF("name")

  private val lastTok: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
    n => regexp_extract(n, "[^ ]+$", 0)

  test("blockedPairs: within-block Levenshtein pairs, each emitted once a<b") {
    val got = FuzzyMatch.blockedPairs(rows, "name", lastTok, maxDist = 2)
      .select("name_a", "name_b", "dist").as[(String, String, Int)]
      .collect().toSet
    // distinct names: red/rad/blue widget + red bolt.
    // red~rad = 1 in block "widget"; blue is 3+ edits from both.
    assert(got === Set(("rad widget", "red widget", 1)))
  }

  test("blockedPairs: blocking key isolates blocks even for close strings") {
    // "red bolt" vs "red widget" would pass a global dist<=6 check but
    // must never be compared: different blocks
    val got = FuzzyMatch.blockedPairs(rows, "name", lastTok, maxDist = 6)
      .select("name_a", "name_b").as[(String, String)].collect()
    def blk(s: String) = s.split(' ').last
    assert(got.forall { case (a, b) => blk(a) == blk(b) },
      s"cross-block pair leaked: ${got.mkString(",")}")
    assert(got.forall { case (a, b) => a < b }, "pairs must be a<b ordered")
  }

  test("blockedPairsWithMass: per-value row mass joins back") {
    val got = FuzzyMatch
      .blockedPairsWithMass(rows, "name", lastTok, maxDist = 2)
      .select("name_a", "name_b", "dist", "n_rows_a", "n_rows_b")
      .as[(String, String, Int, Long, Long)].collect().toSet
    assert(got === Set(("rad widget", "red widget", 1, 1L, 2L)))
  }

  test("distinct-first: the pair join never sees duplicate values") {
    // 100 copies of one value must not produce any pair at all
    val dup = Seq.fill(100)("same name").toDF("name")
    assert(FuzzyMatch.blockedPairs(dup, "name", lastTok, 3).count() === 0L)
  }

  test("plan: no cartesian — the block key is an equi-join key") {
    val p = FuzzyMatch.blockedPairs(rows, "name", lastTok, 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }
}
