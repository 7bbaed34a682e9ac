package graft

/** The two pinned-fixture oracles (OracleFixtures) assert the engine's
  * own deterministic sf0.01 outputs. If a refactor of the tokenizer or
  * the hash expressions shifts those outputs, the driver's correctness
  * gate would go red a round later — this spec runs the SAME comparison
  * offline (the fixture SQL is engine-portable VALUES + casts, so Spark
  * can evaluate it directly), failing `sbt test` at the commit that
  * drifted. On drift: either revert the semantic change or regenerate
  * OracleFixtures from the new Verify output (see its scaladoc).
  */
class FixtureDriftSpec extends SparkTestBase {
  import spark.implicits._

  private val dir = sf("sf0.01")

  test("q_minhash_pairs output still matches the pinned fixture") {
    val got = SparkEntry.queries("q_minhash_pairs")(spark, dir)
      .as[(Long, Long)].collect().toSet
    val want = spark.sql(OracleFixtures.minhashPairsSql)
      .as[(Long, Long)].collect().toSet
    assert(got === want, "minhash pipeline drifted from the pinned fixture")
  }

  test("q_simhash output still matches the pinned fixture") {
    val got = SparkEntry.queries("q_simhash")(spark, dir)
      .as[(Long, Long)].collect().toSet
    val want = spark.sql(OracleFixtures.simhashSql)
      .as[(Long, Long)].collect().toSet
    assert(got === want, "simhash pipeline drifted from the pinned fixture")
  }

  // sf0.1 variants (resource-backed; swapped into the oracle dump by
  // Verify for cross-scale runs) — guarded here at the same commit
  // granularity as the sf0.01 literals

  test("q_minhash_pairs sf0.1 output still matches the pinned fixture") {
    val got = SparkEntry.queries("q_minhash_pairs")(spark, sf("sf0.1"))
      .as[(Long, Long)].collect().toSet
    val want = spark.sql(OracleFixtures.minhashPairsSqlSf01)
      .as[(Long, Long)].collect().toSet
    assert(got === want, "minhash pipeline drifted from the sf0.1 fixture")
  }

  test("q_simhash sf0.1 output still matches the pinned fixture") {
    val got = SparkEntry.queries("q_simhash")(spark, sf("sf0.1"))
      .as[(Long, Long)].collect().toSet
    val want = spark.sql(OracleFixtures.simhashSqlSf01)
      .as[(Long, Long)].collect().toSet
    assert(got === want, "simhash pipeline drifted from the sf0.1 fixture")
  }
}
