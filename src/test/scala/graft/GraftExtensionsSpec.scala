package graft

/** The SQL surface of the native expressions, registered through
  * GraftExtensions (same builders the SparkSessionExtensions path
  * injects, applied to the shared test session).
  */
class GraftExtensionsSpec extends SparkTestBase {

  private lazy val sql = {
    GraftExtensions.register(spark)
    spark
  }

  test("graft_dot is callable from SQL") {
    val got = sql.sql(
      "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
      .head().getDouble(0)
    assert(got === 32.0)
  }

  test("graft_srp_buckets is callable from SQL and matches the Column API") {
    import org.apache.spark.sql.functions._
    val viaSql = sql.sql(
      "SELECT graft_srp_buckets(array(0.5D, -0.25D, 1.0D), 4, 8, 64) AS b")
      .head().getSeq[Long](0)
    val viaApi = sql.range(1)
      .select(graft.functions.NativeExpressions.srpBucketArray(
        typedlit(Seq(0.5, -0.25, 1.0)), 4, 8, 64).as("b"))
      .head().getSeq[Long](0)
    assert(viaSql.length === 4)
    assert(viaSql === viaApi)
  }

  test("graft_redact is callable from SQL and matches the Column API") {
    import org.apache.spark.sql.functions._
    val viaSql = sql.sql("SELECT graft_redact('mail bob@x.io on 555') AS red")
      .head().getString(0)
    assert(viaSql === "mail <EMAIL> on ###")
    val viaApi = sql.range(1)
      .select(graft.functions.TextFunctions.redactPii(
        lit("mail bob@x.io on 555")).as("red"))
      .head().getString(0)
    assert(viaSql === viaApi)
  }

  test("graft_simhash and graft_minhash are callable from SQL") {
    val r = sql.sql(
      """SELECT graft_simhash(transform(split('a b c', ' '), t -> xxhash64(t))) AS sh,
                graft_minhash(transform(split('a b c d e', ' '), t -> xxhash64(t)), 4, 2) AS mh""")
      .head()
    assert(r.getLong(0) !== 0L)
    assert(r.getSeq[Long](1).length === 4)
  }
}
