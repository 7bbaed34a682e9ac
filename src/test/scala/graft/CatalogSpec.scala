package graft

/** Contract guards for the driver interface: every oracle key must
  * reference an existing query (a typo here would silently zero the
  * round's correctness score), and every query must be buildable
  * against the smoke-scale data.
  */
class CatalogSpec extends SparkTestBase {

  test("every oracleSql key has a matching queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without a query: $orphans")
  }

  test("every query has an oracle — no rows-only coverage regressions") {
    // round 2 reached 100% oracle coverage; keep it that way
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without an oracle: $unoracled")
  }

  test("all queries build and return rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf("sf0.001")).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"queries with zero rows at smoke scale: $empty")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
