package graft.operators

import graft.SparkTestBase

class GraphMetricsSpec extends SparkTestBase {
  import spark.implicits._

  test("triangleCounts: K4 gives every node C(3,2) = 3 triangles") {
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
      .toDF("id_a", "id_b")
    val got = GraphMetrics.triangleCounts(k4)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("one triangle plus a pendant edge: pendant node absent") {
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val got = GraphMetrics.triangleCounts(g).as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("edge direction, duplicates, and self-loops are canonicalized away") {
    val messy = Seq(
      (2L, 1L), (1L, 2L), // reversed + duplicate
      (2L, 3L), (3L, 1L),
      (2L, 2L) // self-loop
    ).toDF("id_a", "id_b")
    val got = GraphMetrics.triangleCounts(messy)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("a chain has no triangles") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    assert(GraphMetrics.triangleCounts(chain).count() === 0L)
  }
}
