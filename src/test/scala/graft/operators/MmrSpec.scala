package graft.operators

import graft.SparkTestBase

class MmrSpec extends SparkTestBase {
  import spark.implicits._

  // probe 0 along [1, 0, 0]; candidates: two near-identical
  // high-relevance vectors (1, 2: sim ~0.99997, rel ~0.9939) and one
  // moderately-relevant but genuinely diverse vector
  // (3: rel ~0.9435, sim to 1 ~0.9261). At lambda = 0.5 the twin's
  // redundancy penalty (score ~-0.0031) loses to the diverse pick
  // (score ~+0.0087).
  private lazy val corpus = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.9f, 0.1001f, 0.0f)),
    (3L, Array(0.9f, -0.1f, 0.3f))
  ).toDF("vec_id", "embedding")

  test("MMR skips the redundant twin in favor of the diverse candidate") {
    val got = Mmr.mmrRerank(corpus, "vec_id", "embedding",
        probeId = 0L, candidateK = 3, k = 2, lambda = 0.5)
      .select("rank", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(got.head._2 === 1L, s"first pick = most relevant (lower id tie): $got")
    assert(got(1)._2 === 3L,
      s"second pick must be the diverse vector, not the near-copy twin: $got")
  }

  test("lambda = 1 reduces to pure relevance ranking") {
    val got = Mmr.mmrRerank(corpus, "vec_id", "embedding",
        probeId = 0L, candidateK = 3, k = 3, lambda = 1.0)
      .select("neighbor_id").as[Long].collect().toSeq
    // pure cosine order: 1 (~0.99995), 2 (~0.99994), 3 (~0.53)
    assert(got === Seq(1L, 2L, 3L), s"got $got")
  }

  test("invalid parameters rejected") {
    intercept[IllegalArgumentException] {
      Mmr.mmrRerank(corpus, "vec_id", "embedding", 0L,
        candidateK = 2, k = 3, lambda = 0.5)
    }
    intercept[IllegalArgumentException] {
      Mmr.mmrRerank(corpus, "vec_id", "embedding", 0L,
        candidateK = 3, k = 2, lambda = 1.5)
    }
  }
}
