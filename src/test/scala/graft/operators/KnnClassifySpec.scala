package graft.operators

import graft.SparkTestBase

class KnnClassifySpec extends SparkTestBase {
  import spark.implicits._

  // labeled electorate: 3 vectors near +e0 labeled 7, 2 near +e1
  // labeled 3; probe 100 points at +e0, probe 101 at +e1
  private val labeled = Seq(
    (10L, Seq(1.0, 0.1, 0.0), Some(7)),
    (11L, Seq(1.0, 0.2, 0.0), Some(7)),
    (12L, Seq(1.0, 0.0, 0.1), Some(7)),
    (13L, Seq(0.1, 1.0, 0.0), Some(3)),
    (14L, Seq(0.0, 1.0, 0.1), Some(3)),
    (15L, Seq(0.5, 0.5, 0.5), None) // null label: not in the electorate
  ).toDF("vec_id", "embedding", "label")

  private val probes = Seq(
    (100L, Seq(1.0, 0.0, 0.0), Option.empty[Int]),
    (101L, Seq(0.0, 1.0, 0.0), Option.empty[Int])
  ).toDF("vec_id", "embedding", "label")

  test("majority vote of the k nearest labeled neighbors") {
    val out = KnnClassify.classify(probes, labeled, "vec_id",
        "embedding", "label", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2)))
      .toMap
    assert(out(100L) === ((7, 3L)), "all 3 nearest to +e0 are label 7")
    assert(out(101L)._1 === 3, "+e1 probe majority is label 3")
  }

  test("vote ties break to the smaller label") {
    // k = 4 at +e1: neighbors 13,14 (label 3) and two of 10/11/12
    // (label 7) -> 2 vs 2, tie -> label 3
    val out = KnnClassify.classify(
        probes.filter($"vec_id" === 101L), labeled, "vec_id",
        "embedding", "label", k = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2)))
      .toMap
    assert(out(101L) === ((3, 2L)))
  }

  test("null-labeled rows never vote") {
    val out = KnnClassify.classify(probes, labeled, "vec_id",
        "embedding", "label", k = 100).collect()
    assert(out.forall(_.getLong(2) <= 5L), "only the 5 labeled rows vote")
  }

  test("labelSuspects flags the planted mislabel and only it") {
    // a +e0 vector mislabeled 3 inside the label-7 cluster
    val withNoise = Seq(
      (10L, Seq(1.0, 0.1, 0.0), Some(7)),
      (11L, Seq(1.0, 0.2, 0.0), Some(7)),
      (12L, Seq(1.0, 0.0, 0.1), Some(7)),
      (16L, Seq(1.0, 0.1, 0.1), Some(3)), // the mislabel
      (13L, Seq(0.1, 1.0, 0.0), Some(3)),
      (14L, Seq(0.0, 1.0, 0.1), Some(3)),
      (17L, Seq(0.1, 1.0, 0.1), Some(3))
    ).toDF("vec_id", "embedding", "label")
    val out = KnnClassify.labelSuspects(withNoise, "vec_id", "embedding",
        "label", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getBoolean(4)))
      .toMap
    assert(out(16L) === ((7, true)), "the planted mislabel must be flagged")
    assert(out.filter(_._2._2).keySet === Set(16L),
      s"only the planted mislabel should be suspect: $out")
    assert(out.size === 7, "every labeled row is audited")
  }

  test("labelSuspectsIvf agrees with the brute audit when every cell is probed") {
    val withNoise = Seq(
      (10L, Seq(1.0, 0.1, 0.0), Some(7)),
      (11L, Seq(1.0, 0.2, 0.0), Some(7)),
      (12L, Seq(1.0, 0.0, 0.1), Some(7)),
      (16L, Seq(1.0, 0.1, 0.1), Some(3)), // the mislabel
      (13L, Seq(0.1, 1.0, 0.0), Some(3)),
      (14L, Seq(0.0, 1.0, 0.1), Some(3)),
      (17L, Seq(0.1, 1.0, 0.1), Some(3))
    ).toDF("vec_id", "embedding", "label")
    // nProbe = nCells: the index prunes nothing, so the approximate
    // audit must reproduce the brute verdicts row for row
    val brute = KnnClassify.labelSuspects(withNoise, "vec_id", "embedding",
        "label", k = 3)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getBoolean(4)))
      .toMap
    val ivf = KnnClassify.labelSuspectsIvf(withNoise, "vec_id", "embedding",
        "label", k = 3, nCells = 2, nProbe = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getBoolean(4)))
      .toMap
    assert(ivf === brute)
  }

  test("labelSuspectsIvf still catches the in-cell mislabel under real pruning") {
    // ids ordered so the 2 lowest-id centroid seeds straddle the
    // clusters: cell 0 ~ +e0, cell 1 ~ +e1
    val withNoise = Seq(
      (10L, Seq(1.0, 0.1, 0.0), Some(7)),
      (11L, Seq(0.1, 1.0, 0.0), Some(3)),
      (12L, Seq(1.0, 0.2, 0.0), Some(7)),
      (13L, Seq(1.0, 0.0, 0.1), Some(7)),
      (16L, Seq(1.0, 0.1, 0.1), Some(3)), // the mislabel, inside the e0 cell
      (14L, Seq(0.0, 1.0, 0.1), Some(3)),
      (17L, Seq(0.1, 1.0, 0.1), Some(3))
    ).toDF("vec_id", "embedding", "label")
    // nProbe = 1 of 2 cells: each vector is audited only against its
    // own cluster — the mislabel's neighborhood is all label 7
    val out = KnnClassify.labelSuspectsIvf(withNoise, "vec_id", "embedding",
        "label", k = 3, nCells = 2, nProbe = 1)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out(16L), "pruned audit must still flag the in-cell mislabel")
  }
}
