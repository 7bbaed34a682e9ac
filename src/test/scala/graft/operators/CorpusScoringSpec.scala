package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CorpusScoringSpec extends SparkTestBase {
  import spark.implicits._

  // two token distributions with a sharp vocabulary split: "target"
  // docs use the alpha vocabulary, "raw" docs the beta vocabulary,
  // and a handful of raw docs are written in the alpha vocabulary —
  // exactly the needles importance weighting exists to surface
  private val targetDocs = (1L to 40L).map(i =>
    (i, s"alpha bravo charlie delta echo alpha bravo t$i", true))
  private val rawNoise = (101L to 180L).map(i =>
    (i, s"zulu yankee xray whiskey victor uniform r$i", false))
  private val rawNeedles = (201L to 210L).map(i =>
    (i, s"alpha bravo charlie delta echo alpha bravo n$i", false))
  private val corpus =
    (targetDocs ++ rawNoise ++ rawNeedles).toDF("id", "text", "is_target")

  test("dsirWeights ranks target-like raw docs above raw-like raw docs") {
    val w = CorpusScoring.dsirWeights(corpus, "id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size === 130)
    val needleMin = (201L to 210L).map(w).min
    val noiseMax = (101L to 180L).map(w).max
    assert(needleMin > noiseMax,
      s"every alpha-vocab raw doc must outscore every beta-vocab one: " +
        s"needleMin=$needleMin noiseMax=$noiseMax")
    // target-like docs are MORE likely under the target model
    assert(needleMin > 0)
  }

  test("dsirWeights is deterministic and counts tokens") {
    val a = CorpusScoring.dsirWeights(corpus, "id", "text", col("is_target"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = CorpusScoring.dsirWeights(corpus, "id", "text", col("is_target"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a === b)
    // alpha-vocab docs carry 8 whitespace tokens, beta-vocab ones 7
    assert(a.forall { case (id, n, _) =>
      n === (if (id >= 101L && id <= 180L) 7L else 8L)
    })
  }

  test("dsirWeights scoring pass plans no shuffle") {
    val plan = CorpusScoring
      .dsirWeights(corpus, "id", "text", col("is_target"))
      .queryExecution.executedPlan.toString
    // the model is a collected literal map; scoring must stay map-only
    assert(!plan.contains("Exchange"),
      s"scoring pass must not shuffle:\n$plan")
  }

  test("importanceResample keeps every saturated doc and only weighted docs") {
    val weights = CorpusScoring
      .dsirWeights(corpus, "id", "text", col("is_target"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val shift = 0.0
    val kept = CorpusScoring.importanceResample(corpus, "id", "text",
      col("is_target"), shift = shift)
      .select("id").as[Long].collect().toSet
    // acceptance is certain at logw >= shift, impossible only below:
    // all needles/targets (logw > 0) must survive
    val saturated = weights.filter(_._2 >= shift).keySet
    assert(saturated.subsetOf(kept),
      s"docs with logw >= shift must always be kept; missing " +
        s"${saturated -- kept}")
    assert(kept.subsetOf(weights.keySet))
  }

  test("importanceResample is deterministic and monotone in shift") {
    def draw(shift: Double): Set[Long] =
      CorpusScoring.importanceResample(corpus, "id", "text",
        col("is_target"), shift = shift)
        .select("id").as[Long].collect().toSet
    assert(draw(0.0) === draw(0.0))
    // a very low shift saturates everything; raising the shift can
    // only shrink the draw (same uniforms, smaller thresholds)
    val all = draw(-100.0)
    assert(all.size === 130)
    val mid = draw(0.0)
    val high = draw(50.0)
    assert(high.subsetOf(mid) && mid.subsetOf(all))
    // exp(logw - 50) quantizes to zero acceptance for this corpus
    assert(high.isEmpty)
  }

  // quality labels with an unambiguous token signal: good docs speak
  // "clean" vocabulary, bad docs "spam" vocabulary
  private val labeled = ((1L to 60L).map(i =>
    (i, s"clean prose sentence structure grammar g$i")) ++
    (61L to 120L).map(i =>
      (i, s"spam junk noise garbage filler b$i"))).toDF("id", "text")
  private val isGood = col("id") <= 60

  test("naiveBayesQuality separates the two vocabularies") {
    val scored = CorpusScoring
      .naiveBayesQuality(labeled, "id", "text", isGood, seedFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(scored.size === 120)
    // every doc classified, both classes present, and the vocabulary
    // signal dominates: good-vocab docs predicted 1, spam-vocab 0
    val goodRight = (1L to 60L).count(scored(_) == 1)
    val badRight = (61L to 120L).count(scored(_) == 0)
    assert(goodRight === 60, s"good-vocab docs misclassified: ${60 - goodRight}")
    assert(badRight === 60, s"spam-vocab docs misclassified: ${60 - badRight}")
  }

  test("naiveBayesQuality seed selection is content-addressed") {
    // growing the corpus must not change existing docs' scores when
    // the new docs stay out of the seed (the same stance as splits:
    // the model only shifts when seed membership shifts, and seed
    // membership of EXISTING ids never changes)
    val before = CorpusScoring
      .naiveBayesQuality(labeled, "id", "text", isGood, seedFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val again = CorpusScoring
      .naiveBayesQuality(labeled, "id", "text", isGood, seedFrac = 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(before === again)
  }

  test("dsirWeights emits no row for NULL-text docs") {
    // UnigramLm's documented contract ("no tokens -> no row") — and the
    // inner-join behavior the DuckDB oracle replays
    val withNull = corpus.union(
      Seq((900L, null.asInstanceOf[String], false)).toDF("id", "text", "is_target"))
    val ids = CorpusScoring.dsirWeights(withNull, "id", "text", col("is_target"))
      .collect().map(_.getLong(0)).toSet
    assert(!ids.contains(900L))
    assert(ids.size === 130)
  }

  test("naiveBayesQuality fails fast on a degenerate seed") {
    // single-class seed: every score would come out NULL without the
    // guard (sum over an absent class is NULL) — must raise instead
    val e = intercept[IllegalArgumentException] {
      CorpusScoring.naiveBayesQuality(labeled, "id", "text",
        isGood = lit(true), seedFrac = 0.5)
    }
    assert(e.getMessage.contains("degenerate NB seed"))
  }

  test("naiveBayesQuality fails fast when a seed class has no tokens") {
    // both classes present as DOCS, but the bad class is all NULL text
    // (zero tokens): the model's bad side would be empty and every
    // score silently NULL without the token-total guard
    val halfNull = ((1L to 30L).map(i => (i, s"clean prose words g$i")) ++
      (31L to 60L).map(i => (i, null.asInstanceOf[String])))
      .toDF("id", "text")
    val e = intercept[IllegalArgumentException] {
      CorpusScoring.naiveBayesQuality(halfNull, "id", "text",
        isGood = col("id") <= 30, seedFrac = 1.0)
    }
    assert(e.getMessage.contains("degenerate NB seed"))
  }

  test("naiveBayesQuality rejects bad seed fractions") {
    intercept[IllegalArgumentException] {
      CorpusScoring.naiveBayesQuality(labeled, "id", "text", isGood,
        seedFrac = 0.0)
    }
    intercept[IllegalArgumentException] {
      CorpusScoring.naiveBayesQuality(labeled, "id", "text", isGood,
        seedFrac = 1.5)
    }
  }

  test("calibration: hand-computed bins, logistic mapping, saturation") {
    // log-odds 0 -> p = 0.5 -> bin 5; +-large saturate to bins 9 / 0;
    // ln(3) -> p = 0.75 -> bin 7
    val scored = Seq(
      (1L, 0.0), (2L, 1000.0), (3L, -1000.0), (4L, math.log(3.0)),
      (5L, 0.001)
    ).toDF("id", "s")
    val truth = Seq((1L, true), (2L, true), (3L, false), (4L, false),
      (5L, false)).toDF("id", "g")
    val got = CorpusScoring.calibration(scored, "id", "s", truth, "g")
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // bin 5 holds ids 1 (p=.5, good) and 5 (p=.50025, bad)
    assert(got(5) === ((2L, 0.500125, 0.5)))
    assert(got(9) === ((1L, 1.0, 1.0)))
    assert(got(0) === ((1L, 0.0, 0.0)))
    assert(got(7) === ((1L, 0.75, 0.0)))
    assert(got.keySet === Set(0, 5, 7, 9))
  }

  test("calibration: bin edges — p exactly 1.0 stays in the top bin") {
    val scored = Seq((1L, 1000.0), (2L, 40.0)).toDF("id", "s")
    val truth = Seq((1L, true), (2L, true)).toDF("id", "g")
    val got = CorpusScoring.calibration(scored, "id", "s", truth, "g")
      .as[(Int, Long, Double, Double)].collect()
    assert(got.length === 1 && got(0)._1 === 9 && got(0)._2 === 2L)
  }
}
