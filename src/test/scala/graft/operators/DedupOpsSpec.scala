package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Near-dup detection on planted duplicates: MinHash-LSH must surface a
  * 95%-identical pair, must not pair unrelated docs, SimHash Hamming
  * distance must separate near-dups from unrelated docs.
  */
class DedupOpsSpec extends SparkTestBase {
  import spark.implicits._

  private val base = (1 to 60).map(i => s"tok$i").mkString(" ")
  private val nearDup = (1 to 60).map(i => if (i == 30) "CHANGED" else s"tok$i").mkString(" ")
  private val unrelated = (100 to 160).map(i => s"zzz$i").mkString(" ")
  private val exactCopy = base

  private lazy val docs = Seq(
    (1L, base), (2L, nearDup), (3L, unrelated), (4L, exactCopy)
  ).toDF("doc_id", "text")

  test("exactDedup groups identical texts and keeps min id") {
    val got = DedupOps.exactDedup(docs, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("exactDedup: null-text docs form no group (GROUP BY would merge them all)") {
    val withNulls = Seq(
      (1L, Option("same")), (2L, Option("same")),
      (10L, Option.empty[String]), (11L, Option.empty[String])
    ).toDF("doc_id", "text")
    val got = DedupOps.exactDedup(withNulls, "doc_id", "text")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)),
      s"null docs must not collapse into one dup group, got $got")
  }

  test("minhash LSH surfaces planted near-dup and exact pairs, not unrelated") {
    val pairs = DedupOps.minhashCandidatePairs(docs, "doc_id", "text",
      numHashes = 32, bands = 16, shingleSize = 3)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact copy must collide in every band")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)),
      s"planted near-dup should be a candidate, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc must not pair, got $pairs")
  }

  test("minhash LSH: null-text docs emit no candidate pairs") {
    val withNulls = Seq(
      (1L, Option("a b c d e f")), (2L, Option("a b c d e f")),
      (10L, Option.empty[String]), (11L, Option.empty[String])
    ).toDF("doc_id", "text")
    val pairs = DedupOps.minhashCandidatePairs(withNulls, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)),
      s"null docs must never pair (got $pairs) — the pre-native banding " +
        "hashed all null docs into one bucket and paired them")
  }

  test("simhash: identical fp for copies, near for near-dups, far for unrelated") {
    val fps = DedupOps.simhash(docs, "text")
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(1L) === fps(4L))
    assert(hamming(fps(1L), fps(2L)) < 16,
      s"near-dup hamming ${hamming(fps(1L), fps(2L))}")
    assert(hamming(fps(1L), fps(3L)) > 16,
      s"unrelated hamming ${hamming(fps(1L), fps(3L))}")
  }

  test("tokenJaccardPairs computes exact jaccard") {
    val two = Seq((1L, "a b c d"), (2L, "c d e f")).toDF("doc_id", "text")
    val got = DedupOps.tokenJaccardPairs(two, "doc_id", "text")
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.length === 1)
    assert(got.head === ((1L, 2L, 2.0 / 6.0)))
  }

  test("shingleJaccardPairs computes exact 3-gram jaccard") {
    val two = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    // shingles: {a b c, b c d} vs {b c d, c d e} -> 1 common / 3 union
    val got = DedupOps.shingleJaccardPairs(two, "doc_id", "text",
        shingleSize = 3, maxDocFreq = None)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got.length === 1)
    assert(got.head === ((1L, 2L, 1.0 / 3.0)))
  }

  test("shingleJaccardPairs: docs shorter than one shingle emit no rows") {
    val short = Seq((1L, "a b"), (2L, "a b"), (3L, "a b c d")).toDF("doc_id", "text")
    val got = DedupOps.shingleJaccardPairs(short, "doc_id", "text",
      shingleSize = 3, maxDocFreq = None).collect()
    assert(got.isEmpty, s"2-token docs have no 3-shingles, got ${got.toSeq}")
  }

  test("lshRecall: planted truth counted, exact-copy pair is always a hit") {
    val row = DedupOps.lshRecall(docs, "doc_id", "text", tau = 0.5,
        numHashes = 32, bands = 16, shingleSize = 3, maxDocFreq = None)
      .select("n_truth", "n_cand", "n_hit", "recall", "precision")
      .as[(Long, Long, Long, Double, Double)].head()
    val (nTruth, nCand, nHit, recall, precision) = row
    // truth at tau=0.5: (1,2) and (2,4) differ from base in one token
    // (jaccard ~0.9), (1,4) identical
    assert(nTruth === 3L, s"expected 3 truth pairs, got $nTruth")
    // identical docs collide in every band -> (1,4) is a candidate AND
    // truth, so at least one hit is structural
    assert(nHit >= 1L && nHit <= math.min(nTruth, nCand))
    assert(recall === math.rint(nHit.toDouble / nTruth * 1e6) / 1e6)
    assert(precision === math.rint(nHit.toDouble / nCand * 1e6) / 1e6)
  }

  test("simhashBandPairs: exact copies pair at hamming 0, unrelated never pair") {
    val got = DedupOps.simhashBandPairs(docs, "doc_id", "text",
        maxHamming = 3, bands = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((1L, 4L, 0L)), s"exact copies must pair at 0, got $got")
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc (hamming > 16 from all) must not pair, got $got")
    // widening the threshold can only add pairs (monotonicity)
    val strict = DedupOps.simhashBandPairs(docs, "doc_id", "text",
      maxHamming = 0, bands = 4).as[(Long, Long, Long)].collect().toSet
    assert(strict.subsetOf(got))
  }

  test("simhashBandPairs rejects a threshold outside the pigeonhole guarantee") {
    intercept[IllegalArgumentException] {
      DedupOps.simhashBandPairs(docs, "doc_id", "text",
        maxHamming = 4, bands = 4)
    }
    intercept[IllegalArgumentException] {
      DedupOps.simhashBandPairs(docs, "doc_id", "text", bands = 5)
    }
  }

  test("DF cap defuses a hot token: docs sharing only a stop word never pair") {
    // 50 docs that share ONLY the token "the" — uncapped, that one
    // token alone contributes 50*49/2 candidate pairs
    val hot = (1 to 50).map(i => (i.toLong, s"the unique$i")).toDF("doc_id", "text")
    val capped = DedupOps.tokenJaccardPairs(hot, "doc_id", "text",
      maxDocFreq = Some(10)).count()
    assert(capped === 0L, "capped hot token must produce no candidate pairs")
    val uncapped = DedupOps.tokenJaccardPairs(hot, "doc_id", "text",
      maxDocFreq = None).count()
    assert(uncapped === 50L * 49 / 2, "sanity: uncapped quadratic blowup is real")
  }

  test("dropNearDuplicates removes confirmed losers") {
    val pairs = Seq((1L, 4L)).toDF("id_a", "id_b")
    val kept = DedupOps.dropNearDuplicates(docs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L))
  }

  test("duplicateClusters: transitive chains collapse to the min id") {
    // chain 1-2-3 (no direct 1-3 edge), separate pair 10-11, and a
    // cycle 20-21-22-20
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("id_a", "id_b")
    val labels = DedupOps.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicateClusters (distributed path) refuses to return non-converged labels") {
    // a 6-chain needs ~5 propagation rounds; cap at 2 and expect a
    // loud failure instead of silently wrong canonicals
    // (driverThreshold = 0 forces the distributed path)
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      DedupOps.duplicateClusters(chain, maxIter = 2, driverThreshold = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("duplicateClusters: driver union-find == distributed propagation") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 120)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("id_a", "id_b")
    val small = DedupOps.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toSet
    val dist = DedupOps.duplicateClusters(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toSet
    assert(small === dist)
  }

  test("duplicateClusters supports string ids") {
    val pairs = Seq(("b", "a"), ("b", "c"), ("x", "y")).toDF("id_a", "id_b")
    val got = DedupOps.duplicateClusters(pairs)
      .as[(String, String)].collect().toMap
    assert(got === Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"))
  }

  test("dropNearDuplicateClusters keeps exactly one doc per cluster") {
    val moreDocs = (1L to 6L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    // clusters {1,2,3} (chain) and {5,6}; 4 untouched
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val kept = DedupOps.dropNearDuplicateClusters(moreDocs, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L, 5L))
  }

  test("containmentPairs: full quote scores 1.0 where Jaccard stays low") {
    val docs = Seq(
      (1L, "a b c d e f g h"),       // 6 shingles
      (2L, "c d e f"),               // 2 shingles, both inside doc 1
      (3L, "x y z w")                // unrelated
    ).toDF("doc_id", "text")
    val got = DedupOps.containmentPairs(docs, "doc_id", "text", tau = 0.9,
        maxDocFreq = None)
      .select("doc_a", "doc_b", "cont_a", "cont_b")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.toSeq === Seq((1L, 2L, 2.0 / 6.0, 1.0)),
      "the contained side must score exactly 1.0")
    // the same pair fails a symmetric Jaccard 0.5 gate: 2/(6+2-2) = 1/3
    val jac = DedupOps.shingleJaccardPairs(docs, "doc_id", "text",
        maxDocFreq = None)
      .filter($"jaccard" >= 0.5).count()
    assert(jac === 0L, "Jaccard must miss the asymmetric quote pair")
  }

  test("containmentPairs: tau gates on the max direction") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "c d e f")
    ).toDF("doc_id", "text")
    assert(DedupOps.containmentPairs(docs, "doc_id", "text", tau = 1.0,
      maxDocFreq = None).count() === 1L)
    // raise the bar above the max direction: pair disappears
    val partial = Seq(
      (1L, "a b c d e f g h"),
      (2L, "c d e f q r s")  // 5 shingles, only 2 shared -> max cont 0.4
    ).toDF("doc_id", "text")
    assert(DedupOps.containmentPairs(partial, "doc_id", "text", tau = 0.5,
      maxDocFreq = None).count() === 0L)
    assert(DedupOps.containmentPairs(partial, "doc_id", "text", tau = 0.4,
      maxDocFreq = None).count() === 1L)
  }

  test("canonicalPerCluster keeps the best-scored member, ties to the smaller id") {
    val d = Seq(
      (1L, 10L), (2L, 50L), (3L, 20L), // cluster {1,2,3}: 2 has most chars
      (5L, 30L), (6L, 30L),            // cluster {5,6}: score tie -> 5
      (9L, 7L)                         // unclustered: its own canonical
    ).toDF("doc_id", "n_chars")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = DedupOps.canonicalPerCluster(d, "doc_id", "n_chars",
        DedupOps.duplicateClusters(pairs))
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 2L, false), (2L, 2L, true), (3L, 2L, false),
      (5L, 5L, true), (6L, 5L, false), (9L, 9L, true)))
  }

  test("canonicalPerCluster: exactly one keeper per cluster, none lost") {
    val d = (1L to 30L).map(i => (i, i % 7)).toDF("doc_id", "n_chars")
    val pairs = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = DedupOps.canonicalPerCluster(d, "doc_id", "n_chars",
      DedupOps.duplicateClusters(pairs))
    assert(got.count() === 30L)
    assert(got.filter(col("keep")).count() === 1L) // one giant chain
    // the keeper is the max score (6), smallest such id (6)
    assert(got.filter(col("keep")).select("doc_id")
      .as[Long].collect().head === 6L)
  }
}
