package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Property tests: the distributed operators must agree with trivial
  * in-memory reference implementations on randomized inputs — keys
  * drawn from a small space to force collisions, ties, and re-updates.
  * (Raw ScalaCheck generators sampled under fixed seeds; the
  * scalatest-scalacheck bridge is not on the classpath.)
  */
class OperatorPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val rowGen = for {
    key <- Gen.choose(0L, 6L)
    ts <- Gen.choose(0L, 20L)
    payload <- Gen.alphaStr.map(_.take(4))
  } yield (key, ts, payload)

  private val dataGen = Gen.listOfN(40, rowGen)

  private def samples(n: Int): Seq[List[(Long, Long, String)]] =
    (1 to n).flatMap(i =>
      dataGen(Gen.Parameters.default, Seed(i.toLong)))

  test("latestAll == brute-force argmax-with-ties on random data") {
    samples(8).foreach { rows =>
      val df = rows.toDF("k", "ts", "p")
      val got = LatestVersion.latestAll(df, "k", "ts")
        .as[(Long, Long, String)].collect().toSet
      val maxTs = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val want = rows.filter { case (k, ts, _) => ts == maxTs(k) }.toSet
      assert(got === want, s"input: $rows")
    }
  }

  test("native ngrams/repetition == sliding-window reference on random arrays") {
    val rnd = new scala.util.Random(17)
    (1 to 20).foreach { _ =>
      val toks: Seq[String] = Seq.fill(rnd.nextInt(12))(
        if (rnd.nextInt(10) == 0) null else s"t${rnd.nextInt(4)}")
      val n = rnd.nextInt(3) + 1
      val df = Seq(Tuple1(toks)).toDF("toks")
      val grams = df.select(
        graft.functions.TextFunctions.ngramsOf(col("toks"), n).as("g"))
        .as[Seq[String]].collect().head
      // reference: sliding windows, drop any containing a null token
      val want = toks.sliding(n).filter(_.size == n)
        .filter(!_.contains(null)).map(_.mkString(" ")).toSeq
      assert(grams === want, s"toks=$toks n=$n")
      val ratio = df.select(graft.functions.TextFunctions
          .ngramRepetitionRatioOf(col("toks"), n).as("r"))
        .as[Double].collect().head
      val wantRatio =
        if (want.isEmpty) 0.0 else 1.0 - want.distinct.size.toDouble / want.size
      assert(math.abs(ratio - wantRatio) < 1e-12, s"toks=$toks n=$n")
    }
  }

  private val docGen = Gen.listOfN(12,
    Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))

  test("shingleJaccardPairs == in-memory 3-gram set reference on random docs") {
    (1 to 6).foreach { s =>
      val texts = docGen(Gen.Parameters.default, Seed(s.toLong)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = DedupOps.shingleJaccardPairs(docs.toDF("doc_id", "text"),
          "doc_id", "text", shingleSize = 3, maxDocFreq = None)
        .as[(Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      def shingles(t: String): Set[Seq[String]] =
        t.split("\\s+").toSeq.sliding(3).filter(_.size == 3).toSet
      val want = (for {
        (a, ia) <- docs; (b, ib) <- docs if a < b
        sa = shingles(ia); sb = shingles(ib)
        inter = (sa & sb).size if inter > 0
      } yield (a, b) -> inter.toDouble / (sa.size + sb.size - inter)).toMap
      assert(got.keySet === want.keySet, s"seed $s")
      got.foreach { case (k, j) =>
        assert(math.abs(j - want(k)) < 1e-12, s"seed $s pair $k") }
    }
  }

  test("docNovelty == in-memory df reference on random docs") {
    (1 to 6).foreach { s =>
      val texts = docGen(Gen.Parameters.default, Seed(100L + s)).get
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = CorpusDivergence.docNovelty(docs.toDF("doc_id", "text"),
          "doc_id", "text")
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      def shingles(t: String): Set[Seq[String]] =
        t.split("\\s+").toSeq.sliding(3).filter(_.size == 3).toSet
      val all = docs.map { case (id, t) => id -> shingles(t) }
      val df = all.flatMap(_._2).groupBy(identity).map { case (g, o) => g -> o.size }
      val want = all.filter(_._2.nonEmpty).map { case (id, sh) =>
        id -> ((sh.size.toLong, sh.count(g => df(g) == 1).toLong))
      }.toMap
      assert(got === want, s"seed $s")
    }
  }

  test("weightedSample == in-memory Efraimidis-Spirakis reference") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long, w: Double): Double = {
      val hex = md.digest(s"wsamp:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 281474976710656.0
      BigDecimal(math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val rows = (1L to 200L).map(i => (i, (i % 7 + 1).toDouble))
    val got = TrainingOps.weightedSample(rows.toDF("id", "w"), "id", "w", k = 20)
      .select("id").as[Long].collect().toSeq
    val want = rows.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (-k, id) }.take(20).map(_._1)
    assert(got.sorted === want.sorted)
  }

  test("asOf (union) == brute-force point-in-time lookup on random data") {
    samples(8).zip(samples(8).reverse).foreach { case (probeRows, buildRows) =>
      val probes = probeRows.zipWithIndex
        .map { case ((k, ts, _), i) => (i.toLong, k, new Timestamp(ts * 1000)) }
      val builds = buildRows.zipWithIndex
        .map { case ((k, ts, p), i) => (k, new Timestamp(ts * 1000), p + i, i.toLong) }
      val pdf = probes.toDF("pid", "k", "ts")
      val bdf = builds.toDF("k", "ts", "payload", "bid")
      val got = AsOfJoin.asOf(pdf, bdf, "k", "ts", "ts",
          Seq("payload"), tiebreak = "bid", prefix = "b_")
        .select("pid", "b_payload").as[(Long, Option[String])]
        .collect().toMap
      val want = probes.map { case (pid, k, pts) =>
        val cands = builds.filter(b => b._1 == k && !b._2.after(pts))
        pid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(b => (b._2.getTime, b._4))._3))
      }.toMap
      assert(got === want,
        s"probes: $probes\nbuilds: $builds")
    }
  }

  test("bfsHops == in-memory BFS on random graphs") {
    val rnd = new scala.util.Random(23)
    (1 to 8).foreach { _ =>
      // ~12 nodes, random edges (self-loops and duplicates included on
      // purpose — the frontier must tolerate both), 1-2 seeds
      val nNodes = 12
      val edges = Seq.fill(14 + rnd.nextInt(8))(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
      val seeds = Seq.fill(1 + rnd.nextInt(2))(rnd.nextInt(nNodes).toLong)
        .distinct
      val maxHops = 1 + rnd.nextInt(3)
      val got = GraphMetrics.bfsHops(
          edges.toDF("id_a", "id_b"), seeds.toDF("id"), maxHops)
        .as[(Long, Int)].collect().toMap
      // reference: level-synchronous BFS over an adjacency map
      val adj = (edges ++ edges.map(_.swap))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (h <- 1 to maxHops) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .diff(dist.keySet)
        dist ++= next.map(_ -> h)
        frontier = next
      }
      assert(got === dist, s"edges=$edges seeds=$seeds maxHops=$maxHops")
    }
  }
}
