package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GraphAnnDistSpec extends SparkTestBase {
  import spark.implicits._

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("src_id", "dst_id").as[(Long, Long)].collect().toSet

  test("one-cell distributed build IS the driver build") {
    // with a single cell the partitioned path runs the identical
    // insertion over the identical node set — the driver graph's
    // bidirectional adjacency and the distributed edge list must match
    // pair for pair
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .filter(col("vec_id") < 48)
    val g = GraphAnn.buildGraph(emb, "vec_id", "embedding",
      nNodes = 48, m = 4)
    val ids = emb.orderBy("vec_id").select("vec_id")
      .as[Long].collect()
    val driverEdges = (0 until g.nNodes).flatMap { i =>
      (g.adjOff(i) until g.adjOff(i + 1)).map(p => (ids(i), ids(g.adj(p))))
    }.toSet
    val dist = edgeSet(GraphAnnDist.buildIndex(emb, "vec_id", "embedding",
      nCells = 1, m = 4, mCells = 2))
    assert(dist === driverEdges)
  }

  test("deterministic under input partitioning and row order") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val a = edgeSet(GraphAnnDist.buildIndex(emb, "vec_id", "embedding",
      nCells = 8, m = 4, mCells = 2))
    val shuffled = emb.repartition(17, col("label"))
      .sortWithinPartitions(col("vec_id").desc)
    val b = edgeSet(GraphAnnDist.buildIndex(shuffled, "vec_id", "embedding",
      nCells = 8, m = 4, mCells = 2))
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("stitched graph is connected and every node is present") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val n = emb.count()
    val edges = edgeSet(GraphAnnDist.buildIndex(emb, "vec_id", "embedding",
      nCells = 8, m = 4, mCells = 2))
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    assert(adj.keySet.size.toLong === n, "every node must carry edges")
    // every link present in both directions
    assert(edges.forall { case (s, d) => edges((d, s)) })
    val start = adj.keySet.min
    val seen = scala.collection.mutable.Set(start)
    val stack = scala.collection.mutable.Stack(start)
    while (stack.nonEmpty) {
      adj(stack.pop()).foreach { nb =>
        if (!seen(nb)) { seen += nb; stack.push(nb) }
      }
    }
    assert(seen.size.toLong === n,
      "entry stitching must connect every cell subgraph")
  }

  test("planted exact-tie cells: rank-r node links to the lowest min(m,r) ordinals") {
    // every member of a cell carries the IDENTICAL vector, so all
    // within-cell cosines tie at 1 and selection is pure ordinal
    // tie-breaking: node at within-cell rank r must link forward to
    // ordinals 0..min(m,r)-1 — the same planted bar the tier-2 stress
    // phase asserts at 1M nodes
    val k = 3; val per = 6; val m = 2
    val rows = for (id <- 0 until (k * per)) yield {
      val c = id % k
      (id.toLong, Array.tabulate(4)(j =>
        (if (j == c) 10f else 1f) + c))
    }
    val df = rows.toDF("vec_id", "embedding")
    val edges = edgeSet(GraphAnnDist.buildIndex(df, "vec_id", "embedding",
      nCells = k, m = m, mCells = 1))
    // ids 0..k-1 are the centroids (one per cluster); members of
    // cluster c are ids {c, c+k, c+2k, ...}, so within-cell ordinal r
    // maps to id c + r*k
    for (c <- 0 until k; r <- 1 until per; t <- 0 until math.min(m, r)) {
      val src = (c + r * k).toLong
      val dst = (c + t * k).toLong
      assert(edges((src, dst)), s"missing planted edge $src -> $dst")
    }
    // forward-degree bound: rank-r node sends exactly min(m, r) links,
    // so total within edges = 2 * k * sum(min(m, r))
    val expectWithin = 2 * k * (1 until per).map(math.min(m, _)).sum
    val stitch = 2 * (1 until k).map(math.min(1, _)).sum
    assert(edges.size === expectWithin + stitch)
  }

  test("exhaustive-beam searchIndex equals the IVF candidate scan exactly") {
    // with ef past the largest cell the beam visits every member of
    // the probed cells (connected within-cell graph), so the result
    // must be ROW-IDENTICAL to ivfTopK over the same quantizer — the
    // identity the q_gann_search oracle relies on
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 32)
    val edges = GraphAnnDist.buildIndex(emb, "vec_id", "embedding",
      nCells = 8, m = 4, mCells = 2)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("probe_id").cast("long"), col("neighbor_id").cast("long"),
        col("rank").cast("long"), col("cosine").cast("double"))
      .as[(Long, Long, Long, Double)].collect().toSet
    val beam = norm(GraphAnnDist.searchIndex(emb, edges, probes,
      "vec_id", "embedding", nCells = 8, k = 5, ef = 1 << 20, nProbe = 3))
    val ivf = norm(SimilaritySearch.ivfTopK(probes, emb, "vec_id",
      "embedding", k = 5, nCells = 8, nProbe = 3))
    assert(beam === ivf)
    assert(beam.nonEmpty)
  }

  test("beam-limited searchIndex: planted clusters give perfect recall") {
    // probes are corpus members of exact-tie clusters; every hit must
    // come from the probe's own cluster and k must fill — the same bar
    // the tier-2 stress phase requires at 1M+ nodes
    val k = 4; val per = 30; val m = 3
    val rows = for (id <- 0 until (k * per)) yield {
      val c = id % k
      (id.toLong, Array.tabulate(4)(j => (if (j == c) 10f else 1f) + c))
    }
    val df = rows.toDF("vec_id", "embedding")
    val edges = GraphAnnDist.buildIndex(df, "vec_id", "embedding",
      nCells = k, m = m, mCells = 1)
    val hits = GraphAnnDist.searchIndex(df, edges,
      df.filter(col("vec_id") < 8), "vec_id", "embedding",
      nCells = k, k = 5, ef = 8, nProbe = 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
    assert(hits.length === 8 * 5, "every probe must fill its k")
    hits.foreach { case (p, n) =>
      assert(n % k === p % k, s"hit $n outside probe $p's cluster")
      assert(n !== p, "self-matches must be excluded")
    }
  }

  test("appendToIndex is order-free: batch splits and row order commute") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 64)
    val apps = emb.filter(col("vec_id") >= 64)
    val oneShot = edgeSet(GraphAnnDist.appendToIndex(base, apps,
      "vec_id", "embedding", nCells = 4, m = 3))
    // two ingest batches, fed separately, shuffled row order
    val b1 = apps.filter(pmod(col("vec_id"), lit(2L)) === 0)
      .repartition(7).sortWithinPartitions(col("vec_id").desc)
    val b2 = apps.filter(pmod(col("vec_id"), lit(2L)) === 1)
    val split = edgeSet(GraphAnnDist.appendToIndex(base, b1,
      "vec_id", "embedding", nCells = 4, m = 3)) ++
      edgeSet(GraphAnnDist.appendToIndex(base, b2,
        "vec_id", "embedding", nCells = 4, m = 3))
    assert(split === oneShot)
    assert(oneShot.nonEmpty)
    // every append links to m base members (4 cells over 64 base ids:
    // every cell has >= m members for this corpus), bidirectionally
    val fwd = oneShot.filter(_._1 >= 64)
    assert(fwd.groupBy(_._1).forall(_._2.size == 3))
    assert(oneShot.forall { case (s, d) => oneShot((d, s)) })
  }

  test("appendToIndex: hand-computed nearest-base links on a crafted corpus") {
    // two orthogonal base clusters; appends must link to exactly the
    // m nearest base members of THEIR cluster's cell, ids ascending
    // on cosine ties
    val base = Seq(
      (0L, Array(1f, 0f, 0f)),     // centroid 0
      (1L, Array(0f, 1f, 0f)),     // centroid 1
      (2L, Array(1f, 0f, 0f)),     // cell 0
      (3L, Array(0f, 1f, 0f)),     // cell 1
      (4L, Array(0.9f, 0.1f, 0f))  // cell 0
    ).toDF("vec_id", "embedding")
    val apps = Seq(
      (10L, Array(2f, 0f, 0f)), // cell 0: cos 1 with 0 and 2 -> both (tie, ids asc)
      (11L, Array(0f, 3f, 0f))  // cell 1: cos 1 with 1 and 3 -> both
    ).toDF("vec_id", "embedding")
    val got = edgeSet(GraphAnnDist.appendToIndex(base, apps, "vec_id",
      "embedding", nCells = 2, m = 2))
    val fwd = got.filter(_._1 >= 10L)
    assert(fwd === Set((10L, 0L), (10L, 2L), (11L, 1L), (11L, 3L)))
    assert(got.forall { case (s, d) => got((d, s)) })
  }

  test("hot cell past maxCellSize fails fast with the refit message") {
    val df = (0 until 64).map(i => (i.toLong, Array(1f, 0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[org.apache.spark.SparkException] {
      GraphAnnDist.buildIndex(df, "vec_id", "embedding",
        nCells = 2, m = 2, mCells = 1, maxCellSize = 8).count()
    }
    assert(e.getMessage.contains("more cells") ||
      Option(e.getCause).exists(_.getMessage.contains("more cells")))
  }
}
