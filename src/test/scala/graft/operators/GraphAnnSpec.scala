package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GraphAnnSpec extends SparkTestBase {
  import spark.implicits._

  test("buildGraph is connected and degree-bounded from below") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val g = GraphAnn.buildGraph(emb, "vec_id", "embedding", nNodes = 32, m = 4)
    assert(g.nNodes === 32)
    // every node i>0 linked to >= min(m, i) predecessors -> connected
    val seen = scala.collection.mutable.BitSet(0)
    val stack = scala.collection.mutable.Stack(0)
    while (stack.nonEmpty) {
      val c = stack.pop()
      (g.adjOff(c) until g.adjOff(c + 1)).map(g.adj).foreach { nb =>
        if (!seen(nb)) { seen += nb; stack.push(nb) }
      }
    }
    assert(seen.size === 32, "graph must be connected")
    (1 until 32).foreach { i =>
      assert(g.adjOff(i + 1) - g.adjOff(i) >= math.min(4, i),
        s"node $i under-linked")
    }
  }

  test("exhaustive beam equals ivfTopK with nodes as centroids") {
    // ef >= nNodes expands the whole connected graph, so routing is
    // the exact argmax over the node set — which is ivfTopK's
    // assignment with the identical (lowest-id) centroid set. The two
    // operators must then return the same rows.
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 32)
    val graph = GraphAnn.graphTopK(probes, emb, "vec_id", "embedding",
        k = 5, nNodes = 16, m = 4, nProbe = 4, ef = 16)
      .select("probe_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val ivf = SimilaritySearch.ivfTopK(probes, emb, "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4)
      .select("probe_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(graph === ivf)
  }

  test("beam-limited recall against brute force on real embeddings") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 32)
    val brute = SimilaritySearch.bruteTopK(probes, emb, "vec_id",
        "embedding", 1)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toMap
    // realistic serving shape: 64 routing nodes, beam 16 << 64
    val ann = GraphAnn.graphTopK(probes, emb, "vec_id", "embedding",
        k = 5, nNodes = 64, m = 6, nProbe = 8, ef = 16)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = brute.count { case (p, n) =>
      ann.getOrElse(p, Set.empty).contains(n) }
    assert(hits >= brute.size / 2,
      s"graph-ANN recall@top1 too low: $hits/${brute.size}")
  }

  test("result is independent of corpus partitioning/order") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 16)
    def run(c: org.apache.spark.sql.DataFrame) =
      GraphAnn.graphTopK(probes, c, "vec_id", "embedding",
          k = 5, nNodes = 16, m = 4, nProbe = 3, ef = 8)
        .select("probe_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    val a = run(emb)
    val b = run(emb.repartition(7, col("vec_id")).sortWithinPartitions(
      col("vec_id").desc))
    assert(a === b)
  }

  test("salted fallback tier returns the broadcast tier's rows") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 16)
    def run(threshold: Option[Long]) =
      GraphAnn.graphTopK(probes, emb, "vec_id", "embedding",
          k = 5, nNodes = 16, m = 4, nProbe = 3, ef = 8,
          maxBroadcastBytes = threshold)
        .select("probe_id", "neighbor_id", "rank")
        .as[(Long, Long, Long)].collect().toSet
    assert(run(Some(0L)) === run(None))
  }
}
