package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TopKAggregator.Scored
import graft.operators.SimilaritySearch

class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("typed top-k equals sort-take on random scores, incl. ties") {
    val rows = (1 to 500).map(i => Scored(i.toLong, (i * 37 % 100) / 10.0))
    val got = spark.createDataset(rows).repartition(7)
      .select(TopKAggregator.topK(5).name("top"))
      .head().toList
    val want = rows.sortBy(s => (-s.score, s.id)).take(5).toList
    assert(got === want)
  }

  test("grouped top-k matches the window-ranked similarity search") {
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 8)
    val windowed = SimilaritySearch.bruteTopK(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet

    // same candidates through the typed aggregator
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
      .withColumn("pn", VectorFunctions.norm(col("pv")))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
      .withColumn("cn", VectorFunctions.norm(col("cv")))
    val scored = c.join(broadcast(p), col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id").as("id"),
        VectorFunctions.cosineWithNorms(col("pv"), col("cv"),
          col("pn"), col("cn")).as("score"))
      .as[(Long, Long, Double)]
    val agged = scored.groupByKey(_._1)
      .mapValues { case (_, id, score) => Scored(id, score) }
      .agg(TopKAggregator.topK(3).name("top"))
      .flatMap { case (probe, top) =>
        top.zipWithIndex.map { case (s, i) => (probe, s.id, (i + 1).toLong) }
      }.collect().toSet
    assert(agged === windowed)
  }
}
