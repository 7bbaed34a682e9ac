package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.functions.TopKAggregator.Scored
import graft.operators.SimilaritySearch

class TopKAggregatorSpec extends SparkTestBase {
  import spark.implicits._

  test("groupedTopK preserves the id column's type and supports string ids") {
    import org.apache.spark.sql.types.{IntegerType, StringType}
    val intScored = Seq((1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7))
      .toDF("g", "id", "s")
    val gotInt = TopKAggregator.groupedTopK(intScored, "g", "id", "s", 2)
    assert(gotInt.schema("id").dataType === IntegerType)
    assert(gotInt.select("id").as[Int].collect().toSeq === Seq(10, 11))

    val strScored = Seq(("g1", "docB", 0.5), ("g1", "docA", 0.5), ("g1", "docC", 0.9))
      .toDF("g", "id", "s")
    val gotStr = TopKAggregator.groupedTopK(strScored, "g", "id", "s", 2)
    assert(gotStr.schema("id").dataType === StringType)
    // score desc, then id asc on the 0.5 tie
    assert(gotStr.select("id", "rank").as[(String, Long)].collect().toSet ===
      Set(("docC", 1L), ("docA", 2L)))

    // string ties must break by UTF-8 BYTE order (Spark's native string
    // ordering), not JVM UTF-16 compareTo: U+FFFD (EF BF BD) sorts
    // BEFORE U+1F600 (F0 9F 98 80) in UTF-8, while UTF-16 surrogates
    // would reverse them
    val tricky = Seq(("g", "😀", 1.0), ("g", "�", 1.0))
      .toDF("g", "id", "s")
    val utf8First = TopKAggregator.groupedTopK(tricky, "g", "id", "s", 1)
      .select("id").as[String].head()
    val sparkFirst = tricky.orderBy(col("id").asc).select("id").as[String].head()
    assert(utf8First === sparkFirst, "tiebreak must match Spark's string order")
  }

  test("typed top-k equals sort-take on random scores, incl. ties") {
    val rows = (1 to 500).map(i => Scored(i.toLong, (i * 37 % 100) / 10.0))
    val got = spark.createDataset(rows).repartition(7)
      .select(TopKAggregator.topK(5).name("top"))
      .head().toList
    val want = rows.sortBy(s => (-s.score, s.id)).take(5).toList
    assert(got === want)
  }

  test("grouped top-k matches an explicit window ranking (the plan it replaces)") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 8)
    // reference implementation: row_number window with the same
    // (score desc, id asc) tiebreak — correct but shuffles every pair
    val pw = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"))
    val cw = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    val windowed = cw.join(broadcast(pw), col("probe_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("pv"), col("cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("probe_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet

    // bruteTopK (aggregator-based) must produce the identical ranking
    val brute = SimilaritySearch.bruteTopK(probes, emb, "vec_id", "embedding", 3)
      .select("probe_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(brute === windowed)

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
