package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class VectorFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  test("int8 quantization round-trips within one quantization step") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(100.0f, -50.0f, 12.5f, 99.9f)),
      (3L, Array(0.001f, 0.0005f, -0.001f, 0.0f)))
      .toDF("id", "v")
    val out = vecs
      .withColumn("scale", VectorFunctions.int8Scale(col("v")))
      .withColumn("q", VectorFunctions.quantizeInt8(col("v"), col("scale")))
      .withColumn("deq", VectorFunctions.dequantizeInt8(col("q"), col("scale")))
      .select("id", "v", "scale", "q", "deq")
      .as[(Long, Array[Float], Double, Array[Long], Array[Double])]
      .collect()
    out.foreach { case (id, v, scale, q, deq) =>
      assert(q.forall(c => c >= -127 && c <= 127), s"vec $id codes out of range")
      v.zip(deq).foreach { case (orig, rec) =>
        assert(math.abs(orig.toDouble - rec) <= scale / 2 + 1e-12,
          s"vec $id: $orig reconstructed as $rec (scale $scale)")
      }
    }
  }

  test("zero vectors quantize to zero codes with zero scale") {
    val z = Seq((1L, Array(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val (scale, q) = z
      .withColumn("scale", VectorFunctions.int8Scale(col("v")))
      .withColumn("q", VectorFunctions.quantizeInt8(col("v"), col("scale")))
      .select("scale", "q").as[(Double, Array[Long])].collect().head
    assert(scale === 0.0)
    assert(q.toSeq === Seq(0L, 0L, 0L))
  }

  test("quantized cosine approximates full-precision cosine (top-1 preserved)") {
    val emb = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
      .limit(100)
      .withColumn("scale", VectorFunctions.int8Scale(col("embedding")))
      .withColumn("q", VectorFunctions.quantizeInt8(col("embedding"), col("scale")))
      .withColumn("deq", VectorFunctions.dequantizeInt8(col("q"), col("scale")))
      .select("vec_id", "embedding", "deq").cache()
    val exactCos = emb.select(col("vec_id"), col("embedding")).as("a")
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("embedding").as("b_v")))
      .filter(col("vec_id") =!= col("b_id"))
      .select(col("vec_id"), col("b_id"),
        VectorFunctions.cosine(col("embedding"), col("b_v")).as("c"))
    val top1Exact = exactCos.groupBy("vec_id")
      .agg(max(struct(col("c"), col("b_id"))).as("m"))
      .select(col("vec_id"), col("m.b_id")).as[(Long, Long)].collect().toMap
    val quantCos = emb.select(col("vec_id"), col("deq")).as("a")
      .crossJoin(emb.select(col("vec_id").as("b_id"), col("deq").as("b_v")))
      .filter(col("vec_id") =!= col("b_id"))
      .select(col("vec_id"), col("b_id"),
        VectorFunctions.cosine(col("deq"), col("b_v")).as("c"))
    val top1Quant = quantCos.groupBy("vec_id")
      .agg(max(struct(col("c"), col("b_id"))).as("m"))
      .select(col("vec_id"), col("m.b_id")).as[(Long, Long)].collect().toMap
    val agree = top1Exact.count { case (k, v) => top1Quant(k) == v }
    assert(agree >= (top1Exact.size * 0.9).toInt,
      s"int8 top-1 agreement only $agree/${top1Exact.size}")
    emb.unpersist()
  }

  test("rademacherSign matches Spark's own md5 expression (can never drift)") {
    // The oracle SQL bakes driver-computed signs as literals; this pin
    // proves the driver md5 == the md5 Spark (and so DuckDB, which the
    // r1 fixture work proved byte-equal to Spark's) would compute.
    val cells = for (j <- 0 until 8; d <- 0 until 64) yield (j, d)
    val viaSpark = cells.toDF("j", "d")
      .select(col("j"), col("d"),
        when(expr("CAST(conv(substring(md5(concat(j, '_', d)), 1, 1), 16, 10) AS INT) % 2 = 0"),
          lit(1.0)).otherwise(lit(-1.0)).as("s"))
      .as[(Int, Int, Double)].collect()
      .map { case (j, d, s) => (j, d) -> s }.toMap
    cells.foreach { case (j, d) =>
      assert(VectorFunctions.rademacherSign(j, d) === viaSpark((j, d)),
        s"sign drift at ($j, $d)")
    }
  }

  test("randomProjection: output shape and hand-computed values") {
    val v = Array.tabulate(64)(i => (i + 1).toFloat / 10f)
    val out = Seq((1L, v)).toDF("id", "v")
      .select(VectorFunctions.randomProjection(col("v"), outDim = 8, dim = 64))
      .as[Array[Double]].collect().head
    assert(out.length === 8)
    val invSqrtK = 1.0 / math.sqrt(8.0)
    (0 until 8).foreach { j =>
      var acc = 0.0
      (0 until 64).foreach { d =>
        acc += VectorFunctions.rademacherSign(j, d) * v(d).toDouble
      }
      assert(out(j) === acc * invSqrtK, s"dim $j mismatch")
    }
  }

  test("randomProjection preserves relative distances in aggregate (JL sanity)") {
    // Rademacher JL: E[||P(a) - P(b)||^2] = ||a - b||^2. Over the real
    // embeddings corpus the mean ratio should be near 1.
    val emb = graft.sources.Tables.load(spark, sf("sf0.001"), "embeddings")
      .limit(40)
      .withColumn("p", VectorFunctions.randomProjection(col("embedding"), 8, 64))
      .select("vec_id", "embedding", "p")
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b_v"),
      col("p").as("b_p"))
    val ratios = emb.crossJoin(b).filter(col("vec_id") < col("b_id"))
      // zero-distance (duplicate) pairs would put Inf/NaN in the mean
      .filter(VectorFunctions.l2Distance(col("embedding"), col("b_v")) > 0)
      .select(
        (pow(VectorFunctions.l2Distance(col("p"), col("b_p")), 2) /
          pow(VectorFunctions.l2Distance(col("embedding"), col("b_v")), 2)).as("r"))
      .agg(avg(col("r"))).as[Double].collect().head
    assert(ratios > 0.7 && ratios < 1.3,
      s"JL mean distance ratio $ratios outside [0.7, 1.3]")
  }
}
