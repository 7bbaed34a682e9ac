package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // top-k UDAF buffers are k-bounded: keep ObjectHashAggregate
      // hash-based past the 128-key default (see TopKAggregator scaladoc)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: absorb one-time costs (codegen infra, parquet reader
    // init, broadcast machinery) so per-query numbers reflect the
    // query, not JVM warmup. Not reported.
    try {
      spark.read.parquet(s"$sfDir/nation.parquet")
        .write.format("noop").mode("overwrite").save()
      spark.range(1000).selectExpr("sum(id) AS s")
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // min of three runs: absorbs JIT/GC/host-contention spikes so the
      // reported number reflects the query, not the machine (round 1's
      // driver run recorded a 9.4 s q_intersect that reproduces at
      // 0.26 s — min-of-N plus the per-run breakdown below makes such
      // contention visible instead of polluting the headline).
      var failed = false
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        // noop sink forces every output column to be materialized;
        // count() would let Catalyst prune the computed columns away.
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query reports -1, never a bogus tiny elapsed time
      (name, if (failed) -1.0 else times.min, times)
    }
    // 3-decimal (ms) precision keeps the compact stdout line under ~2 KB
    // (~1.7 KB at the current 70-query catalog; re-check if it grows
    // past ~80) — round 2's driver capture kept only a ~2 KB tail, so
    // full-precision doubles risk clipping the head even without the
    // runs map
    val qs = results.map { case (k, v, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    // all runs per query, so a noisy host shows up as min<<max instead
    // of silently inflating the one reported number
    val runs = results.map { case (k, _, ts) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // The full record (with the 65x3 per-run arrays) is one very long
    // line; round 2's driver capture clipped it mid-line and the round
    // artifact parsed as null. Durable copy goes to a file; stdout gets
    // only the compact line any line-buffered capture can hold.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH.json")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"sf":"$sfDir"}"""
    try {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outPath),
        (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(compact)
    spark.stop()
  }
}
