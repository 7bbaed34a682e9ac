package graft.operators

import java.io.File

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** sizedWrite must (a) preserve content exactly, (b) produce files
  * whose realized sizes land in a band around the requested target
  * (the whole point — neither a spray of tiny files nor one giant
  * one), and (c) keep the sort-key layout that gives each file a
  * compact min/max zone map.
  */
class SizedWriteSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-sized-spec/$name"

  private def dataFiles(path: String): Seq[File] =
    new File(path).listFiles().toSeq
      .filter(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet"))

  // incompressible payload so parquet size tracks row count (a
  // constant column would compress to nothing and make size
  // assertions meaningless)
  private lazy val table = (0 until 60000).map { i =>
    (i.toLong, s"payload-${i * 2654435761L}%-${i.toHexString}")
  }.toDF("id", "payload")

  test("content identity and deterministic file count") {
    // write the source as parquet first so the size statistic is the
    // real on-disk footprint, as in the catalog query
    table.write.mode("overwrite").parquet(tmp("src"))
    val src = spark.read.parquet(tmp("src"))
    val n = Layout.sizedWrite(src, Seq("id"), tmp("out"),
      targetFileBytes = 128L << 10)
    val got = spark.read.parquet(tmp("out"))
      .as[(Long, String)].collect().sorted
    val want = table.as[(Long, String)].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(dataFiles(tmp("out")).size === n)
    // re-running picks the same count (estimate is a pure function of
    // the source stats, not sampling)
    assert(Layout.sizedWrite(src, Seq("id"), tmp("out2"),
      targetFileBytes = 128L << 10) === n)
  }

  test("realized file sizes land in a band around the target") {
    table.write.mode("overwrite").parquet(tmp("src-band"))
    val src = spark.read.parquet(tmp("src-band"))
    val target = 128L << 10
    val n = Layout.sizedWrite(src, Seq("id"), tmp("band"), target)
    val sizes = dataFiles(tmp("band")).map(_.length())
    assert(n > 1, s"test table must span multiple files, got $n")
    // every file within [target/4, 4*target]: parquet encoding and the
    // range partitioner's balance both wobble, but order-of-magnitude
    // correctness is the contract (no tiny-file spray, no giant file)
    sizes.foreach { s =>
      assert(s >= target / 4 && s <= target * 4,
        s"file size $s outside [${target / 4}, ${target * 4}]")
    }
  }

  test("range layout keeps zone maps tight: point filter touches few files") {
    table.write.mode("overwrite").parquet(tmp("src-zone"))
    val src = spark.read.parquet(tmp("src-zone"))
    val n = Layout.sizedWrite(src, Seq("id"), tmp("zone"), 64L << 10)
    assert(n >= 4, s"need several files for a pruning claim, got $n")
    val out = spark.read.parquet(tmp("zone"))
    assert(Layout.filesTouched(out, col("id") === 31337L) === 1,
      "a point filter on the sort key must touch exactly one file")
  }
}
