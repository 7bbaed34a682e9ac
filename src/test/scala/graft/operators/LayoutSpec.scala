package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Z-order must (a) preserve content exactly and (b) actually cluster:
  * a selective filter on EITHER z-ordered column touches a small
  * fraction of files, while the linear-sort baseline only prunes its
  * leading column.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-layout-spec/$name"

  // a full 200x200 grid: a and b independent uniform dimensions
  private lazy val table = (0 until 40000).map { i =>
    (i.toLong, i.toLong / 200, i.toLong % 200)
  }.toDF("id", "a", "b")

  private val nFiles = 64

  test("zorderWrite preserves the row multiset") {
    Layout.zorderWrite(table, Seq("a", "b"), tmp("z-id"), nFiles, bits = 8)
    val got = spark.read.parquet(tmp("z-id"))
      .as[(Long, Long, Long)].collect().sorted
    val want = table.as[(Long, Long, Long)].collect().sorted
    assert(got.toSeq === want.toSeq)
  }

  test("z-order prunes BOTH columns; linear sort only prunes the leading one") {
    Layout.zorderWrite(table, Seq("a", "b"), tmp("z"), nFiles, bits = 8)
    Layout.linearWrite(table, Seq("a", "b"), tmp("lin"), nFiles)
    val z = spark.read.parquet(tmp("z"))
    val lin = spark.read.parquet(tmp("lin"))

    val aPred = col("a") === 42
    val bPred = col("b") === 42

    val zA = Layout.filesTouched(z, aPred)
    val zB = Layout.filesTouched(z, bPred)
    val linA = Layout.filesTouched(lin, aPred)
    val linB = Layout.filesTouched(lin, bPred)

    // leading column: both layouts prune hard
    assert(linA <= nFiles / 8, s"linear leading-col pruning broken: $linA")
    assert(zA <= nFiles / 4, s"z-order col-a pruning too weak: $zA/$nFiles")
    // trailing column: the 200 rows with b=42 are spread across ~all
    // linear files, but stay in a bounded set of z-order files
    assert(zB <= nFiles / 4, s"z-order col-b pruning too weak: $zB/$nFiles")
    assert(linB >= nFiles / 2,
      s"baseline sanity: linear layout should NOT cluster b, got $linB")
    assert(zB.toDouble <= linB.toDouble / 2,
      s"z-order must at least halve files touched on b: $zB vs $linB")
  }
}
