package graft

/** Print the formatted physical plan of one or more catalog queries:
  * `sbt "runMain graft.Explain <sfDir> <query> [query...]"`.
  * Plan hygiene checklist per SURVEY §7: filters/columns pushed to the
  * parquet scan, dims broadcast, no redundant exchanges.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(cores = 4, appName = "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
