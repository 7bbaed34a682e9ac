package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Per-stage wall/task-time profile of one catalog query:
  * `sbt "runMain graft.StageProf <sfDir> <query> [passes]"`.
  * Guide §1.1/§7.1 stand-in for the Spark UI stage page (the bench
  * runs with the UI off): for every completed stage prints wall,
  * summed task time, task count, max task time (straggler/skew probe)
  * and the stage name line. Measurement tooling only — never on the
  * bench path.
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val passes = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cores = cpus.toInt,
      appName = s"graft-stageprof-$name")
    spark.sparkContext.setLogLevel("WARN")
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val info = e.stageInfo
        val wall = (info.completionTime.getOrElse(0L) -
          info.submissionTime.getOrElse(0L)) / 1e3
        val m = info.taskMetrics
        println(f"[stage ${info.stageId}%3d] wall=$wall%7.3fs " +
          f"tasks=${info.numTasks}%4d taskSum=${m.executorRunTime / 1e3}%8.3fs " +
          f"shufRead=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
          f"shufWrite=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB " +
          s"| ${info.name.takeWhile(_ != '\n').take(90)}")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (p <- 1 to passes) {
      println(s"===== pass $p =====")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.3fs")
      Thread.sleep(300) // let stage-completed events drain
    }
    spark.stop()
  }
}
