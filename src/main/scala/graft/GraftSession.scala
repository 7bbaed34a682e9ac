package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's recommended configuration.
  *
  * The reference (a Flink 1.8 POC) carries its tuning in `flink-conf.yaml`
  * (RocksDB state backend, parallelism, heaps — see
  * /root/reference/flink-conf.yaml:42-65). Our equivalent is Spark SQL
  * conf: AQE on (runtime re-planning, skew-join handling), shuffle
  * partitions sized to the core count rather than the 200 default, and a
  * UTC session timezone so results are oracle-comparable.
  */
object GraftSession {

  /** Local session sized for the test harness. On a real cluster the same
    * configs apply, with `spark.sql.shuffle.partitions` sized to
    * 2-3x total executor cores.
    */
  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // NOTE (r13 negative result): lowering
      // spark.sql.adaptive.coalescePartitions.minPartitionSize to 64k
      // to keep small exchanges feeding AMPLIFYING stages (pair joins,
      // explodes) parallel measured 2-3x WORSE across the board
      // (canary q_multijoin 0.99 -> 2.90 s): the floor multiplies task
      // count across EVERY small stage and per-task launch overhead
      // swamps the parallelism gain. Where amplification genuinely
      // needs parallelism, pin it per-operator with an explicit
      // repartition (GraphMetrics.adamicAdar), not a global floor.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the engine's SQL functions + planner strategy ride along
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
