package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch parquet table loader for the driver test data
  * (`/root/testdata/sf0.01/<name>.parquet` and siblings).
  *
  * Reads go through `spark.read.parquet`, so Catalyst pushes filters and
  * prunes columns at the scan (visible as `PushedFilters`/`ReadSchema` in
  * `.explain("formatted")`). At 100 TB the same call reads a partitioned
  * parquet/lakehouse table; nothing here is local-specific.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Columns stored as parquet TIMESTAMP(NANOS), which Spark cannot
    * represent natively (TimestampType is microseconds). With
    * `spark.sql.legacy.parquet.nanosAsLong=true` they surface as LongType
    * nanos; we convert to TimestampType by integer-dividing to micros —
    * the same truncation DuckDB applies when it narrows ns to its us
    * TIMESTAMP, so oracle comparisons see identical values. (Plain
    * double division would silently lose precision: epoch-nanos ~1.7e18
    * exceeds the 2^53 exact-integer range of a double.)
    */
  private val nanosTimestampCols: Map[String, Seq[String]] =
    Map("events" -> Seq("ts"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    nanosTimestampCols.getOrElse(name, Nil).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == org.apache.spark.sql.types.LongType)
        d.withColumn(c, org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(s"$c DIV 1000")))
      else d
    }
  }

  /** Register every table as a temp view so `spark.sql` mirrors the
    * reference's `tEnv.registerTable` usage
    * (reference CRMLSJoiner.scala:179).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
