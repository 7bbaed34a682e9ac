package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.LatestState.Versioned

/** T6: the reference keeps join/dedup state in RocksDB (reference
  * CRMLSJoiner.scala:57-59). Spark's equivalent is the RocksDB state
  * store provider; this spec runs the latest-state operator against it
  * and expects identical semantics to the default HDFS-backed store.
  */
class RocksDBStateSpec extends SparkTestBase {
  import spark.implicits._

  test("latestByKey behaves identically on the RocksDB state store") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Versioned]
      val q = LatestState.latestByKey(input.toDS())
        .writeStream.format("memory").queryName("rocks_out")
        .outputMode("update").start()
      input.addData(Versioned("k1", 10, "v1.0"), Versioned("k2", 5, "v2.0"))
      q.processAllAvailable()
      input.addData(Versioned("k1", 30, "v1.2"), Versioned("k1", 20, "late"))
      q.processAllAvailable()
      q.stop()

      val emitted = spark.table("rocks_out").as[Versioned].collect().toSet
      assert(emitted === Set(
        Versioned("k1", 10, "v1.0"), Versioned("k2", 5, "v2.0"),
        Versioned("k1", 30, "v1.2")))
    } finally
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
