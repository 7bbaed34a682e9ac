package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.VariantType
import graft.{SparkEntry, SparkTestBase}

/** VariantType storage round-trip: a parsed variant column written to
  * parquet and read back must be value-identical to the in-memory
  * variant — field probes, missing-field nulls, and the binary's typed
  * values all survive storage. (The in-memory parse path is oracled by
  * q_json_extract_variant; this pins the STORAGE leg it rides on.)
  */
class VariantStorageSpec extends SparkTestBase {

  test("variant column survives a parquet write/read with identical extractions") {
    val inMem = SparkEntry.queries("q_json_extract_variant")(spark, sf())
    val roundTrip = SparkEntry.queries("q_variant_roundtrip")(spark, sf())
    assert(roundTrip.schema === inMem.schema)
    // exact row-set identity, both directions
    assert(roundTrip.exceptAll(inMem).isEmpty &&
      inMem.exceptAll(roundTrip).isEmpty,
      "storage round-trip changed at least one extracted value")
  }

  test("the stored column is physically VariantType, not re-stringified JSON") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft-variant-spec"
    spark.range(3).select(col("id"),
        parse_json(format_string("""{"a":%d}""", col("id"))).as("v"))
      .write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)
    assert(back.schema("v").dataType === VariantType,
      s"expected a variant column, got ${back.schema("v").dataType}")
    val got = back.select(col("id"),
        variant_get(col("v"), "$.a", "long").as("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }
}
