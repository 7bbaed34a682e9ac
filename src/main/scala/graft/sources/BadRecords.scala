package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Corrupt-record handling for schema-on-read ingestion.
  *
  * The reference would simply throw on malformed JSON (its mappers call
  * Jackson directly, reference CRMLSJoiner.scala:120-121); at corpus
  * scale a pipeline must instead QUARANTINE bad rows and keep going —
  * one malformed record must not kill a 100 TB backfill.
  *
  * `parseWithQuarantine` splits a raw JSON-string frame into (parsed,
  * quarantined): rows whose envelope fails to parse land in the
  * quarantine frame with the raw text preserved for replay/debugging.
  */
object BadRecords {

  /** @return (good rows with parsed struct in `parsedCol`, quarantined
    *         raw rows)
    */
  def parseWithQuarantine(raw: DataFrame, valueCol: String,
                          schema: StructType,
                          parsedCol: String = "parsed"): (DataFrame, DataFrame) = {
    // PERMISSIVE from_json returns null (unparseable) or a struct whose
    // fields are all null (parseable JSON, wrong shape) — both are
    // corrupt for a declared envelope.
    val parsed = raw.withColumn(parsedCol,
      from_json(col(valueCol), schema, Map("mode" -> "PERMISSIVE")))
    val allNull: Column = schema.fieldNames
      .map(f => col(s"$parsedCol.$f").isNull)
      .reduce(_ && _)
    val corrupt = col(parsedCol).isNull || (col(valueCol).isNotNull && allNull)
    (parsed.filter(!corrupt), parsed.filter(corrupt).drop(parsedCol))
  }
}
