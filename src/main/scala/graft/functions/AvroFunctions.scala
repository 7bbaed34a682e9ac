package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.DecoderFactory
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Avro decode for string-field records — the reference's S3/S4 surface
  * (MyAvroDeserializationSchema.scala:13-45 decodes a 4-string-field
  * record: trace_id, data_version, ts_created_at, payload; the S4
  * variant base64-decodes first, BinaryAvroDeserializationSchema
  * .scala:33-42).
  *
  * Built on the Avro core library (bundled with Spark). The decoder is
  * a scalar UDF: this is a source-boundary transform that runs once per
  * ingested record, not a hot-loop expression, and keeping it a UDF
  * avoids hand-rolling a Catalyst expression around Avro's mutable
  * decoder state.
  */
object AvroFunctions {

  /** Decode a binary Avro record column into `fieldCount` string fields
    * (array output; wrap with element_at/getItem or the helper below).
    * The schema JSON travels as a literal so executors compile their
    * own decoder (Schema is not serializable-stable across JVMs).
    */
  /** Serializable decoder: ships the schema JSON, parses it once per
    * executor (transient lazy), not once per row.
    */
  private final class Decoder(schemaJson: String, fields: Seq[String])
      extends (Array[Byte] => Array[String]) with Serializable {
    @transient private lazy val reader = {
      val schema = new Schema.Parser().parse(schemaJson)
      new GenericDatumReader[GenericRecord](schema)
    }
    def apply(bytes: Array[Byte]): Array[String] =
      if (bytes == null) null
      else {
        val decoder = DecoderFactory.get().binaryDecoder(bytes, null)
        val rec = reader.read(null, decoder)
        fields.map(fl => Option(rec.get(fl)).map(_.toString).orNull).toArray
      }
  }

  def avroStringFields(data: Column, schemaJson: String,
                       fields: Seq[String]): Column =
    udf(new Decoder(schemaJson, fields)).apply(data)

  /** S3: binary Avro -> struct of named string columns. */
  def fromAvroStrings(data: Column, schemaJson: String,
                      fields: Seq[String]): Column = {
    val arr = avroStringFields(data, schemaJson, fields)
    struct(fields.zipWithIndex.map { case (name, i) =>
      arr.getItem(i).as(name)
    }: _*)
  }

  /** S4: base64-encoded Avro -> struct (reference decodes base64 first,
    * BinaryAvroDeserializationSchema.scala:35).
    */
  def fromBase64Avro(data: Column, schemaJson: String,
                     fields: Seq[String]): Column =
    fromAvroStrings(unbase64(data), schemaJson, fields)
}
