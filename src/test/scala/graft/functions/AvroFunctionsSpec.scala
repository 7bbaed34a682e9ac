package graft.functions

import java.io.ByteArrayOutputStream
import java.util.Base64
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Round-trip of the reference's 4-string-field Avro message schema
  * (FlinkJoiner.scala:51-63): encode with Avro core, decode with our
  * column functions, both raw-binary (S3) and base64 (S4).
  */
class AvroFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"Message","fields":[
       {"name":"trace_id","type":"string"},
       {"name":"data_version","type":"string"},
       {"name":"ts_created_at","type":"string"},
       {"name":"payload","type":"string"}]}""".replaceAll("\n\\s*", "")

  private val fields = Seq("trace_id", "data_version", "ts_created_at", "payload")

  private def encode(vals: Map[String, String]): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    vals.foreach { case (k, v) => rec.put(k, v) }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericData.Record](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  private val sample = Map(
    "trace_id" -> "t-1", "data_version" -> "7",
    "ts_created_at" -> "12345", "payload" -> """{"Listing ID":"L9"}""")

  test("fromAvroStrings decodes a binary record into named columns") {
    val df = Seq(Tuple1(encode(sample))).toDF("raw")
    val got = df.select(AvroFunctions.fromAvroStrings(col("raw"), schemaJson, fields).as("m"))
      .select("m.trace_id", "m.payload").as[(String, String)].head()
    assert(got === (("t-1", """{"Listing ID":"L9"}""")))
  }

  test("fromBase64Avro decodes the base64 variant") {
    val df = Seq(Base64.getEncoder.encodeToString(encode(sample))).toDF("raw64")
    val got = df.select(AvroFunctions.fromBase64Avro(col("raw64"), schemaJson, fields).as("m"))
      .select("m.data_version", "m.ts_created_at").as[(String, String)].head()
    assert(got === (("7", "12345")))
  }
}
