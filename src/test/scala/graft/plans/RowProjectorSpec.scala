package graft.plans

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.SparkTestBase
import graft.crmls.Crmls

/** [[org.apache.spark.sql.graftx.ColumnBridge.rowProjector]] compiles
  * the SAME analyzed expression tree the plan form folds — so on any
  * input, including the adversarial envelope shapes the stream can
  * carry, the compiled evaluator and the DataFrame evaluation must be
  * ROW-IDENTICAL. This is the load-bearing guarantee behind the fused
  * tier's driver-side envelope parsing.
  */
class RowProjectorSpec extends SparkTestBase {

  private val valueSchema = StructType(Seq(StructField("value", StringType)))

  private val adversarial: Seq[String] = Seq(
    // well-formed
    """{"data":"{\"ListingKeyNumeric\":\"LK1\",\"ListAgentKeyNumeric\":\"A1\"}","uc_pk":"L1","uc_update_ts":"u1","uc_version":"1","uc_created_ts":"100","uc_row_type":"r","uc_type":"t","uc_valid_day":"1","uc_valid_ts":"100"}""",
    // missing data field entirely
    """{"uc_pk":"L2","uc_created_ts":"50"}""",
    // nested data present but extraction keys absent
    """{"data":"{\"Other\":\"x\"}","uc_pk":"L3","uc_created_ts":"7","uc_valid_day":"2","uc_valid_ts":"7"}""",
    // negative and boundary longs (a NON-numeric ts raises the same
    // ANSI cast error through BOTH forms — same expression tree — so
    // it is not an equality case)
    """{"data":"{}","uc_pk":"L4","uc_created_ts":"-9223372036854775808","uc_valid_day":"0","uc_valid_ts":"9223372036854775807"}""",
    // malformed JSON envelope
    """{"uc_pk":"L5", this is not json""",
    // empty string and null value
    "",
    null,
    // unicode + escapes in payload
    """{"data":"{\"ListingKeyNumeric\":\"\\u00e9\\\"quoted\\\"\"}","uc_pk":"L6","uc_created_ts":"-3"}""")

  test("compiled projector == plan evaluation on adversarial envelopes, every entity") {
    import scala.jdk.CollectionConverters._
    val rows = adversarial.map(Row(_)).asJava
    Crmls.allEntities.foreach { spec =>
      val df = spark.createDataFrame(rows, valueSchema)
      val viaPlan = Crmls.project(df, spec).collect().toSeq
      val projector = org.apache.spark.sql.graftx.ColumnBridge.rowProjector(
        Crmls.project(
          spark.createDataFrame(
            java.util.Collections.emptyList[Row](), valueSchema), spec),
        valueSchema)
      val viaCompiled = adversarial.map(v => projector(Row(v)))
      assert(viaCompiled === viaPlan, s"drift for entity ${spec.name}")
    }
  }
}
