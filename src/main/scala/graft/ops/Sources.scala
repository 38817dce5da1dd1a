package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Additional source/sink formats (SURVEY §2a sink note, widened):
  * CSV and JSON-lines round trips through real files — the write path
  * and the schema-explicit read path both exercised. Doubles survive
  * text serialization exactly (Spark emits shortest-round-trip
  * representations), so the oracle compares against the original rows.
  */
object Sources {

  private val schema = StructType(Seq(
    StructField("event_id", LongType), StructField("event_type", StringType),
    StructField("user_id", LongType), StructField("value", DoubleType)))

  private def slice(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir).select($"event_id", $"event_type", $"user_id", $"value")
  }

  // per-session-unique path component: concurrent sessions on the same
  // sfDir must not overwrite each other's files mid-read
  private def tag(spark: SparkSession, sfDir: String): String =
    sfDir.hashCode.toHexString + "_" + spark.sparkContext.applicationId

  def sourceCsvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = "/tmp/graft_roundtrip_csv_" + tag(spark, sfDir)
    slice(spark, sfDir).write.mode("overwrite")
      .option("header", "true").csv(out)
    spark.read.option("header", "true").schema(schema).csv(out)
      .orderBy($"event_id")
  }

  def sourceJsonRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = "/tmp/graft_roundtrip_json_" + tag(spark, sfDir)
    slice(spark, sfDir).write.mode("overwrite").json(out)
    spark.read.schema(schema).json(out)
      .orderBy($"event_id")
  }

  /** ORC round trip — the columnar alternative to parquet; binary
    * encoding, so doubles are trivially exact.
    */
  def sourceOrcRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val out = "/tmp/graft_roundtrip_orc_" + tag(spark, sfDir)
    slice(spark, sfDir).write.mode("overwrite").orc(out)
    spark.read.schema(schema).orc(out)
      .orderBy($"event_id")
  }
}
