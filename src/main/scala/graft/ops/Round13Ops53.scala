package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 53: ordinal formatting and per-type
  * coefficient of variation.
  */
object Round13Ops53 {

  /** English ordinal suffixes in pure CASE arithmetic (the teens
    * override the last-digit rule) — report-formatting that must be
    * identical across engines, so no locale-dependent formatter is
    * allowed anywhere near it.
    */
  def fnOrdinalSuffix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .filter($"o_orderkey" <= 40 && $"o_orderkey" >= 1)
      .select($"o_orderkey".as("k"))
      .withColumn("suffix", expr("""CASE
        WHEN k % 100 IN (11, 12, 13) THEN 'th'
        WHEN k % 10 = 1 THEN 'st'
        WHEN k % 10 = 2 THEN 'nd'
        WHEN k % 10 = 3 THEN 'rd'
        ELSE 'th' END"""))
      .select($"k", concat($"k".cast(StringType), $"suffix")
        .as("ordinal"))
      .orderBy($"k")
  }

  /** Coefficient of variation of event value per type: the
    * scale-free dispersion every metric catalog reports next to the
    * mean. Σx and Σx² stay exact (cents / DECIMAL(38,0) squares);
    * cv = √(n·Σx² − (Σx)²) / Σx is one mirrored double formula.
    */
  def analyticCvByType(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select($"event_type",
        (money($"value") * 100).cast(LongType).as("v"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"),
        sum(($"v".cast(DecimalType(38, 0)) * $"v")
          .cast(DecimalType(38, 0))).as("q"))
      .select($"event_type", $"n",
        expr("s div n").as("mean_cents"),
        round(sqrt(($"n".cast(DoubleType) * $"q".cast(DoubleType) -
          $"s".cast(DoubleType) * $"s".cast(DoubleType)) /
          ($"n".cast(DoubleType) * $"n".cast(DoubleType))) /
          ($"s".cast(DoubleType) / $"n".cast(DoubleType)), 6).as("cv"))
      .orderBy($"event_type")
  }
}
