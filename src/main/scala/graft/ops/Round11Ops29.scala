package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 29: forward frames, acceleration census,
  * join fan-out audit, expected calibration error, semi-join
  * reduction, log-scale histogram.
  */
object Round11Ops29 {

  private def u24(key: Column): Column =
    expr(s"CAST(conv(substring(md5(CAST(${key.toString} AS STRING)), 1, 6), 16, 10) AS BIGINT)")

  /** Forward-looking frames: next-7-day demand visible from each day
    * (1 FOLLOWING .. 7 FOLLOWING) — the replenishment-planning
    * window, type-partitioned. Exact integer sums; full forward
    * frames only, so every emitted row means the same thing.
    */
  def winForwardFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(1, 7)
    daily
      .withColumn("next7", sum($"c").over(w))
      .withColumn("nf", count(lit(1)).over(w))
      .filter($"nf" === 7)
      .select($"event_type", $"d", $"c", $"next7")
      .orderBy($"event_type", $"d")
  }

  /** Velocity / acceleration census of the daily series: first and
    * second differences (exact integers from chained lags) plus the
    * inflection count — days where acceleration changes sign — per
    * event type. The metric-physics summary an anomaly triage reads
    * before any model.
    */
  def tsAcceleration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
    val diffed = daily
      .withColumn("v", $"c" - lag($"c", 1).over(w))
      .withColumn("a", $"v" - lag($"v", 1).over(w))
      .withColumn("prev_a", lag($"a", 1).over(w))
      .filter($"a".isNotNull)
    diffed.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        max(abs($"v")).as("max_abs_velocity"),
        max(abs($"a")).as("max_abs_accel"),
        count(when($"prev_a".isNotNull &&
          (($"a" > 0 && $"prev_a" < 0) || ($"a" < 0 && $"prev_a" > 0)), 1))
          .as("n_inflections"))
      .orderBy($"event_type")
  }

  /** Join fan-out audit — the join-debugging census: how many orders
    * does each customer key actually match (0, 1, 2–5, 6+)? An
    * unexpected fan-out band is how accidental many-to-many joins
    * and row explosions get caught BEFORE the wide join runs. One
    * outer aggregate join, integer bands.
    */
  def joinFanoutAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perCust = orders(spark, sfDir)
      .groupBy($"o_custkey").agg(count(lit(1)).as("m"))
    customer(spark, sfDir)
      .join(perCust, $"c_custkey" === $"o_custkey", "left_outer")
      .select(coalesce($"m", lit(0L)).as("m"))
      .select(
        when($"m" === 0, "0_none").when($"m" === 1, "1_exact")
          .when($"m" <= 5, "2_to_5").otherwise("6_plus").as("fanout_band"),
        $"m")
      .groupBy($"fanout_band")
      .agg(count(lit(1)).as("n_keys"), sum($"m").as("n_joined_rows"))
      .orderBy($"fanout_band")
  }

  /** Expected calibration error over the md5-score bins (the
    * calibration_bins protocol): per-bin |observed − predicted|
    * weighted by bin mass, frozen at 9 dp as DECIMAL, summed
    * exactly, ONE final division by N — the single calibration
    * number model governance dashboards track, derived from the same
    * deterministic pseudo-scores.
    */
  def mlEceScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bins = events(spark, sfDir)
      .withColumn("k", u24($"event_id"))
      .withColumn("bin", expr("CAST((10 * k + 5) DIV 16777216 AS INT)"))
      .withColumn("y", (money($"value") >= lit(50)).cast(IntegerType))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"), sum($"y").cast(LongType).as("n_pos"),
        sum($"k").as("sk"))
      .select($"bin", $"n",
        (($"sk" * 2 + $"n").cast(DoubleType) /
          ($"n".cast(DoubleType) * 33554432.0)).as("mean_p"),
        ($"n_pos".cast(DoubleType) / $"n".cast(DoubleType)).as("obs"))
    val gaps = bins.select($"bin", $"n",
      round(abs($"obs" - $"mean_p") * $"n".cast(DoubleType), 9)
        .cast(DecimalType(28, 9)).as("gap"))
    val tot = gaps.agg(sum($"gap").as("sg"), sum($"n").as("tn"))
      .select(round($"sg".cast(DoubleType) / $"tn".cast(DoubleType), 6)
        .as("ece"))
    gaps.crossJoin(broadcast(tot))
      .select($"bin", $"n", round($"gap".cast(DoubleType), 6).as("weighted_gap"),
        $"ece")
      .orderBy($"bin")
  }

  /** Semi-join reduction — shrink the expensive side BEFORE the wide
    * join: lineitem first passes a LEFT SEMI against qualifying
    * orders (urgent 1997), then only survivors pay the full-width
    * inner join for the order attributes. At 100 TB the semi pass
    * ships join keys only; the wide payload moves for the ~selective
    * fraction that survives. Result is identical to the direct
    * filtered join (the oracle).
    */
  def scaleSemijoinReduction(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val qual = orders(spark, sfDir)
      .filter($"o_orderpriority" === "1-URGENT" && year($"o_orderdate") === 1997)
    val reduced = lineitem(spark, sfDir)
      .join(qual.select($"o_orderkey"), $"l_orderkey" === $"o_orderkey",
        "left_semi")
    reduced
      .join(qual, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority", month($"o_orderdate").as("mon"))
      .agg(count(lit(1)).as("n_items"),
        sum(money($"l_extendedprice")).cast(DoubleType).as("revenue"))
      .orderBy($"mon")
  }

  /** Log₂-scale histogram of order value — the right shape for
    * long-tailed money distributions (equal-width buckets starve the
    * tail). Bucket = floor(log2(cents)) computed as integer
    * bit-length via a portable string-free formula on exact cents;
    * per-bucket exact sums and bounds.
    */
  def aggLogHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select((money($"o_totalprice") * 100).cast(LongType).as("cents"))
      .filter($"cents" > 0)
      // floor(log2(x)) as 63 - leading_zeros via repeated comparison:
      // use the SQL bit trick: length of binary representation - 1
      .withColumn("b", (length(bin($"cents")) - 1).cast(IntegerType))
      .groupBy($"b")
      .agg(count(lit(1)).as("n"), min($"cents").as("min_cents"),
        max($"cents").as("max_cents"), sum($"cents").as("sum_cents"))
      .orderBy($"b")
  }
}
