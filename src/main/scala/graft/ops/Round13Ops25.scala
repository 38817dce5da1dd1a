package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 25: haversine geo assignment, trading-day
  * adjustment, and range-partitioned global sort.
  */
object Round13Ops25 {

  /** Nearest-hub assignment by haversine distance: customers get
    * deterministic synthetic coordinates (integer hashes → degree
    * grid), distances to the five fixed hubs go through the standard
    * haversine formula, and the argmin ties to the smallest hub id.
    * The per-pair distance freezes at 4 dp BEFORE the argmin so both
    * engines compare identical values (libm trig parity at 4 dp is
    * the board's established tolerance). One broadcast of 5 hubs —
    * the geo-enrichment shape that never shuffles the fact table.
    */
  def fnHaversineNearestHub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = customer(spark, sfDir)
      .select($"c_custkey",
        (pmod($"c_custkey" * 2654435761L, lit(14000L)).cast(DoubleType) /
          lit(100.0) - lit(70.0)).as("lat"),
        (pmod($"c_custkey" * 40503L, lit(36000L)).cast(DoubleType) /
          lit(100.0) - lit(180.0)).as("lon"))
    val hubs = Seq((1, 40.7, -74.0), (2, 51.5, -0.1), (3, 35.7, 139.7),
        (4, -33.9, 151.2), (5, 19.4, -99.1))
      .toDF("hub", "hlat", "hlon")
    val rad = math.Pi / 180.0
    val dphi = ($"hlat" - $"lat") * lit(rad) / lit(2.0)
    val dlam = ($"hlon" - $"lon") * lit(rad) / lit(2.0)
    val a = sin(dphi) * sin(dphi) +
      cos($"lat" * lit(rad)) * cos($"hlat" * lit(rad)) * sin(dlam) * sin(dlam)
    val dist = round(lit(12742.0) * asin(sqrt(a)), 4)
    cust.crossJoin(broadcast(hubs))
      .withColumn("d", dist)
      .groupBy($"c_custkey")
      .agg(min_by(struct($"hub", $"d"), struct($"d", $"hub")).as("m"))
      .select($"m.hub".as("hub"), $"m.d".as("d"))
      .groupBy($"hub")
      // distances are 4-dp frozen: sum them as exact DECIMAL so the
      // mean is order-free
      .agg(count(lit(1)).as("n_customers"),
        sum($"d".cast(DecimalType(18, 4))).as("sd"),
        max($"d").as("max_km"))
      .select($"hub", $"n_customers",
        round($"sd".cast(DoubleType) / $"n_customers", 2).as("avg_km"),
        $"max_km")
      .orderBy($"hub")
  }

  /** Trading-day adjustment: each month's order count deflated by its
    * weekday composition (months with more high-volume weekdays get
    * marked down) — the calendar correction run before any
    * month-over-month comparison. Weekday weights come from the
    * global per-weekday daily means (exact integer sums over the
    * whole span); the month index is Σ weights over its actual days
    * divided by the weight of an average day. Doubles only in the
    * fixed-shape epilogue, 6 dp at the boundary.
    */
  def tsTradingDayAdjust(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(count(lit(1)).as("c"))
      .withColumn("dow", (weekday($"d") + 1).cast(IntegerType))
    val wk = daily.groupBy($"dow".as("dw"))
      .agg(sum($"c").as("sc"), count(lit(1)).as("nd"))
    val tot = wk.agg(sum($"sc").as("ts"), sum($"nd").as("td"))
    val monthly = daily.join(broadcast(wk), $"dow" === $"dw")
      .crossJoin(broadcast(tot))
      .groupBy(date_trunc("month", $"d").cast(DateType).as("month"))
      .agg(sum($"c").as("actual"), count(lit(1)).as("n_days"),
        // Σ over the month's days of (global weekday mean), frozen
        sum(round($"sc".cast(DoubleType) / $"nd", 6)
          .cast(DecimalType(28, 6))).as("expw"),
        max($"ts".cast(DoubleType) / $"td").as("avg_day"))
    monthly.select($"month", $"actual", $"n_days",
        round($"expw".cast(DoubleType) / ($"n_days" * $"avg_day"), 6)
          .as("td_index"),
        round($"actual".cast(DoubleType) /
          ($"expw".cast(DoubleType) / ($"n_days" * $"avg_day")), 4)
          .as("adjusted"))
      .orderBy($"month")
  }

  /** Global sort without a global bottleneck: repartitionByRange
    * spreads the key space across partitions by sampling, each
    * partition sorts locally — the only way a 100 TB ORDER BY
    * finishes. The registered result is an order-insensitive
    * aggregate (range boundaries are sampled, hence not oracle
    * material); Round13Spec25 pins the plan (range exchange + local
    * sort, global=false) and verifies partitions are non-overlapping
    * and internally sorted.
    */
  def scaleRangePartitionSort(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sorted(spark, sfDir)
      .agg(count(lit(1)).as("n"), min($"cents").as("min_cents"),
        max($"cents").as("max_cents"), sum($"cents").as("sum_cents"))
  }

  private[graft] def sorted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey",
        (money($"o_totalprice") * 100).cast(LongType).as("cents"))
      .repartitionByRange(8, $"cents", $"o_orderkey")
      .sortWithinPartitions($"cents", $"o_orderkey")
  }
}
