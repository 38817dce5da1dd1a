package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregation operators (SURVEY §2d). All money sums use exact
  * DECIMAL accumulation (order-independent) per SURVEY §7d; doubles
  * appear only as final casts or single bounded-magnitude ROUNDs.
  */
object Aggregates {

  private def one = lit(1).cast(D4_2)

  /** Exact distinct: Catalyst rewrites to Expand + two-phase agg, so
    * the distinct set is partitioned across executors, never collected.
    */
  def aggCountDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n_users"), count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** HLL sketch — constant memory per group at any scale (the 100 TB
    * path for distinct counts). No oracle: HLL implementations differ
    * across engines; bounds vs exact asserted in AggregatesSpec.
    */
  def aggApproxCountDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .groupBy($"event_type")
      .agg(approx_count_distinct($"user_id").as("approx_users"),
        countDistinct($"user_id").as("exact_users"))
      .orderBy($"event_type")
  }

  /** Mergeable quantile sketch (Greenwald–Khanna variant backing
    * percentile_approx) — with HLL, the second member of the
    * constant-memory sketch family for 100 TB profiling. No oracle
    * (sketch internals are engine-specific); error bound vs the exact
    * percentile asserted in AggregatesSpec.
    */
  def aggApproxQuantiles(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .groupBy($"o_orderstatus")
      .agg(
        percentile_approx($"o_totalprice", array(lit(0.5), lit(0.9)), lit(10000))
          .as("q"),
        count(lit(1)).as("n"))
      // scalar columns, not an array: the driver harness hashes float64
      // scalars fine but cannot sort/hash ndarray cells
      .select($"o_orderstatus",
        element_at($"q", 1).as("approx_p50"),
        element_at($"q", 2).as("approx_p90"),
        $"n")
      .orderBy($"o_orderstatus")
  }

  private def rollupCubeBase(spark: SparkSession, sfDir: String, cube: Boolean): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, sfDir)
    val grouped =
      if (cube) li.cube($"l_returnflag", $"l_linestatus")
      else li.rollup($"l_returnflag", $"l_linestatus")
    grouped
      .agg(grouping_id().as("gid"),
        sum(money($"l_extendedprice") * (one - rate($"l_discount"))).as("_rev"),
        count(lit(1)).as("n"))
      .select($"gid", $"l_returnflag", $"l_linestatus",
        $"_rev".cast(DoubleType).as("revenue"), $"n")
      .orderBy($"gid", $"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  /** ROLLUP subtotals via Expand — one pass over the data, each input
    * row expanded to its grouping-set variants before the partial agg.
    */
  def aggRollup(spark: SparkSession, sfDir: String): DataFrame =
    rollupCubeBase(spark, sfDir, cube = false)

  def aggCube(spark: SparkSession, sfDir: String): DataFrame =
    rollupCubeBase(spark, sfDir, cube = true)

  /** Explicit GROUPING SETS with grouping_id disambiguating the NULL
    * markers from real NULLs (SQL surface — E2 lifecycle path).
    */
  def aggGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("orders_v")
    spark.sql("""
      SELECT grouping_id() AS gid, o_orderstatus, o_orderpriority,
        count(*) AS n,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders_v
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """)
  }

  /** Moment-based statistics (stddev/var/corr/covar semantics),
    * computed from EXACT decimal moment sums rather than the built-in
    * Welford-merge aggregates: the built-ins' low bits depend on the
    * partition merge order, so their 4dp rounding could flip if the
    * harness changes parallelism. Decimal sums are order-independent;
    * the closed-form double arithmetic is then bit-identical on both
    * engines under any partitioning. (StatsSpec asserts agreement with
    * the built-ins to 1e-6.)
    */
  def aggStats(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val q  = $"l_quantity".cast(DecimalType(12, 2))
    val p  = $"l_extendedprice".cast(DecimalType(12, 2))
    val d  = $"l_discount".cast(DecimalType(4, 2))
    val dbl = (c: Column) => c.cast(DoubleType)
    lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(q).as("sq"), sum(q * q).as("sqq"),
        sum(p).as("sp"), sum(p * p).as("spp"),
        sum(d).as("sd"),
        sum(q * p).as("sqp"), sum(q * d).as("sqd"))
      .select($"l_returnflag",
        round(sqrt((dbl($"sqq") * $"n" - dbl($"sq") * dbl($"sq")) /
          ($"n" * ($"n" - 1))), 4).as("sd_qty"),
        round((dbl($"sqq") * $"n" - dbl($"sq") * dbl($"sq")) /
          ($"n" * ($"n" - 1)), 4).as("var_qty"),
        round((dbl($"sqp") * $"n" - dbl($"sq") * dbl($"sp")) /
          (sqrt(dbl($"sqq") * $"n" - dbl($"sq") * dbl($"sq")) *
           sqrt(dbl($"spp") * $"n" - dbl($"sp") * dbl($"sp"))), 4)
          .as("corr_qty_price"),
        round((dbl($"sqd") * $"n" - dbl($"sq") * dbl($"sd")) /
          ($"n" * ($"n" - 1)), 4).as("covar_qty_disc"),
        $"n")
      .orderBy($"l_returnflag")
  }

  /** percentile_cont WITHIN GROUP (SQL surface; Spark ≥3.4). Linear
    * interpolation lands on ≤4-decimal exact values for 2dp money, so
    * ROUND 4dp is bit-stable across engines.
    */
  def aggPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("orders_v")
    spark.sql("""
      SELECT o_orderstatus,
        ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS median_price,
        ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90_price,
        count(*) AS n
      FROM orders_v
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)
  }

  /** Deterministic argmax/argmin: the ordering struct carries the key
    * as tiebreak, so ties cannot flap between engines.
    */
  def aggMinmaxBy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(
        max_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("max_order"),
        min_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("min_order"),
        max($"o_totalprice").as("max_price"),
        min($"o_totalprice").as("min_price"))
      .orderBy($"o_custkey")
  }

  /** Per-group sorted list output, serialized to one exact string: each
    * element goes through DECIMAL(12,2) (money protocol — bit-identical
    * in both engines) so the joined string hashes stably in the driver's
    * pandas compare (ndarray cells are unhashable there).
    */
  def aggCollectSorted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(array_join(
        transform(sort_array(collect_list($"o_totalprice")),
          x => x.cast("decimal(12,2)").cast("string")), ",").as("prices"))
      .orderBy($"o_custkey")
  }
}
