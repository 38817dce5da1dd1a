package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 widening, part 3: the relational and pipeline primitives
  * still missing from the surface — NOT IN null-aware anti join,
  * bloom-filter semi-join reduction, incremental aggregate (MV delta)
  * maintenance, time-series gap-fill with forward fill, and one-pass
  * column profiling.
  */
object Round7Ops2 {

  /** NOT IN with a NULLABLE probe column — the three-valued-logic trap
    * a plain anti join gets wrong: a NULL probe compares UNKNOWN to
    * every list element, so the row must be EXCLUDED (here every 97th
    * order's custkey is nulled deterministically). Written as SQL
    * NOT IN so Catalyst plans its null-aware anti join: with the build
    * side broadcast, a single-column NAAJ stays a BroadcastHashJoin
    * (PlanSpec-pinned) instead of degenerating into the O(n·m)
    * BroadcastNestedLoopJoin that null-aware semantics otherwise
    * force — the difference between a hash probe and a scan of the
    * whole list per row at 100 TB.
    */
  def joinNullAwareAnti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .withColumn("probe_custkey",
        when(pmod($"o_orderkey", lit(97)) === 0, lit(null).cast(LongType))
          .otherwise($"o_custkey"))
      .createOrReplaceTempView("g7_orders_probe")
    customer(spark, sfDir).createOrReplaceTempView("g7_customer")
    spark.sql("""
      SELECT o_orderstatus, count(*) AS n_orders
      FROM g7_orders_probe
      WHERE probe_custkey NOT IN (SELECT c_custkey FROM g7_customer
                                  WHERE c_mktsegment = 'BUILDING')
      GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)
  }

  /** Bloom-filter semi-join reduction: the qualifying suppliers'
    * keys are sketched into a driver-built bloom filter (exact size
    * bound: n keys at 1% fpp is ~1.2 bytes/key — a few hundred MB for
    * 10^8 keys, vs shipping the keys themselves), the fact side is
    * pruned by `mightContain` BEFORE its shuffle, and the exact join
    * afterwards removes the false positives. Net effect at 100 TB: the
    * probe-side exchange carries only ~selectivity × |fact| rows —
    * the same row-level runtime filtering Spark injects automatically
    * when `spark.sql.optimizer.runtime.bloomFilter.enabled` thresholds
    * hit, made explicit and deterministic (output is fp-independent
    * because the join is exact).
    */
  def scaleBloomPrefilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val qualifying = supplier(spark, sfDir)
      .filter($"s_acctbal" >= 5000.0)
      .select($"s_suppkey")
    val bloom = qualifying.stat.bloomFilter("s_suppkey", 1000L, 0.01)
    val mightContain = udf((k: Long) => bloom.mightContain(k))
    lineitem(spark, sfDir)
      .filter(mightContain($"l_suppkey"))
      .join(qualifying, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_suppkey")
      .agg(count(lit(1)).as("n_items"),
        sum(money($"l_quantity")).cast(DoubleType).as("sum_qty"))
      .orderBy($"s_suppkey")
  }

  /** Incremental aggregate maintenance — the materialized-view delta
    * pattern: the pre-2000 "base" aggregate (in production: yesterday's
    * materialized state, NOT recomputed) is merged with the aggregate
    * of only the delta partition via one full-outer join on the group
    * key, coalescing each side's partial count/sum. Correct because
    * count and the decimal sum are associative — the merged result is
    * bit-identical to a full recompute (which IS the oracle). At
    * 100 TB this is the difference between re-shuffling the whole
    * history every load and shuffling only the delta plus a key-
    * partitioned merge against pre-aggregated (orders-of-magnitude
    * smaller) state.
    */
  def pipelineIncrementalAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cutoff = ntz("2000-01-01 00:00:00")
    def partial(df: DataFrame): DataFrame =
      df.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n"), sum(money($"o_totalprice")).as("rev"))
    val base  = partial(orders(spark, sfDir).filter($"o_orderdate" < cutoff))
      .select($"o_custkey", $"n".as("base_n"), $"rev".as("base_rev"))
    val delta = partial(orders(spark, sfDir).filter($"o_orderdate" >= cutoff))
      .select($"o_custkey", $"n".as("delta_n"), $"rev".as("delta_rev"))
    base.join(delta, Seq("o_custkey"), "full_outer")
      .select($"o_custkey",
        (coalesce($"base_n", lit(0L)) + coalesce($"delta_n", lit(0L)))
          .as("n_orders"),
        (coalesce($"base_rev", lit(0).cast(D12_2))
          + coalesce($"delta_rev", lit(0).cast(D12_2)))
          .cast(DoubleType).as("revenue"))
      .orderBy($"o_custkey")
  }

  /** Time-series gap-fill: per user, the daily event count and max
    * value on a GAP-FREE day spine (sequence from that user's first to
    * last active day), missing days zero-filled for counts and
    * forward-filled (last non-null over an unbounded-preceding frame)
    * for the value — the resample-and-ffill step every downstream
    * window model assumes. max (not sum) is the carried metric:
    * order-independent and exact across engines. Scale shape: the
    * daily pre-aggregation shrinks events to user×day BEFORE the spine
    * join and window, so the shuffled volume is bounded by the
    * calendar, not the event rate; spine join and fill window share
    * the user_id partitioning.
    */
  def tsGapFill(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"user_id",
        date_trunc("DAY", $"ts").cast(DateType).as("day"))
      .agg(count(lit(1)).as("n_events"), max($"value").as("day_max"))
    val spine = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val fill = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left_outer")
      .select($"user_id", $"day",
        coalesce($"n_events", lit(0L)).as("n_events"),
        last($"day_max", ignoreNulls = true).over(fill).as("filled_max"))
      .orderBy($"user_id", $"day")
  }

  /** One-pass column profiling — the data-quality summary a 100 TB
    * ingestion runs before anything else: non-null count, exact
    * distinct count, min and max for each numeric lineitem column,
    * all in ONE scan (a single multi-aggregate; Spark plans the four
    * count-distincts via one Expand at ×4 row amplification — one
    * pass over the data instead of four separate jobs), then
    * `stack`ed into one row per column. Exact distincts because the
    * oracle needs exactness; the approx_count_distinct variant of this
    * op is the sketch tier (agg_approx_count_distinct).
    */
  def pipelineProfileColumns(spark: SparkSession, sfDir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}_n"), countDistinct(col(c)).as(s"${c}_d"),
        min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    }
    val one = lineitem(spark, sfDir).agg(aggs.head, aggs.tail: _*)
    val stacked = cols
      .map(c => s"'$c', ${c}_n, ${c}_d, ${c}_min, ${c}_max")
      .mkString(", ")
    one.selectExpr(
        s"stack(${cols.size}, $stacked) AS " +
          "(column_name, n_nonnull, n_distinct, min_val, max_val)")
      .orderBy("column_name")
  }
}
