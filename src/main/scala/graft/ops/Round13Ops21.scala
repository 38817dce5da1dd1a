package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 21: exact dynamic-time-warping distance as
  * a wavefront fold, and hierarchical forecast reconciliation.
  */
object Round13Ops21 {

  /** DTW distance between every pair of event-type daily series, in
    * EXACT integer arithmetic: the DP runs over anti-diagonals (the
    * classic wavefront — cells within a diagonal are independent, so
    * each step reads only the two previous diagonals), carried as a
    * (prev, prevprev) array pair through ONE runtime `aggregate`
    * fold. No per-cell recursion ever appears in the plan — the
    * repo's rule for deep self-referencing recurrences (the
    * scale_hilbert_cluster lesson) — and the oracle replays the same
    * wavefront as a DuckDB recursive CTE, cell-for-cell identical
    * because every cost is a BIGINT. Scale shape: one date-aligned
    * join + one fold per pair; pairs parallelize independently.
    */
  def tsDtwDistance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val pairs = daily.as("x").join(daily.as("y"),
        col("x.d") === col("y.d") &&
        col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("ta"), col("y.event_type").as("tb"),
        col("x.d").as("d"), col("x.c").as("ca"), col("y.c").as("cb"))
    val arrs = pairs.groupBy($"ta", $"tb")
      .agg(array_sort(collect_list(struct($"d", $"ca", $"cb"))).as("s"))
      .select($"ta", $"tb", size($"s").as("n"),
        expr("transform(s, x -> x.ca)").as("a"),
        expr("transform(s, x -> x.cb)").as("b"))
    val inf = "CAST(1000000000000000 AS BIGINT)"
    val dtw = expr(s"""
      aggregate(
        sequence(3, 2 * n),
        named_struct(
          'prev', transform(sequence(1, n),
            i -> IF(i = 1, abs(element_at(a, 1) - element_at(b, 1)), $inf)),
          'pp', transform(sequence(1, n), i -> $inf)),
        (st, dg) -> named_struct(
          'prev', transform(sequence(1, n), i ->
            CASE WHEN dg - i >= 1 AND dg - i <= n THEN
              abs(element_at(a, i) - element_at(b, dg - i)) + least(
                IF(i > 1, element_at(st.prev, i - 1), $inf),
                element_at(st.prev, i),
                IF(i > 1, element_at(st.pp, i - 1), $inf))
            ELSE $inf END),
          'pp', st.prev),
        st -> element_at(st.prev, n))""")
    arrs.select($"ta".as("type_a"), $"tb".as("type_b"), $"n".as("n_days"),
        dtw.as("dtw_cost"))
      .withColumn("dtw_per_step",
        round($"dtw_cost".cast(DoubleType) / (lit(2.0) * $"n_days"), 4))
      .orderBy($"type_a", $"type_b")
  }

  /** Hierarchical forecast reconciliation: per-nation bottom-up
    * forecasts (last 7 days of orders, per nation) never sum to an
    * independently-made total forecast (last 14 days halved) — the
    * classic coherence problem; top-down reconciliation re-allocates
    * the total by each nation's observed share. All masses are exact
    * integers; only the allocation ratio is double, frozen at 6 dp.
    */
  def tsHierarchicalReconcile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, sfDir)
      .join(customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .select($"c_nationkey".cast(IntegerType).as("nation"),
        $"o_orderdate".cast(DateType).as("od"))
    val dmax = o.agg(max($"od").as("dmax"))
    val base = o.crossJoin(broadcast(dmax))
    val bu = base.filter($"od" > date_sub($"dmax", 7))
      .groupBy($"nation").agg(count(lit(1)).as("bottom_up"))
    val tot14 = base.filter($"od" > date_sub($"dmax", 14))
      .agg(count(lit(1)).as("n14"))
    val buTot = bu.agg(sum($"bottom_up").as("bu_total"))
    bu.crossJoin(broadcast(tot14)).crossJoin(broadcast(buTot))
      .select($"nation", $"bottom_up",
        round($"bottom_up".cast(DoubleType) / $"bu_total", 6).as("share"),
        expr("n14 div 2").as("total_forecast"),
        round(($"bottom_up".cast(DoubleType) / $"bu_total") *
          expr("n14 div 2").cast(DoubleType), 4).as("top_down"))
      .orderBy($"nation")
  }
}
