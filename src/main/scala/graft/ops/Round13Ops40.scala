package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 40: Croston's intermittent-demand method
  * (fixed-point) and the Wilcoxon signed-rank paired test (exact
  * doubled ranks).
  */
object Round13Ops40 {

  /** Croston's method for part 1's shipment demand — the forecasting
    * model for series that are MOSTLY ZERO, where EWMA/Holt collapse
    * toward zero between demands. Demand sizes and inter-demand
    * intervals get separate α=1/5 smoothings, both in ×1e6
    * fixed-point integers with truncating division, folded over the
    * full calendar day grid in one `aggregate`. The demand rate z/p is
    * the only double. Croston state is per-part, so at corpus scale
    * this shape runs once per part key inside one groupBy.
    */
  def tsCrostonIntermittent(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val grid = lineitem(spark, sfDir)
      .select($"l_shipdate".cast(DateType).as("d")).distinct()
    val demand = lineitem(spark, sfDir)
      .filter($"l_partkey" === 1)
      .groupBy($"l_shipdate".cast(DateType).as("d"))
      .agg(sum($"l_quantity".cast(LongType)).as("q"))
    val arr = grid.join(demand, Seq("d"), "left")
      .select($"d", coalesce($"q", lit(0L)).as("q"))
      .agg(array_sort(collect_list(struct($"d", $"q"))).as("sq"))
      .select(expr("transform(sq, x -> x.q)").as("qs"))
      .select($"qs", size($"qs").cast(LongType).as("n"))
    val fin = expr("""
      aggregate(
        sequence(1, CAST(n AS INT)),
        named_struct('z', CAST(0 AS BIGINT), 'p', CAST(0 AS BIGINT),
          'last', CAST(0 AS BIGINT), 'cnt', CAST(0 AS BIGINT)),
        (st, i) -> CASE
          WHEN element_at(qs, i) = 0 THEN st
          WHEN st.cnt = 0 THEN named_struct(
            'z', element_at(qs, i) * 1000000,
            'p', CAST(i AS BIGINT) * 1000000,
            'last', CAST(i AS BIGINT), 'cnt', CAST(1 AS BIGINT))
          ELSE named_struct(
            'z', (element_at(qs, i) * 1000000 + 4 * st.z) div 5,
            'p', ((i - st.last) * 1000000 + 4 * st.p) div 5,
            'last', CAST(i AS BIGINT), 'cnt', st.cnt + 1)
          END,
        st -> st)""")
    arr.select($"n".as("n_days"), fin.as("f"))
      .select($"n_days", $"f.cnt".as("n_demand_days"),
        $"f.z".as("size_smoothed_1e6"), $"f.p".as("interval_smoothed_1e6"),
        round($"f.z".cast(DoubleType) / $"f.p", 6).as("demand_rate"))
  }

  /** Wilcoxon signed-rank test on per-user purchase value, first half
    * of the event window vs second half. Doubled average ranks
    * (min-pos + max-pos per |d| tie group) keep the rank algebra in
    * exact integers; W⁺/W⁻ are emitted doubled, and the normal
    * approximation z (no tie-variance correction — documented choice)
    * is the single mirrored double. The paired complement of
    * analytic_mannwhitney_u.
    */
  def analyticWilcoxonSignedRank(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts".cast(DateType).as("d"),
        (money($"value") * 100).cast(LongType).as("v"))
    val d0 = p.agg(min($"d").as("d0"))
    val halves = p.crossJoin(broadcast(d0))
      .withColumn("post", ($"d" >= date_add($"d0", 15)).cast(IntegerType))
      .groupBy($"user_id")
      .agg(sum(when($"post" === 0, $"v").otherwise(0L)).as("pre"),
        sum(when($"post" === 1, $"v").otherwise(0L)).as("post"),
        sum(lit(1) - $"post").as("npre"), sum($"post").as("npost"))
      .filter($"npre" > 0 && $"npost" > 0)
      .select($"user_id", ($"post" - $"pre").as("diff"))
      .filter($"diff" =!= 0)
      .withColumn("ad", abs($"diff"))
    // global ranks without a global Window: value-range buckets count
    // in parallel, bucket offsets come from a bounded bucket×bucket
    // join, and each row's rank is offset + bucket-local rank (the
    // aggExactGlobalMedian distributed-selection shape)
    val bucketed = halves.withColumn("bkt",
      expr("ad div 1048576"))
    val bc = bucketed.groupBy($"bkt").agg(count(lit(1)).as("bn"))
    val off = bc.as("a").join(bc.as("b"),
        col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bn")), lit(0L)).as("n_before"))
    val pos = bucketed.join(broadcast(off), "bkt")
      .withColumn("r", $"n_before" + row_number().over(
        Window.partitionBy($"bkt").orderBy($"ad", $"user_id")))
    val r2 = pos.withColumn("rr",
      min($"r").over(Window.partitionBy($"ad")) +
        max($"r").over(Window.partitionBy($"ad")))
    val agg = r2.agg(count(lit(1)).as("m"),
      sum(when($"diff" > 0, $"rr").otherwise(0L)).as("wp2"),
      sum(when($"diff" < 0, $"rr").otherwise(0L)).as("wm2"))
    agg.select($"m".as("n_pairs"), $"wp2".as("w_plus_x2"),
      $"wm2".as("w_minus_x2"),
      round(($"wp2".cast(DoubleType) / 2.0 -
        ($"m" * ($"m" + 1)).cast(DoubleType) / 4.0) /
        sqrt(($"m" * ($"m" + 1) * ($"m" * 2 + 1)).cast(DoubleType) / 24.0),
        6).as("z_score"))
  }
}
