package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 45: first-fit-decreasing bin packing for
  * file compaction and top-share revenue concentration.
  */
object Round13Ops45 {

  /** First-fit-decreasing bin packing of partition byte estimates
    * into 256 KiB compaction targets — the actual algorithm behind
    * "compact these small files into ~N optimal outputs" (the naive
    * cumulative split pipeline_compaction_plan uses leaves stragglers;
    * FFD is within 11/9·OPT+1). The greedy loop is inherently
    * sequential, so it runs as one `aggregate` fold over the sorted
    * weight array carrying the bin-load list (items are calendar-
    * bounded: one per (type, day)); the oracle replays the identical
    * fold via list_reduce. Reports the LP lower bound alongside so
    * the optimality gap is visible.
    */
  def pipelineFfdBinPacking(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cap = 262144L
    val items = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(sum(length($"props") + 64).cast(LongType).as("w"))
      .agg(sort_array(collect_list($"w"), asc = false).as("ws"))
    val packed = expr(s"""
      aggregate(
        ws,
        CAST(array() AS ARRAY<BIGINT>),
        (bins, w) -> IF(size(bins) = 0, array(w),
          IF(size(filter(sequence(1, size(bins)),
               j -> element_at(bins, j) + w <= $cap)) > 0,
             transform(sequence(1, size(bins)), j ->
               IF(j = element_at(filter(sequence(1, size(bins)),
                    jj -> element_at(bins, jj) + w <= $cap), 1),
                  element_at(bins, j) + w, element_at(bins, j))),
             concat(bins, array(w)))))""")
    items.select(size($"ws").cast(LongType).as("n_items"),
        expr("aggregate(ws, CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("total_bytes"),
        packed.as("bins"))
      .select($"n_items", $"total_bytes",
        size($"bins").cast(LongType).as("n_bins"),
        expr("array_max(bins)").as("max_bin_bytes"),
        expr(s"(total_bytes + ${cap - 1}) div $cap")
          .as("lower_bound_bins"),
        round($"total_bytes".cast(DoubleType) /
          (size($"bins").cast(DoubleType) * cap), 6).as("avg_fill"))
  }

  /** Revenue concentration: the share of total order value captured
    * by the top 1% / 5% / 10% of orders — exact integer rank cuts
    * (k = max(1, n div 100) etc.) and exact cent sums, one global
    * ranking window. The one-row "how top-heavy is demand" summary
    * that pareto/ABC reporting rolls up to.
    */
  def analyticTopShareConcentration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // descending global ranks via the bucket-offset selection shape
    // (aggExactGlobalMedian): value-range buckets count in parallel,
    // each row's rank = rows in higher buckets + bucket-local rank —
    // no unpartitioned ranking Window
    val o = orders(spark, sfDir)
      .select((money($"o_totalprice") * 100).cast(LongType).as("c"),
        $"o_orderkey".as("k"))
      .withColumn("bkt", expr("c div 1048576"))
    val bc = o.groupBy($"bkt").agg(count(lit(1)).as("bn"))
    val off = bc.as("a").join(bc.as("b"),
        col("b.bkt") > col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bn")), lit(0L)).as("n_above"))
    val ranked = o.join(broadcast(off), "bkt")
      .withColumn("rn", $"n_above" + row_number().over(
        Window.partitionBy($"bkt").orderBy($"c".desc, $"k")))
    val tot = o.agg(count(lit(1)).as("n"), sum($"c").as("t"))
    ranked.crossJoin(broadcast(tot))
      .agg(max($"n").as("n"), max($"t").as("total_cents"),
        sum(when($"rn" <= greatest(lit(1L), expr("n div 100")), $"c")
          .otherwise(0L)).as("s1"),
        sum(when($"rn" <= greatest(lit(1L), expr("n div 20")), $"c")
          .otherwise(0L)).as("s5"),
        sum(when($"rn" <= greatest(lit(1L), expr("n div 10")), $"c")
          .otherwise(0L)).as("s10"))
      .select($"n", $"total_cents",
        round($"s1".cast(DoubleType) / $"total_cents", 6).as("top1_share"),
        round($"s5".cast(DoubleType) / $"total_cents", 6).as("top5_share"),
        round($"s10".cast(DoubleType) / $"total_cents", 6)
          .as("top10_share"))
  }
}
