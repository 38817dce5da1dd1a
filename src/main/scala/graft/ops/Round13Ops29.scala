package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 29: all-modes aggregation, sample-ratio
  * mismatch guardrail, and rolling regression slopes.
  */
object Round13Ops29 {

  /** ALL tied modes per group (the single-mode aggregate silently
    * drops ties): per (priority, quantity) counts, keep every value
    * whose count equals the group max, return them as a sorted array
    * — two hash aggregates plus a broadcast max join, never a sort of
    * the raw data.
    */
  def aggMultiMode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = orders(spark, sfDir)
      .join(lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority".as("priority"),
        $"l_quantity".cast(IntegerType).as("q"))
      .agg(count(lit(1)).as("c"))
    val mx = counts.groupBy($"priority".as("p2")).agg(max($"c").as("mc"))
    counts.join(broadcast(mx), $"priority" === $"p2" && $"c" === $"mc")
      .groupBy($"priority")
      .agg(max($"mc").as("mode_count"),
        // joined string, not ARRAY: oracle outputs stay atomic
        // (ContractSpec's column-type hygiene pin)
        array_join(array_sort(collect_list($"q")), ",").as("modes"),
        count(lit(1)).as("n_modes"))
      .orderBy($"priority")
  }

  /** Sample-ratio mismatch — the first guardrail every experiment
    * readout runs: the two arms (user mod 2) should split 50/50;
    * χ² = Σ(o−e)²/e against that design flags randomization bugs
    * before anyone reads the metrics. Counts exact, χ² a two-term
    * epilogue, the 3.841 critical value (α=0.05, df=1) frozen as a
    * literal.
    */
  def analyticSrmCheck(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val g = events(spark, sfDir)
      .select($"user_id").distinct()
      .groupBy(pmod($"user_id", lit(2)).cast(IntegerType).as("arm"))
      .agg(count(lit(1)).as("n"))
    val t = g.agg(sum($"n").as("tn"))
    val e = $"tn".cast(DoubleType) / lit(2.0)
    val terms = g.crossJoin(broadcast(t))
      .select($"arm", $"n", round(e, 1).as("expected"),
        round(($"n" - e) * ($"n" - e) / e, 6).as("chi2_term"))
    // global χ² via a scalar aggregate + crossJoin, NOT an
    // unpartitioned window (banned board-wide); summing the two
    // frozen terms is order-free
    val tot = terms.agg(round(sum($"chi2_term"), 6).as("chi2_total"))
      .select($"chi2_total", ($"chi2_total" > 3.841).as("srm_flag"))
    terms.crossJoin(broadcast(tot))
      .orderBy($"arm")
  }

  /** Rolling 14-day regression slope of daily volume per event type:
    * the windowed sums of (x, y, xy, x²) are exact integers inside a
    * keyed 14-row frame, and each row's slope is the closed-form
    * epilogue over its own frame sums — trend velocity as a window
    * function, no per-row refits. Only full frames emit.
    */
  def winRollingSlope(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
      .withColumn("x",
        datediff($"d", to_date(lit("1995-01-01"))).cast(LongType))
    val w = Window.partitionBy($"event_type").orderBy($"x")
      .rowsBetween(-13, 0)
    val withSums = daily
      .withColumn("nw", count(lit(1)).over(w))
      .withColumn("sx", sum($"x").over(w))
      .withColumn("sy", sum($"c").over(w))
      .withColumn("sxy", sum($"x" * $"c").over(w))
      .withColumn("sxx", sum($"x" * $"x").over(w))
      .filter($"nw" === 14)
    val nD = $"nw".cast(DoubleType)
    val slope = ($"sxy".cast(DoubleType) -
      $"sx".cast(DoubleType) * $"sy".cast(DoubleType) / nD) /
      ($"sxx".cast(DoubleType) -
        $"sx".cast(DoubleType) * $"sx".cast(DoubleType) / nD)
    withSums.select($"event_type", $"d", $"c",
        round(slope, 6).as("slope14"))
      .orderBy($"event_type", $"d")
  }
}
