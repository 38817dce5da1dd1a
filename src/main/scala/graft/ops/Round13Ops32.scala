package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 32: symbolic series encoding and two
  * classical order-structure tests over the daily revenue series.
  */
object Round13Ops32 {

  /** Daily order revenue as exact 2dp decimals — the shared base
    * series. Calendar-bounded grain: one row per day regardless of
    * corpus size, so the downstream global windows stay tiny at any
    * SF.
    */
  private def daily(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(sum(money($"o_totalprice")).as("sv"))
  }

  /** SAX symbolization with an equi-depth alphabet: the daily series
    * is PAA-compressed into 7-day segments (exact decimal sums, then
    * one double division) and each segment mean is mapped to one of
    * four symbols by ntile — quartile breakpoints instead of the
    * classical Gaussian ones, so the alphabet is distribution-free
    * and the assignment is an exact rank computation with a (paa,
    * seg) total order, never a float-threshold comparison.
    */
  def tsSaxSymbols(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // calendar-bounded series: index by posexplode of the sorted
    // collected array (the repo's window-free ranking shape) — an
    // unpartitioned row_number would funnel the scan through one task
    val idx = daily(spark, sfDir)
      .agg(array_sort(collect_list(struct($"d", $"sv"))).as("s"))
      .select(posexplode(expr("transform(s, x -> x.sv)"))
        .as(Seq("i", "sv")))
    val segs = idx
      .groupBy(floor($"i" / 7).cast(LongType).as("seg"))
      .agg(count(lit(1)).as("n_days"), sum($"sv").as("ssum"))
      .withColumn("paa", $"ssum".cast(DoubleType) / $"n_days")
    // ntile(4) without a global window: rank the (paa, seg)-sorted
    // segment array by position and apply ntile's exact fill rule
    // (first K mod 4 tiles carry one extra row)
    val ranked = segs
      .agg(array_sort(collect_list(struct($"paa", $"seg", $"n_days",
        $"ssum"))).as("q"))
      .select(posexplode($"q").as(Seq("r0", "y")))
      .select($"y.seg".as("seg"), $"y.n_days".as("n_days"),
        $"y.paa".as("paa"), ($"r0" + 1).as("r"))
    val k = ranked.agg(count(lit(1)).as("kk"))
    ranked.crossJoin(broadcast(k))
      .withColumn("qt", expr("""CASE
        WHEN r <= (kk div 4 + 1) * (kk % 4)
          THEN (r + (kk div 4 + 1) - 1) div (kk div 4 + 1)
        ELSE (kk % 4) + (r - (kk div 4 + 1) * (kk % 4) + (kk div 4) - 1)
          div (kk div 4) END"""))
      .select($"seg", $"n_days", round($"paa", 6).as("paa_value"),
        when($"qt" === 1, "a").when($"qt" === 2, "b")
          .when($"qt" === 3, "c").otherwise("d").as("symbol"))
      .orderBy($"seg")
  }

  /** Cochran–Armitage trend test: is the 'F' (fulfilled) rate
    * monotone in order priority? Scores w = the priority digit (1 =
    * urgent … 5 = low), outcome = o_orderstatus = 'F'. Everything up
    * to the final z is exact integer sums (5 groups, map-side
    * combined); the z itself is one mirrored double formula
    * √N·(N·Σwr − R·Σwn) / √(R(N−R)·(N·Σw²n − (Σwn)²)) — identical
    * IEEE operation order on both engines, so bit-stable.
    */
  def analyticCochranArmitage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val g = orders(spark, sfDir)
      .groupBy(substring($"o_orderpriority", 1, 1).cast(IntegerType).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("r"))
    val s = g.agg(sum($"n").as("nn"), sum($"r").as("rr"),
      sum($"w" * $"n").as("swn"), sum($"w" * $"r").as("swr"),
      sum($"w" * $"w" * $"n").as("sw2n"))
    val nnD = $"nn".cast(DoubleType)
    val num = nnD * $"swr" - $"rr".cast(DoubleType) * $"swn"
    val den = ($"rr".cast(DoubleType) * ($"nn" - $"rr")) *
      (nnD * $"sw2n" - $"swn".cast(DoubleType) * $"swn")
    s.select($"nn".as("n_total"), $"rr".as("n_success"),
      $"swn".as("sum_wn"), $"swr".as("sum_wr"),
      round($"rr".cast(DoubleType) / $"nn", 6).as("pooled_rate"),
      round(sqrt(nnD) * num / sqrt(den), 6).as("z_trend"))
  }

  /** Turning-point test for serial randomness of the daily revenue
    * series: count strict interior local extrema (comparisons on
    * exact decimals — no float ties), compare with the iid
    * expectation 2(n−2)/3 and variance (16n−29)/90. A |z| ≫ 0 means
    * the series is smoother (trend/seasonality) or choppier than
    * noise — the cheap first gate before fitting any seasonal model.
    */
  def tsTurningPoints(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // lag/lead on a calendar-bounded series as array neighbors —
    // window-free (the prior unpartitioned Window was a plan-pin
    // violation even at 2400 rows)
    val c = daily(spark, sfDir)
      .agg(array_sort(collect_list(struct($"d", $"sv"))).as("s"))
      .select(expr("transform(s, x -> x.sv)").as("cs"))
      .select(size($"cs").cast(LongType).as("n"),
        expr("""CAST(size(filter(sequence(2, CAST(size(cs) - 1 AS INT)),
          i -> (element_at(cs, i) > element_at(cs, i - 1) AND
                element_at(cs, i) > element_at(cs, i + 1)) OR
               (element_at(cs, i) < element_at(cs, i - 1) AND
                element_at(cs, i) < element_at(cs, i + 1))))
          AS BIGINT)""").as("t"))
    val e = (lit(2) * ($"n" - 2)).cast(DoubleType) / 3
    val v = (lit(16) * $"n" - 29).cast(DoubleType) / 90
    c.select($"n".as("n_days"), $"t".as("n_turning"),
      round(e, 6).as("expected_turning"),
      round(($"t".cast(DoubleType) - e) / sqrt(v), 6).as("z_score"))
  }
}
