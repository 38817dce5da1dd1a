package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 5: more nonparametric inference —
  * Kruskal-Wallis k-group rank test, the Wald-Wolfowitz runs test,
  * and Cramér's V association strength. Same determinism protocol as
  * Round13Ops2: exact integer/decimal partials from the corpus pass,
  * double math only in a fixed-shape scalar epilogue mirrored
  * verbatim in the DuckDB oracle, round(...,6) at the boundary.
  */
object Round13Ops5 {

  /** Kruskal-Wallis H across the three return flags on the line
    * quantity. Rank sums stay EXACT by working on the distinct-VALUE
    * table (≤50 values): with t(v) the value's total count and cb(v) the
    * count of strictly smaller rows, the tie-averaged rank is
    * r(v) = cb + (t+1)/2, so 2·R_g = Σ_v n_g(v)·(2·cb(v) + t(v) + 1)
    * needs no fractional ranks. The corpus sees ONE hash aggregate to
    * (mode, lag) counts; the cumulative is an O(k) `aggregate` fold
    * over the sorted distinct-value array (the repo's
    * collect_list→array_sort shape — value-cardinality bounded, no
    * unpartitioned Window), and per-group H terms freeze at 6 dp as
    * DECIMAL before the k-row summation so the epilogue is
    * order-independent. Tie correction 1 − Σ(t³−t)/(N³−N) applied in
    * doubles. Identity Σ_g 2R_g = N(N+1) pinned in Round13Spec5.
    */
  def analyticKruskalWallis(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cnt = lineitem(spark, sfDir)
      .select($"l_returnflag".as("g"),
        $"l_quantity".cast(IntegerType).as("v"))
      .groupBy($"g", $"v").agg(count(lit(1)).as("ngv"))
    val tv = cnt.groupBy($"v").agg(sum($"ngv").as("t"))
    val cum = tv.agg(array_sort(collect_list(struct($"v", $"t"))).as("a"))
      .select(explode(expr("""
        aggregate(a,
          named_struct('acc', CAST(0 AS BIGINT),
            'out', CAST(array() AS ARRAY<STRUCT<v: INT, t: BIGINT,
                                                cb: BIGINT>>)),
          (s, x) -> named_struct(
            'acc', s.acc + x.t,
            'out', concat(s.out, array(named_struct(
              'v', x.v, 't', x.t, 'cb', s.acc)))),
          s -> s.out)""")).as("r"))
      .select($"r.v".as("v"), $"r.t".as("t"), $"r.cb".as("cb"))
    val grp = cnt.join(broadcast(cum), Seq("v"))
      .groupBy($"g")
      .agg(sum($"ngv").as("n_g"),
        sum($"ngv" * (lit(2L) * $"cb" + $"t" + lit(1L))).as("r2"))
    val ties = tv.agg(sum($"t" * $"t" * $"t" - $"t").as("tie3"),
      sum($"t").as("n"))
    val scal = grp.agg(
        sum(round($"r2".cast(DoubleType) * $"r2".cast(DoubleType) /
          (lit(4.0) * $"n_g"), 6).cast(DecimalType(38, 6))).as("sr"))
      .crossJoin(ties)
    val nD = $"n".cast(DoubleType)
    val h = lit(12.0) / (nD * (nD + lit(1.0))) * $"sr".cast(DoubleType) -
      lit(3.0) * (nD + lit(1.0))
    val corr = lit(1.0) - $"tie3".cast(DoubleType) / (nD * nD * nD - nD)
    val hrow = scal.select($"n".as("n_total"), round(h, 6).as("h_stat"),
      round(h / corr, 6).as("h_tie_corrected"))
    grp.crossJoin(broadcast(hrow))
      .select($"g".as("return_flag"), $"n_g", $"r2".as("rank_sum_x2"),
        round($"r2".cast(DoubleType) / (lit(2.0) * $"n_g"), 6).as("mean_rank"),
        $"n_total", $"h_stat", $"h_tie_corrected")
      .orderBy($"return_flag")
  }

  /** Wald-Wolfowitz runs test on the direction of day-over-day change
    * of each event type's daily volume — the "is this series random
    * noise?" screen. The day-over-day delta comes from a date-shift
    * equi-join (the ts_acf_table shape, no dynamic offsets); zero
    * deltas drop; the run count is ONE lag over a window PARTITIONED
    * by event_type (per-key series, board-allowed). n⁺/n⁻/R are exact
    * integers; E[R] = 2n⁺n⁻/n + 1 and the z-score are the fixed-shape
    * double epilogue.
    */
  def analyticRunsTest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val nxt = daily.select($"event_type".as("e2"), $"d".as("d2"), $"c".as("c2"))
    val diff = daily.join(nxt,
        $"event_type" === $"e2" && $"d2" === date_add($"d", 1))
      .select($"event_type", $"d", ($"c2" - $"c").as("dlt"))
      .filter($"dlt" =!= 0)
      .withColumn("sgn", when($"dlt" > 0, 1).otherwise(-1))
    val w = Window.partitionBy($"event_type").orderBy($"d")
    val runs = diff.withColumn("prev", lag($"sgn", 1).over(w))
      .groupBy($"event_type")
      .agg(sum(when($"sgn" > 0, 1L).otherwise(0L)).as("n_pos"),
        sum(when($"sgn" < 0, 1L).otherwise(0L)).as("n_neg"),
        sum(when($"prev".isNull || $"prev" =!= $"sgn", 1L)
          .otherwise(0L)).as("runs"))
    val np = $"n_pos".cast(DoubleType)
    val nn = $"n_neg".cast(DoubleType)
    val n = np + nn
    val e = lit(2.0) * np * nn / n + lit(1.0)
    val v = lit(2.0) * np * nn * (lit(2.0) * np * nn - n) /
      (n * n * (n - lit(1.0)))
    runs.select($"event_type", $"n_pos", $"n_neg", $"runs",
        round(e, 6).as("expected_runs"),
        round(($"runs".cast(DoubleType) - e) / sqrt(v), 6).as("z_score"))
      .orderBy($"event_type")
  }

  /** Cramér's V over the segment × nation contingency — the
    * effect-size companion to ml_chi_square_select's per-cell table
    * (a chi² alone grows with N; V is the scale-free association a
    * feature screen actually thresholds on). Observed and marginal
    * counts are exact integers from one aggregate over the cells;
    * per-cell chi² contributions freeze at 6 dp as DECIMAL before the
    * global sum so cross-cell double accumulation order can't skew
    * the statistic. V = √(χ²/(N·min(r−1,c−1))) is the scalar
    * epilogue.
    */
  def analyticCramersV(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = customer(spark, sfDir)
      .groupBy($"c_mktsegment".as("segment"),
        $"c_nationkey".cast(IntegerType).as("nation"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy($"segment").agg(sum($"obs").as("row_n"))
    val colT = cells.groupBy($"nation").agg(sum($"obs").as("col_n"))
    val tot = cells.agg(sum($"obs").as("n_total"))
    val dims = cells.agg(countDistinct($"segment").as("r"),
      countDistinct($"nation").as("c"))
    val e = ($"row_n" * $"col_n").cast(DoubleType) / $"n_total"
    val chi = cells
      .join(broadcast(rowT), Seq("segment"))
      .join(broadcast(colT), Seq("nation"))
      .crossJoin(broadcast(tot))
      .select(round(($"obs" - e) * ($"obs" - e) / e, 6)
        .cast(DecimalType(38, 6)).as("contrib"))
      .agg(sum($"contrib").as("chi2"))
    chi.crossJoin(broadcast(tot)).crossJoin(broadcast(dims))
      .select($"n_total", $"r".as("n_rows"), $"c".as("n_cols"),
        $"chi2".cast(DoubleType).as("chi2"),
        round(sqrt($"chi2".cast(DoubleType) /
          ($"n_total".cast(DoubleType) *
           (least($"r", $"c") - lit(1L)).cast(DoubleType))), 6)
          .as("cramers_v"))
  }
}
