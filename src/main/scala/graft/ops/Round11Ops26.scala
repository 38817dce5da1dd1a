package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 26: split-part functions, session
  * variables, difference-in-differences, trimmed mean, table-valued
  * generators, pinball loss.
  */
object Round11Ops26 {

  /** Tokenizing scalar surface: split with a LIMIT (trailing segments
    * keep their separators), split_part's 1-based field extraction
    * (negative index counts from the end), and substring_index's
    * prefix semantics — the three field-extraction idioms ETL code
    * actually reaches for on delimited keys.
    */
  def fnSplitPart(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    part(spark, sfDir)
      .select($"p_partkey", $"p_name",
        split($"p_name", " ", 2).getItem(0).as("head_tok"),
        split($"p_name", " ", 2).getItem(1).as("tail_rest"),
        expr("split_part(p_name, ' ', 1)").as("first_part"),
        expr("split_part(p_name, ' ', -1)").as("last_part"),
        substring_index($"p_name", " ", 2).as("first_two"))
      .orderBy($"p_partkey")
  }

  /** SQL session variables (DECLARE / SET VARIABLE) — the Spark 4
    * surface for parameterized SQL without string splicing: a
    * threshold and a segment name set once, referenced by the query.
    * Variables resolve at analysis time, so the filter still pushes
    * down to the scan like a literal.
    */
  def sqlSessionVariables(spark: SparkSession, sfDir: String): DataFrame = {
    customer(spark, sfDir).createOrReplaceTempView("g11_customer_sv")
    spark.sql("DECLARE OR REPLACE VARIABLE g11_min_bal DOUBLE")
    spark.sql("DECLARE OR REPLACE VARIABLE g11_segment STRING")
    spark.sql("SET VARIABLE g11_min_bal = 1000.0")
    spark.sql("SET VARIABLE g11_segment = 'BUILDING'")
    spark.sql("""
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) n,
        CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS BIGINT) sum_bal_cents
      FROM g11_customer_sv
      WHERE c_acctbal >= g11_min_bal AND c_mktsegment != g11_segment
      GROUP BY c_mktsegment ORDER BY c_mktsegment
    """)
  }

  /** Difference-in-differences: purchase value for a "treated" user
    * cohort (stable hash) vs control, before vs after a mid-month
    * cutoff — four exact-decimal cell means (ONE division each) and
    * the DiD estimate as pure double arithmetic over them, mirrored
    * operation-for-operation. The causal-analytics primitive on top
    * of any experiment log.
    */
  def analyticDiffInDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = events(spark, sfDir)
      .filter($"event_type" === "purchase")
      .select(
        when(pmod($"user_id", lit(2)) === 0, "treated")
          .otherwise("control").as("grp"),
        when(dayofmonth($"ts") <= 15, "before").otherwise("after")
          .as("period"),
        (money($"value") * 100).cast(LongType).as("cents"))
      .groupBy($"grp", $"period")
      .agg(count(lit(1)).as("n"), sum($"cents").as("sc"))
      .select($"grp", $"period", $"n",
        ($"sc".cast(DoubleType) / $"n".cast(DoubleType)).as("mean_cents"))
    val wide = cells.groupBy(lit(1).as("one"))
      .pivot(concat($"grp", lit("_"), $"period"),
        Seq("treated_before", "treated_after", "control_before", "control_after"))
      .agg(first($"mean_cents"))
    cells.select($"grp", $"period", $"n",
        round($"mean_cents", 6).as("mean_cents"))
      .crossJoin(broadcast(wide.select(
        round(($"treated_after" - $"treated_before") -
          ($"control_after" - $"control_before"), 6).as("did_cents"))))
      .orderBy($"grp", $"period")
  }

  /** Trimmed mean — the robust location estimate: per return flag,
    * drop the bottom and top decile by rank and average the core in
    * exact DECIMAL with ONE division. The outlier-proof aggregate
    * reporting pipelines use when means get dragged.
    *
    * Round 17: boundary-bucket selection. The round-16 form ranked the
    * WHOLE corpus (bucket-offset row_number over every row: one full
    * shuffle + sort — 3.2 s at sf0.1). But the census already fixes
    * each bucket's global rank span [boff, boff+bn]: buckets entirely
    * inside the kept (n/10, n−n/10] range contribute their census SUM
    * wholesale, and only the ≤ 2 straddling buckets per flag need a
    * row-level rank — a window over a few thousand rows behind a
    * broadcast semi-filter, never the corpus. Ties still need no
    * tiebreak: a tie run crossing a cut keeps the same COUNT of
    * equal-valued rows whichever rows rank first, so the kept-sum is
    * order-stable (weighted-median logic).
    */
  def aggTrimmedMean(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, sfDir)
      .select($"l_returnflag", money($"l_extendedprice").as("m"))
      // value-domain bucket (cents DIV 2^16 ≈ $655 bands): equal
      // values share a bucket, so the global per-flag rank is the
      // intra-bucket rank plus the running count of lower buckets —
      // a (flag x ~200-bucket) census, never a 3-partition sort of
      // the whole table (round-16 low-card-window sweep)
      .withColumn("cb", expr("CAST(m * 100 AS BIGINT) DIV 65536"))
    val census = li.groupBy($"l_returnflag".as("c_rf"), $"cb".as("c_cb"))
      .agg(count(lit(1)).as("bn"), sum($"m").as("bsum"))
    val wOff = Window.partitionBy($"c_rf").orderBy($"c_cb")
      .rowsBetween(Window.unboundedPreceding, -1)
    // per-bucket kept intra-rank range (keepLo, keepHi], from the
    // census alone: lowCut = n DIV 10, highCut = n - n DIV 10
    val spans = census
      .withColumn("boff", coalesce(sum($"bn").over(wOff), lit(0L)))
      .withColumn("n", sum($"bn").over(Window.partitionBy($"c_rf")))
      .withColumn("keepLo", greatest(expr("n DIV 10") - $"boff", lit(0L)))
      .withColumn("keepHi", least($"n" - expr("n DIV 10") - $"boff", $"bn"))
      .filter($"keepHi" > $"keepLo")
    // both union legs pinned to DECIMAL(38,2): the census leg's
    // sum-of-sums otherwise widens past the row leg's type
    val whole = spans.filter($"keepLo" === 0 && $"keepHi" === $"bn")
      .groupBy($"c_rf".as("l_returnflag"))
      .agg(sum($"bn").as("k"),
        sum($"bsum").cast(DecimalType(38, 2)).as("s"))
    val bounds = spans.filter($"keepLo" > 0 || $"keepHi" < $"bn")
      .select($"c_rf", $"c_cb", $"keepLo", $"keepHi")
    val partial = li
      .join(broadcast(bounds), $"l_returnflag" === $"c_rf" && $"cb" === $"c_cb")
      .withColumn("rnb", row_number().over(
        Window.partitionBy($"l_returnflag", $"cb").orderBy($"m")))
      .filter($"rnb" > $"keepLo" && $"rnb" <= $"keepHi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("k"),
        sum($"m").cast(DecimalType(38, 2)).as("s"))
    whole.unionByName(partial)
      .groupBy($"l_returnflag")
      .agg(sum($"k").as("n_kept"), sum($"s").as("sm"))
      .select($"l_returnflag", $"n_kept",
        round($"sm".cast(DoubleType) / $"n_kept".cast(DoubleType), 6)
          .as("trimmed_mean"))
      .orderBy($"l_returnflag")
  }

  /** Table-valued generators in the FROM clause: inline() exploding a
    * literal struct array (the SQL-native dimension seed) joined to a
    * real aggregate, plus stack() reshaping columns to rows — the
    * generator surface migrating SQL uses for small inline tables.
    */
  def sqlTvfInline(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g11_orders_tvf")
    spark.sql("""
      WITH bands AS (
        SELECT * FROM (SELECT inline(array(
          named_struct('band', 'low',  'lo', 0.0,      'hi', 50000.0),
          named_struct('band', 'mid',  'lo', 50000.0,  'hi', 150000.0),
          named_struct('band', 'high', 'lo', 150000.0, 'hi', 1e18))))
      )
      SELECT band, CAST(count(*) AS BIGINT) n,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS BIGINT) sum_cents
      FROM g11_orders_tvf JOIN bands
        ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band ORDER BY band
    """)
  }

  /** Pinball (quantile) loss of the seasonal-naive forecast at
    * q = 0.5 and q = 0.9 — the metric that scores quantile forecasts
    * asymmetrically. Errors are exact integers; q·error stays exact
    * as integer-over-10 math (10-scaled loss summed as integers, ONE
    * final division), so the score is partitioning-independent.
    */
  def mlPinballLoss(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
    val scored = daily
      .withColumn("f", lag($"c", 7).over(w))
      .filter($"f".isNotNull)
      .withColumn("err", $"c" - $"f")
    // pinball(q) = q·err if err >= 0 else (q-1)·err; with q = k/10 the
    // 10-scaled loss 10·L is integer: k·err or (k-10)·err
    val ks = Seq(5, 9)
    val aggs = count(lit(1)).as("n") +:
      ks.map(k => sum(when($"err" >= 0, $"err" * k)
        .otherwise($"err" * (k - 10))).as(s"l$k"))
    val agg = scored.groupBy($"event_type").agg(aggs.head, aggs.tail: _*)
    agg.select($"event_type",
        explode(array(ks.map(k =>
          struct(lit(k / 10.0).as("q"),
            (col(s"l$k").cast(DoubleType) / ($"n".cast(DoubleType) * 10.0))
              .as("raw"))): _*)).as("r"),
        $"n")
      .select($"event_type", $"r.q", $"n".as("n_scored"),
        round($"r.raw", 6).as("pinball_loss"))
      .orderBy($"event_type", $"q")
  }
}
