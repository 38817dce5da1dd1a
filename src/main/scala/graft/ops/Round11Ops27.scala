package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 27: embedding dim-variance audit, PII
  * masking, mix-shift decomposition, revenue bridge, null-key
  * bypass, compound growth.
  */
object Round11Ops27 {

  /** Per-dimension variance audit of the embedding table — the
    * dead-dimension detector run before any index build (a
    * zero-variance dim wastes index bits). Columnar shape: posexplode
    * to (dim, component), components frozen at 6 dp as DECIMAL, and
    * n²·var = n·ssq − s² evaluated in EXACT decimal algebra — one
    * final double division per dim. Corpus×dims rows shuffle once on
    * the bounded dim key.
    */
  def simDimVarianceAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val comps = embeddings(spark, sfDir)
      .select(posexplode($"embedding".cast(ArrayType(DoubleType))))
      .select(($"pos" + 1).as("dim"),
        round($"col", 6).cast(DecimalType(18, 6)).as("x"))
    // the exact decimal sums cast to double ONCE, then a mirrored
    // double expression — ssq·n would overflow DECIMAL(38) and trip
    // Spark's precision-loss truncation (the ts_mix_entropy lesson)
    comps.groupBy($"dim")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"),
        sum($"x" * $"x").as("ssq"))
      .select($"dim", $"n",
        round($"s".cast(DoubleType) / $"n".cast(DoubleType), 6)
          .as("mean"),
        round(($"ssq".cast(DoubleType) * $"n".cast(DoubleType) -
          $"s".cast(DoubleType) * $"s".cast(DoubleType)) /
          ($"n".cast(DoubleType) * $"n".cast(DoubleType)), 6)
          .as("variance"))
      .orderBy($"dim")
  }

  /** Data masking with the mask() builtin: customer names keep their
    * SHAPE (case classes and digits become X/x/n) so downstream
    * format validation still works on masked exports — the
    * reversible-shape redaction contract. The oracle re-derives the
    * same masking with regexp algebra, checking semantics rather
    * than echoing the function.
    */
  def fnMaskPii(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    customer(spark, sfDir)
      .select($"c_custkey", $"c_name",
        expr("mask(c_name)").as("masked"),
        expr("mask(c_name, '#', '*', '0', NULL)").as("masked_custom"))
      .orderBy($"c_custkey")
  }

  /** Mix-shift decomposition of year-over-year revenue by order
    * priority: ΔRev = volume effect ((n₂−n₁)·avg₁) + rate effect
    * (n₂·(avg₂−avg₁)), the FP&A bridge identity (it telescopes
    * exactly: effects sum to the revenue delta per band). Means are
    * single divisions of exact decimals; effects are mirrored double
    * arithmetic over them.
    */
  def analyticMixShift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byYear = orders(spark, sfDir)
      .filter(year($"o_orderdate").isin(1996, 1997))
      .groupBy($"o_orderpriority".as("prio"), year($"o_orderdate").as("yr"))
      .agg(count(lit(1)).as("n"),
        sum((money($"o_totalprice") * 100).cast(LongType)).as("sc"))
      .select($"prio", $"yr", $"n", $"sc",
        ($"sc".cast(DoubleType) / $"n".cast(DoubleType)).as("avg_cents"))
    val y1 = byYear.filter($"yr" === 1996)
      .select($"prio", $"n".as("n1"), $"sc".as("sc1"), $"avg_cents".as("a1"))
    val y2 = byYear.filter($"yr" === 1997)
      .select($"prio".as("p2"), $"n".as("n2"), $"sc".as("sc2"),
        $"avg_cents".as("a2"))
    y1.join(y2, $"prio" === $"p2")
      .select($"prio", $"n1", $"n2",
        ($"sc2" - $"sc1").as("delta_cents"),
        round(($"n2" - $"n1").cast(DoubleType) * $"a1", 2)
          .as("volume_effect"),
        round($"n2".cast(DoubleType) * ($"a2" - $"a1"), 2)
          .as("rate_effect"))
      .orderBy($"prio")
  }

  /** Customer revenue bridge 1996 → 1997: the starting book walks to
    * the ending book through NEW, CHURNED, EXPANSION and CONTRACTION
    * components (full outer join of the two yearly books, exact
    * integer cents throughout) — the net-revenue-retention
    * decomposition every subscription business reports. The
    * reconciliation start + new − churn + expand − contract = end is
    * exact, not approximate.
    */
  def analyticRevenueBridge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def book(yr: Int) = orders(spark, sfDir)
      .filter(year($"o_orderdate") === yr)
      .groupBy($"o_custkey")
      .agg(sum((money($"o_totalprice") * 100).cast(LongType)).as("cents"))
    val b1 = book(1996).select($"o_custkey".as("k1"), $"cents".as("c1"))
    val b2 = book(1997).select($"o_custkey".as("k2"), $"cents".as("c2"))
    val j = b1.join(b2, $"k1" === $"k2", "full_outer")
    j.select(
        sum(coalesce($"c1", lit(0L))).as("start_cents"),
        sum(when($"k1".isNull, $"c2").otherwise(lit(0L))).as("new_cents"),
        sum(when($"k2".isNull, $"c1").otherwise(lit(0L))).as("churn_cents"),
        sum(when($"k1".isNotNull && $"k2".isNotNull && $"c2" > $"c1",
          $"c2" - $"c1").otherwise(lit(0L))).as("expansion_cents"),
        sum(when($"k1".isNotNull && $"k2".isNotNull && $"c2" < $"c1",
          $"c1" - $"c2").otherwise(lit(0L))).as("contraction_cents"),
        sum(coalesce($"c2", lit(0L))).as("end_cents"))
  }

  /** Null-key join bypass: keys that cannot match (inner-join nulls)
    * are filtered BEFORE the shuffle instead of riding it into a
    * skewed null partition — here 1-in-97 supplier keys are nulled to
    * model dirty data, and the aggregate proves the bypass loses
    * nothing an inner join would keep. At 100 TB a null-heavy key
    * column otherwise lands its entire null population on one
    * reducer.
    */
  def scaleNullSkewBypass(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, sfDir)
      .select(when(pmod($"l_suppkey", lit(97)) === 0, lit(null))
        .otherwise($"l_suppkey").as("sk"),
        money($"l_extendedprice").as("m"))
    val nullStats = li.filter($"sk".isNull)
      .agg(count(lit(1)).as("n_bypassed"))
    val joined = li.filter($"sk".isNotNull)
      .join(supplier(spark, sfDir), $"sk" === $"s_suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"), sum($"m").as("rev"))
    joined.crossJoin(broadcast(nullStats))
      .select($"s_nationkey", $"n_items",
        $"rev".cast(DoubleType).as("revenue"), $"n_bypassed")
      .orderBy($"s_nationkey")
  }

  /** Compound growth index: daily revenue growth factors chained into
    * a cumulative index per event type — exp of a RUNNING sum of
    * frozen log-factors (each day does ONE log, rounds to 9 dp,
    * freezes as DECIMAL; the window sum is then exact), so the
    * compounding is partitioning-independent. The running-product
    * idiom for financial return series, window-partitioned by series.
    */
  def winCompoundGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(sum((money($"value") * 100).cast(LongType)).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
    daily
      .withColumn("prev", lag($"cents", 1).over(w))
      .filter($"prev".isNotNull && $"prev" > 0)
      .withColumn("lf",
        round(log($"cents".cast(DoubleType) / $"prev".cast(DoubleType)), 9)
          .cast(DecimalType(28, 9)))
      .withColumn("cum_log", sum($"lf").over(
        Window.partitionBy($"event_type").orderBy($"d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select($"event_type", $"d",
        round(exp($"cum_log".cast(DoubleType)), 6).as("growth_index"))
      .orderBy($"event_type", $"d")
  }
}
