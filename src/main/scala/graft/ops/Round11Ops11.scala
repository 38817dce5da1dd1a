package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 11: winsorized statistics, pairwise effect
  * sizes, Luhn checksum validation, directed-graph reciprocity,
  * month-over-month growth, and rolling correlation.
  */
object Round11Ops11 {

  /** Winsorized statistics: cap event values at the exact discrete
    * P5/P95 per event type, then report clip counts and the capped
    * sum in exact integer cents. percentile_disc picks observed
    * values (no interpolation, no rounding protocol); the 5-row
    * percentile table broadcasts back onto the corpus — bounded by
    * the event-type domain, not the corpus — so the cap pass is one
    * map-side join plus one hash aggregate.
    */
  def tsWinsorize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select($"event_type", (money($"value") * 100).cast(LongType).as("c"))
      .createOrReplaceTempView("g11_wz")
    spark.sql("""
      WITH p AS (SELECT event_type,
          CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY c) AS BIGINT) lo,
          CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY c) AS BIGINT) hi
        FROM g11_wz GROUP BY event_type)
      SELECT w.event_type, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN w.c < p.lo THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clip_lo,
        CAST(sum(CASE WHEN w.c > p.hi THEN 1 ELSE 0 END) AS BIGINT)
          AS n_clip_hi,
        CAST(sum(CASE WHEN w.c < p.lo THEN p.lo
                      WHEN w.c > p.hi THEN p.hi ELSE w.c END) AS BIGINT)
          AS winsorized_cents
      FROM g11_wz w JOIN p ON w.event_type = p.event_type
      GROUP BY w.event_type ORDER BY w.event_type
    """)
  }

  /** Pairwise Cohen's d / Hedges' g between event-type value
    * distributions. All second moments accumulate as exact integer
    * cents (DECIMAL(38,0) — cent squares overflow BIGINT at corpus
    * scale); the 5-row moment table self-joins triangularly, and the
    * d/g formulas are per-row scalar doubles (sqrt is IEEE
    * exact-rounded, so the 6-dp values are engine-stable). One corpus
    * pass total.
    */
  def mlEffectSize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = events(spark, sfDir)
      .select($"event_type", (money($"value") * 100).cast(DecimalType(38, 0)).as("c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"),
        sum(($"c" * $"c").cast(DecimalType(38, 0))).as("ss"))
    val a = m.select($"event_type".as("type_a"), $"n".as("n1"),
      $"s".as("s1"), $"ss".as("ss1"))
    val b = m.select($"event_type".as("type_b"), $"n".as("n2"),
      $"s".as("s2"), $"ss".as("ss2"))
    val d = col("d_raw")
    a.join(b, $"type_a" < $"type_b")
      .withColumn("m1", $"s1".cast(DoubleType) / $"n1")
      .withColumn("m2", $"s2".cast(DoubleType) / $"n2")
      .withColumn("v1",
        ($"n1".cast(DoubleType) * $"ss1".cast(DoubleType) -
          $"s1".cast(DoubleType) * $"s1".cast(DoubleType)) /
        ($"n1".cast(DoubleType) * ($"n1" - 1).cast(DoubleType)))
      .withColumn("v2",
        ($"n2".cast(DoubleType) * $"ss2".cast(DoubleType) -
          $"s2".cast(DoubleType) * $"s2".cast(DoubleType)) /
        ($"n2".cast(DoubleType) * ($"n2" - 1).cast(DoubleType)))
      .withColumn("sp", sqrt(
        (($"n1" - 1).cast(DoubleType) * $"v1" +
          ($"n2" - 1).cast(DoubleType) * $"v2") /
        ($"n1" + $"n2" - 2).cast(DoubleType)))
      .withColumn("d_raw", ($"m1" - $"m2") / $"sp")
      .select($"type_a", $"type_b", $"n1", $"n2",
        round(d, 6).as("cohens_d"),
        round(d * (lit(1.0) - lit(3.0) /
          (lit(4.0) * ($"n1" + $"n2").cast(DoubleType) - 9)), 6)
          .as("hedges_g"))
      .orderBy($"type_a", $"type_b")
  }

  /** Luhn checksum validation of order keys rendered as digit
    * strings — the card-number/ID hygiene check. Spark's native
    * `luhn_check` runs per row inside codegen; the oracle re-derives
    * the mod-10 double-every-second-digit sum from first principles,
    * so the two engines agree only if the checksum semantics do.
    */
  def fnLuhnCheck(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderpriority",
        expr("luhn_check(CAST(o_orderkey AS STRING))").as("ok"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(when($"ok", 1L).otherwise(0L)).as("n_luhn_valid"))
      .orderBy($"o_orderpriority")
  }

  /** Reciprocity of the directed event-transition graph: distinct
    * (from_type → to_type) edges observed as consecutive events per
    * user, and the share that exist in both directions. The edge set
    * is bounded by the squared type domain after one user-partitioned
    * lag pass over the corpus; the reciprocal test is a self-join on
    * that tiny set. One double division of exact counts.
    */
  def graphReciprocity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val edges = events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type".as("dst"))
      .withColumn("src", lag($"dst", 1).over(w))
      .filter($"src".isNotNull && $"src" =!= $"dst")
      .select($"src", $"dst").distinct()
    val rec = edges.as("e").join(edges.as("r"),
        $"e.src" === $"r.dst" && $"e.dst" === $"r.src", "left_semi")
    edges.agg(count(lit(1)).as("n_edges")).crossJoin(
        rec.agg(count(lit(1)).as("n_reciprocal")))
      .select($"n_edges", $"n_reciprocal",
        round($"n_reciprocal".cast(DoubleType) /
          $"n_edges".cast(DoubleType), 6).as("reciprocity"))
  }

  /** Month-over-month revenue growth per nation: calendar-month
    * rollup (exact DECIMAL cents), lag window partitioned by nation
    * (never unpartitioned), growth as one scalar double division
    * rounded to 6 dp. nation broadcasts (25 rows, domain-bounded);
    * orders⋈customer stays a shuffle join. The windowed series is
    * |nations|·|months| — independent of corpus size.
    */
  def analyticMomGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val monthly = orders(spark, sfDir)
      .join(customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(spark, sfDir)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name",
        date_trunc("month", $"o_orderdate").cast(DateType).as("mstart"))
      .agg(sum(money($"o_totalprice")).cast(DecimalType(18, 2)).as("rev"))
    val w = Window.partitionBy($"n_name").orderBy($"mstart")
    monthly
      .withColumn("prev", lag($"rev", 1).over(w))
      .select($"n_name", $"mstart",
        ($"rev" * 100).cast(LongType).as("rev_cents"),
        round(($"rev" - $"prev").cast(DoubleType) /
          $"prev".cast(DoubleType), 6).as("mom_growth"))
      .orderBy($"n_name", $"mstart")
  }

  /** 10-day rolling correlation between the purchase and view daily
    * revenue series. The two daily series join on date (tiny —
    * |days| rows, independent of corpus size), and the rolling frame
    * is a ±9-day band self-join on that bounded table — NOT a global
    * window, which would trip the board-wide unpartitioned-Window
    * ban. All five frame moments accumulate in exact DECIMAL(38,0)
    * cents, and the correlation is a per-row scalar double formula —
    * order-free end to end.
    */
  def tsRollingCorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def daily(t: String) = events(spark, sfDir)
      .filter($"event_type" === t)
      .groupBy(to_date($"ts").as("d"))
      .agg((sum(money($"value")) * 100).cast(DecimalType(38, 0)).as(s"c_$t"))
    val j = daily("purchase").join(daily("view"), Seq("d"))
    val dec = DecimalType(38, 0)
    val band = j.select($"d".as("ad")).join(j,
      datediff($"ad", $"d").between(0, 9))
    band.groupBy($"ad")
      .agg(count(lit(1)).as("nf"),
        sum($"c_purchase").as("s1"), sum($"c_view").as("s2"),
        sum(($"c_purchase" * $"c_purchase").cast(dec)).as("s11"),
        sum(($"c_view" * $"c_view").cast(dec)).as("s22"),
        sum(($"c_purchase" * $"c_view").cast(dec)).as("s12"))
      .filter($"nf" === 10)
      .select($"ad".as("d"),
        round((lit(10.0) * $"s12".cast(DoubleType) -
            $"s1".cast(DoubleType) * $"s2".cast(DoubleType)) /
          sqrt((lit(10.0) * $"s11".cast(DoubleType) -
              $"s1".cast(DoubleType) * $"s1".cast(DoubleType)) *
            (lit(10.0) * $"s22".cast(DoubleType) -
              $"s2".cast(DoubleType) * $"s2".cast(DoubleType))), 6)
          .as("rolling_corr"))
      .orderBy($"d")
  }
}
