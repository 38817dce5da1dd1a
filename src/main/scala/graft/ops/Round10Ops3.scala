package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 widening, part 3: classic customer/revenue analytics
  * (RFM, ABC/Pareto), per-key trend fitting, calendar seasonality,
  * weight-proportional deterministic sampling, and the QUALIFY window
  * filter — each shaped so no corpus-sized state ever concentrates on
  * one partition (quantile boundaries and grand totals ride 1-row
  * broadcasts; the global prefix sum is the two-phase bucket form).
  */
object Round10Ops3 {

  /** RFM (recency / frequency / monetary) customer segmentation.
    * Quartile boundaries come from `percentile_disc` 1-row aggregates
    * cross-joined back (a broadcast of 9 scalars) — NOT from a global
    * `ntile` window, which would funnel every customer through one
    * partition. Scores are exact comparisons: recency on integer days,
    * frequency on counts, monetary on DECIMAL(12,2) sums, so the
    * boundary predicate is engine-independent. percentile_disc is the
    * "smallest value with cume_dist >= q" definition on both sides
    * (the oracle emulates it with a cume_dist window, the same recipe
    * as agg_percentile_disc).
    */
  def analyticRfmSegment(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g10c_orders")
    spark.sql("""
      WITH c AS (
        SELECT o_custkey AS custkey,
               max(CAST(o_orderdate AS DATE)) AS last_order,
               count(*) AS frequency,
               sum(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary0
        FROM g10c_orders GROUP BY o_custkey),
      a AS (SELECT max(last_order) AS anchor FROM c),
      r AS (SELECT custkey,
                   datediff(anchor, last_order) AS recency_days,
                   frequency, monetary0
            FROM c CROSS JOIN a),
      q AS (SELECT
              percentile_disc(0.25) WITHIN GROUP (ORDER BY recency_days) AS rq1,
              percentile_disc(0.50) WITHIN GROUP (ORDER BY recency_days) AS rq2,
              percentile_disc(0.75) WITHIN GROUP (ORDER BY recency_days) AS rq3,
              percentile_disc(0.25) WITHIN GROUP (ORDER BY frequency) AS fq1,
              percentile_disc(0.50) WITHIN GROUP (ORDER BY frequency) AS fq2,
              percentile_disc(0.75) WITHIN GROUP (ORDER BY frequency) AS fq3,
              percentile_disc(0.25) WITHIN GROUP (ORDER BY monetary0) AS mq1,
              percentile_disc(0.50) WITHIN GROUP (ORDER BY monetary0) AS mq2,
              percentile_disc(0.75) WITHIN GROUP (ORDER BY monetary0) AS mq3
            FROM r),
      s AS (SELECT custkey, recency_days, frequency,
                   CAST(monetary0 AS DOUBLE) AS monetary,
                   CASE WHEN recency_days <= rq1 THEN 4
                        WHEN recency_days <= rq2 THEN 3
                        WHEN recency_days <= rq3 THEN 2 ELSE 1 END AS r_score,
                   CASE WHEN frequency <= fq1 THEN 1
                        WHEN frequency <= fq2 THEN 2
                        WHEN frequency <= fq3 THEN 3 ELSE 4 END AS f_score,
                   CASE WHEN monetary0 <= mq1 THEN 1
                        WHEN monetary0 <= mq2 THEN 2
                        WHEN monetary0 <= mq3 THEN 3 ELSE 4 END AS m_score
            FROM r CROSS JOIN q)
      SELECT custkey, recency_days, frequency, monetary,
             r_score, f_score, m_score,
             concat(CAST(r_score AS STRING), CAST(f_score AS STRING),
                    CAST(m_score AS STRING)) AS rfm
      FROM s ORDER BY custkey
    """)
  }

  /** ABC / Pareto classification of parts by discounted revenue with a
    * DISTRIBUTED prefix sum — the board bans unpartitioned Window, so
    * the global running total is two-phase: (1) rows bucket by
    * floor(rev/1024) (1024 is a power of two, so the double division
    * is exact and both engines bucket identically) and a window
    * PARTITIONED by bucket accumulates within it; (2) per-bucket
    * totals — a value-range-bounded tiny table — self-join on "is a
    * strictly richer bucket" to give each bucket its offset. cum =
    * offset + within. All sums are DECIMAL-exact; the 80% / 95% class
    * boundaries are integer-multiplied DECIMAL comparisons (cum*5 vs
    * total*4, cum*20 vs total*19), so classification never touches
    * floats. This is the shape a 100 TB cumulative-share report needs:
    * no single partition ever sees more than one bucket's rows.
    */
  def analyticParetoAbc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val one = lit(BigDecimal(1).setScale(2))
    val rev = lineitem(spark, sfDir)
      .groupBy($"l_partkey")
      .agg(sum(money($"l_extendedprice") * (one - rate($"l_discount")))
        .as("rev"))
    val bucketed = rev.withColumn("b",
      floor($"rev".cast(DoubleType) / 1024.0).cast(LongType))
    val within = bucketed.withColumn("cum_in",
      sum($"rev").over(Window.partitionBy($"b")
        .orderBy($"rev".desc, $"l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val btot = bucketed.groupBy($"b").agg(sum($"rev").as("btot"))
    val offsets = btot.as("t1")
      .join(btot.as("t2"), $"t2.b" > $"t1.b", "left")
      .groupBy($"t1.b".as("b"))
      .agg(coalesce(sum($"t2.btot"), lit(BigDecimal(0))).as("offset"))
    val total = rev.agg(sum($"rev").as("total"))
    // down-cast the running totals to DECIMAL(28,4) before the ×5/×20
    // boundary arithmetic: keeps every product comfortably inside 38
    // digits on BOTH engines (Spark would otherwise silently reduce
    // scale past precision 38; DuckDB would widen differently)
    val cum = within.join(offsets, "b").crossJoin(broadcast(total))
      .withColumn("cum_rev",
        ($"offset" + $"cum_in").cast(DecimalType(28, 4)))
      .withColumn("totc", $"total".cast(DecimalType(28, 4)))
    cum.select(
        $"l_partkey",
        $"rev".cast(DoubleType).as("rev"),
        $"cum_rev".cast(DoubleType).as("cum_rev"),
        round($"cum_rev".cast(DoubleType) / $"totc".cast(DoubleType), 6)
          .as("share"),
        when($"cum_rev" * 5 <= $"totc" * 4, "A")
          .when($"cum_rev" * 20 <= $"totc" * 19, "B")
          .otherwise("C").as("abc_class"))
      .orderBy($"rev".desc, $"l_partkey")
  }

  /** Per-supplier revenue trend: least-squares slope of monthly
    * revenue against a month index. The regression is the exact-
    * DECIMAL-moments protocol (n, Σm, Σrev, Σm², Σm·rev accumulated
    * exactly — integer×DECIMAL stays exact), with the slope formula
    * evaluated once on doubles and rounded at 6dp, so both engines run
    * the identical 5-op IEEE sequence per supplier. Two shuffles
    * total (month rollup, supplier rollup), both on bounded keys.
    */
  def tsTrendSlope(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val monthly = lineitem(spark, sfDir)
      .groupBy($"l_suppkey",
        ((year($"l_shipdate") - 1995) * 12 + month($"l_shipdate") - 1)
          .as("m"))
      .agg(sum(money($"l_extendedprice")).as("rev"))
    monthly.groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n_months"),
        sum($"m".cast(LongType)).as("sm"),
        sum($"rev").as("sr"),
        sum(($"m" * $"m").cast(LongType)).as("smm"),
        sum($"rev" * $"m").as("smr"))
      .filter($"n_months" >= 2 &&
        $"n_months" * $"smm" =!= $"sm" * $"sm")
      .selectExpr("l_suppkey", "CAST(n_months AS BIGINT) AS n_months",
        """round((CAST(n_months AS DOUBLE) * CAST(smr AS DOUBLE)
          |  - CAST(sm AS DOUBLE) * CAST(sr AS DOUBLE))
          | / (CAST(n_months AS DOUBLE) * CAST(smm AS DOUBLE)
          |  - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)), 6)
          |AS slope""".stripMargin.replace("\n", " "))
      .orderBy($"l_suppkey")
  }

  /** Weekday seasonality of event traffic: mean daily event count per
    * ISO weekday divided by the overall mean daily count. Day counts
    * are exact integers; the two divisions happen once per output row
    * on doubles (7 rows), rounded at 6dp. The overall mean rides a
    * 1-row broadcast — no global window, no second scan (both
    * aggregates reuse the same daily rollup). ISO weekday is computed
    * portably: Spark's dayofweek is 1=Sunday, so isodow =
    * ((dayofweek+5) % 7) + 1 matches DuckDB's isodow (1=Monday).
    */
  def tsSeasonalIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy(to_date($"ts").as("d"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("isodow", ((dayofweek($"d") + 5) % 7) + 1)
    val overall = daily.agg(
      sum($"cnt").as("tot_events"), count(lit(1)).as("tot_days"))
    daily.groupBy($"isodow")
      .agg(sum($"cnt").as("dow_events"), count(lit(1)).as("dow_days"))
      .crossJoin(broadcast(overall))
      .selectExpr("isodow",
        "CAST(dow_events AS BIGINT) AS dow_events",
        "CAST(dow_days AS BIGINT) AS dow_days",
        """round((CAST(dow_events AS DOUBLE) / CAST(dow_days AS DOUBLE))
          | / (CAST(tot_events AS DOUBLE) / CAST(tot_days AS DOUBLE)), 6)
          |AS seasonal_index""".stripMargin.replace("\n", " "))
      .orderBy($"isodow")
  }

  /** Weight-proportional Bernoulli sampling with a DETERMINISTIC
    * pseudo-uniform: u(k) = int(md5(k)[0..6]) / 16⁶ — the repo's
    * reservoir-hash recipe (md5 hex is identical on both engines; a
    * modular-arithmetic LCG was tried first and is catastrophically
    * non-uniform for small sequential keys). ONE division and ONE
    * comparison on doubles, identical IEEE ops both engines. A row is
    * kept iff u < totalprice/max(totalprice), so inclusion probability
    * is proportional to spend; max rides a 1-row broadcast. Output is
    * the per-priority acceptance census — the sampled-rate-tracks-
    * weight property a mixture pipeline audits.
    */
  def sampleWeighted(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val mx = orders(spark, sfDir).agg(max($"o_totalprice").as("mx"))
    orders(spark, sfDir).crossJoin(broadcast(mx))
      .withColumn("u",
        expr("CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 6), 16, 10) AS BIGINT)")
          .cast(DoubleType) / 16777216.0)
      .withColumn("kept", $"u" < $"o_totalprice" / $"mx")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_total"),
        count(when($"kept", 1)).as("n_sampled"),
        sum(when($"kept", money($"o_totalprice"))).as("_sv"))
      .select($"o_orderpriority", $"n_total", $"n_sampled",
        $"_sv".cast(DoubleType).as("sampled_value"))
      .orderBy($"o_orderpriority")
  }

  /** The QUALIFY window filter (top-2 orders per calendar month by
    * totalprice): Spark has no QUALIFY clause, so the idiomatic form
    * is the ranked subquery — the window is PARTITIONED by month, and
    * Catalyst folds rank-<=-k predicates into per-partition top-k
    * (WindowGroupLimit) so no partition ever ranks more than k+ties
    * rows at scale. The oracle states the same query with DuckDB's
    * native QUALIFY, pinning that the emulation is semantics-exact.
    * Ties break on o_orderkey — a total order, both engines.
    */
  def sqlQualify(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g10c_orders_q")
    spark.sql("""
      SELECT ym, rk, o_orderkey, total
      FROM (
        SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
               o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS total,
               row_number() OVER (
                 PARTITION BY year(o_orderdate) * 100 + month(o_orderdate)
                 ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM g10c_orders_q)
      WHERE rk <= 2
      ORDER BY ym, rk
    """)
  }
}
