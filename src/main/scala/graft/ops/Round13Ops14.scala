package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 14: piecewise trend fitting, IPv4 octet
  * analytics, and row-level-security policy views.
  */
object Round13Ops14 {

  /** Piecewise linear trend: the daily order count regressed per
    * 4-month segment (fixed knots — the changepoint-aware trend a
    * capacity forecast fits). Slopes come from exact integer
    * regression partials per (year-third) segment: one aggregate to
    * daily counts, one to the five partials, slope/intercept as the
    * closed-form double epilogue. No windows at all.
    */
  def tsPiecewiseTrend(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = orders(spark, sfDir)
      .groupBy($"o_orderdate".as("d"))
      .agg(count(lit(1)).as("c"))
      .select(datediff($"d", to_date(lit("1995-01-01"))).as("x")
        .cast(LongType), $"c",
        (month($"d") + lit(-1)).cast(IntegerType).as("m0"))
      .withColumn("seg", expr("m0 div 4"))
    val p = daily.groupBy($"seg")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"c").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"c").as("sxy"))
    val nD = $"n".cast(DoubleType)
    val slope = ($"sxy".cast(DoubleType) -
      $"sx".cast(DoubleType) * $"sy".cast(DoubleType) / nD) /
      ($"sxx".cast(DoubleType) -
        $"sx".cast(DoubleType) * $"sx".cast(DoubleType) / nD)
    p.withColumn("slope", round(slope, 6))
      .withColumn("intercept", round(($"sy".cast(DoubleType) -
        $"slope" * $"sx") / nD, 4))
      .select($"seg", $"n".as("n_days"), $"slope", $"intercept")
      .orderBy($"seg")
  }

  /** IPv4 log analytics in pure integer math: a synthetic client IP
    * per event (deterministic from event_id), split into octets with
    * div/mod, grouped at /16 — the subnet rollup every access-log
    * pipeline runs. The dotted-quad build is string concat over the
    * same integers, so oracle parity is exact.
    */
  def fnIpv4Octets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select(pmod($"event_id" * 2654435761L, lit(4294967296L)).as("ip"))
      .select($"ip",
        expr("ip div 16777216").as("o1"),
        expr("(ip div 65536) % 256").as("o2"),
        expr("(ip div 256) % 256").as("o3"),
        ($"ip" % 256).as("o4"))
      .groupBy($"o1", $"o2")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"ip").as("n_ips"),
        min(concat_ws(".", $"o1", $"o2", $"o3", $"o4")).as("sample_ip"))
      .orderBy($"n_events".desc, $"o1", $"o2")
      .limit(20)
  }

  /** Row-level security: a 3-role policy table (role → visible
    * nation set) applied as a broadcast semi-join filter, audited as
    * visible-row counts per role — the governed-view pattern where
    * the policy is DATA, not code, so changing entitlements never
    * redeploys the pipeline. The fact scan happens once per role
    * through one join (roles × rows), never per-row UDF checks.
    */
  def pipelineRowLevelSecurity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val policy = Seq(
      ("analyst_emea", 0, 9), ("analyst_apac", 10, 19),
      ("admin_global", 0, 24))
      .toDF("role", "nation_lo", "nation_hi")
    customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey".cast(IntegerType).as("nk"),
        (money($"c_acctbal") * 100).cast(LongType).as("bal_cents"))
      .join(broadcast(policy),
        $"nk" >= $"nation_lo" && $"nk" <= $"nation_hi")
      .groupBy($"role")
      .agg(count(lit(1)).as("n_visible"),
        countDistinct($"nk").as("n_nations"),
        sum($"bal_cents").as("sum_bal_cents"))
      .orderBy($"role")
  }
}
