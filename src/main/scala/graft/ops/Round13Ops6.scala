package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 6: second-order time-series diagnostics
  * built on the ts_acf_table / ts_dft_power scaffolds — Ljung-Box
  * whiteness, spectral entropy, and PACF via Durbin-Levinson. The
  * shared ACF base reuses the date-shift equi-join shape (no dynamic
  * window offsets); every intermediate statistic freezes at a fixed
  * decimal scale before reuse so both engines chain identical
  * values.
  */
object Round13Ops6 {

  /** ACF lags 1..maxLag per event type over the daily count series,
    * exactly the ts_acf_table recipe (6-dp frozen deviation products,
    * one shared denominator), plus the series length n_days.
    */
  private def acfBase(spark: SparkSession, sfDir: String,
      maxLag: Int): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val mu = daily.groupBy($"event_type".as("et"))
      .agg((sum($"c").cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("mu"))
    val dev = daily.join(mu, $"event_type" === $"et")
      .select($"event_type", $"d", ($"c".cast(DoubleType) - $"mu").as("dv"))
    val den = dev.groupBy($"event_type".as("et2"))
      .agg(sum(round($"dv" * $"dv", 6).cast(DecimalType(28, 6))).as("den"))
    val nd = daily.groupBy($"event_type".as("et3"))
      .agg(count(lit(1)).as("n_days"))
    val lagged = dev.withColumn("k", explode(array((1 to maxLag).map(lit): _*)))
      .select($"event_type", $"d", $"k", $"dv")
    val pairs = lagged.as("a").join(
        dev.select($"event_type".as("e2"), $"d".as("d2"), $"dv".as("dv2")),
        col("a.event_type") === $"e2" &&
        $"d2" === expr("date_add(a.d, a.k)"))
      .groupBy(col("a.event_type").as("event_type"), col("a.k").as("k"))
      .agg(sum(round(col("a.dv") * $"dv2", 6).cast(DecimalType(28, 6)))
        .as("num"))
    pairs.join(den, $"event_type" === $"et2")
      .join(broadcast(nd), $"event_type" === $"et3")
      .select($"event_type", $"k", $"n_days",
        round($"num".cast(DoubleType) / $"den".cast(DoubleType), 6).as("acf"))
  }

  /** Ljung-Box Q over lags 1..7 — the "is anything left in the
    * residuals?" portmanteau test a forecasting pipeline runs after
    * fitting. Per-lag terms ρ²/(n−k) freeze at 12 dp as DECIMAL
    * before the 7-row sum (they are O(1e-4); 6 dp would quantize
    * them away), so the only doubles crossing rows are already
    * frozen. Q = n(n+2)·Σ terms is the scalar epilogue.
    */
  def tsLjungBox(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nD = $"n_days".cast(DoubleType)
    acfBase(spark, sfDir, 7)
      .withColumn("term", round($"acf" * $"acf" / ($"n_days" - $"k"), 12)
        .cast(DecimalType(28, 12)))
      .groupBy($"event_type", $"n_days")
      .agg(sum($"term").as("st"), count(lit(1)).as("df"))
      .select($"event_type", $"n_days", $"df",
        round(nD * (nD + lit(2.0)) * $"st".cast(DoubleType), 4).as("q_stat"))
      .orderBy($"event_type")
  }

  /** Spectral entropy of the daily series over DFT bins k=1..8 (the
    * ts_dft_power recipe: 6-dp frozen cos/sin quantized per (day,k),
    * exact count-weighted decimal sums). Bin powers freeze at 4 dp;
    * p·log2(p) terms freeze at 8 dp; the normalizer is log2(8)=3
    * EXACTLY, so no cross-engine ln(8) constant enters. Near-1 means
    * white noise, near-0 a single dominant cycle.
    */
  def tsSpectralEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val span = daily.groupBy($"event_type".as("et"))
      .agg(min($"d").as("d0"), count(lit(1)).as("n_days"))
    val pow = daily.join(span, $"event_type" === $"et")
      .withColumn("i", datediff($"d", $"d0").cast(LongType))
      .withColumn("k", explode(array((1 to 8).map(lit): _*)))
      .withColumn("ang",
        lit(2.0 * math.Pi) * $"k" * $"i" / $"n_days".cast(DoubleType))
      .withColumn("cosq", round(cos($"ang"), 6).cast(DecimalType(12, 6)))
      .withColumn("sinq", round(sin($"ang"), 6).cast(DecimalType(12, 6)))
      .groupBy($"event_type", $"k")
      .agg(max($"n_days").as("n_days"),
        sum($"cosq" * $"c").as("req"), sum($"sinq" * $"c").as("imq"))
      .select($"event_type", $"k", $"n_days",
        round($"req".cast(DoubleType) * $"req".cast(DoubleType) +
          $"imq".cast(DoubleType) * $"imq".cast(DoubleType), 4)
          .cast(DecimalType(28, 4)).as("pow"))
    val tot = pow.groupBy($"event_type".as("et2"))
      .agg(sum($"pow").as("totp"))
    val p = $"pow".cast(DoubleType) / $"totp".cast(DoubleType)
    pow.join(broadcast(tot), $"event_type" === $"et2")
      .select($"event_type", $"n_days",
        when($"pow" > 0, round(-p * log2(p), 8)).otherwise(lit(0.0))
          .cast(DecimalType(28, 8)).as("term"))
      .groupBy($"event_type", $"n_days")
      .agg(sum($"term").as("st"))
      .select($"event_type", $"n_days",
        round($"st".cast(DoubleType) / lit(3.0), 6).as("spectral_entropy"))
      .orderBy($"event_type")
  }

  /** PACF at lags 1..3 via Durbin-Levinson over the ACF values. Every
    * recursion intermediate (φ22, φ21, φ33) freezes at 6 dp the
    * moment it is produced, so the chained double expressions consume
    * identical inputs in both engines — the recurrence never
    * propagates an unrounded double across a step.
    */
  def tsPacf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val r = acfBase(spark, sfDir, 3)
      .groupBy($"event_type")
      .agg(max(when($"k" === 1, $"acf")).as("r1"),
        max(when($"k" === 2, $"acf")).as("r2"),
        max(when($"k" === 3, $"acf")).as("r3"))
      .withColumn("p22",
        round(($"r2" - $"r1" * $"r1") / (lit(1.0) - $"r1" * $"r1"), 6))
      .withColumn("p21", round($"r1" - $"p22" * $"r1", 6))
      .withColumn("p33", round(
        ($"r3" - $"p21" * $"r2" - $"p22" * $"r1") /
        (lit(1.0) - $"p21" * $"r1" - $"p22" * $"r2"), 6))
    r.select($"event_type", $"r1".as("pacf1"), $"p22".as("pacf2"),
        $"p33".as("pacf3"))
      .orderBy($"event_type")
  }
}
