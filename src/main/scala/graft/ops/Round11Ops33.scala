package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 33: harmonic mean, string builders,
  * normalized-key join, weekend uplift.
  */
object Round11Ops33 {

  /** Harmonic mean of line price per return flag — the rate-averaging
    * mean (price per unit across heterogeneous lines). Reciprocals
    * freeze at 12 dp as DECIMAL (values ≥ 900, so 1/x carries ~4
    * significant digits of headroom), their sum is exact, and the
    * mean is ONE division — alongside the arithmetic (agg_stats) and
    * geometric (agg_product_logsum) means this completes the
    * Pythagorean trio.
    */
  def aggHarmonicMean(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .select($"l_returnflag",
        round(lit(1.0) / $"l_extendedprice", 12)
          .cast(DecimalType(28, 12)).as("r"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"r").as("sr"))
      .select($"l_returnflag", $"n",
        round($"n".cast(DoubleType) / $"sr".cast(DoubleType), 6)
          .as("harmonic_mean"))
      .orderBy($"l_returnflag")
  }

  /** String-builder scalar surface: overlay (in-place splice), repeat,
    * lpad to fixed width, reverse — the formatting idioms report
    * exports use. The oracle rebuilds each result with substring
    * algebra (DuckDB has no overlay), so semantics are checked, not
    * echoed.
    */
  def fnStringBuilders(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    part(spark, sfDir)
      .select($"p_partkey", $"p_name",
        expr("overlay(p_name PLACING '###' FROM 3 FOR 3)").as("spliced"),
        expr("repeat(substring(p_name, 1, 2), 3)").as("repeated"),
        lpad($"p_partkey".cast(StringType), 10, "0").as("padded_key"),
        reverse($"p_name").as("reversed"))
      .orderBy($"p_partkey")
  }

  /** Normalized-key join recovery: supplier names arrive case-mangled
    * and whitespace-padded (keyed deterministically); the raw join
    * loses the mangled rows, the normalized join (upper + trim on
    * BOTH sides) recovers every one. Normalization is per-row codegen
    * BEFORE the shuffle, so the join key cardinality — and the
    * shuffle — is unchanged at any scale; the audit quantifies what
    * normalization bought.
    */
  def joinNormalizedKeys(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dim = supplier(spark, sfDir).select($"s_name", $"s_nationkey")
    val messy = supplier(spark, sfDir)
      .select($"s_suppkey",
        when(pmod($"s_suppkey", lit(3)) === 0, upper($"s_name"))
          .when(pmod($"s_suppkey", lit(3)) === 1,
            concat(lit("  "), $"s_name", lit(" ")))
          .otherwise($"s_name").as("ref_name"))
    val raw = messy.join(dim, $"ref_name" === $"s_name", "left_outer")
      .agg(count(lit(1)).as("n"), count($"s_nationkey").as("raw_matched"))
    val norm = messy.join(
        dim.select(upper(trim($"s_name")).as("k"), $"s_nationkey"),
        upper(trim($"ref_name")) === $"k", "left_outer")
      .agg(count(lit(1)).as("n2"), count($"s_nationkey").as("norm_matched"))
    raw.crossJoin(norm)
      .select($"n".as("n_refs"), $"raw_matched", $"norm_matched",
        ($"norm_matched" - $"raw_matched").as("recovered"))
  }

  /** Weekend uplift per event type: weekend vs weekday mean daily
    * count, each mean ONE exact division, the uplift a mirrored
    * double ratio — the quick seasonality sanity stat behind every
    * staffing or pacing decision.
    */
  def analyticWeekendUplift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
      .withColumn("is_we", dayofweek($"d").isin(1, 7))
    daily.groupBy($"event_type")
      .agg(count(when($"is_we", 1)).as("n_we_days"),
        sum(when($"is_we", $"c").otherwise(lit(0L))).as("we_events"),
        count(when(!$"is_we", 1)).as("n_wd_days"),
        sum(when(!$"is_we", $"c").otherwise(lit(0L))).as("wd_events"))
      .select($"event_type", $"n_we_days", $"n_wd_days",
        round(($"we_events".cast(DoubleType) / $"n_we_days".cast(DoubleType)) /
          ($"wd_events".cast(DoubleType) / $"n_wd_days".cast(DoubleType)), 6)
          .as("weekend_uplift"))
      .orderBy($"event_type")
  }
}
