package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 46: seasonal Mann–Kendall trend test and
  * a string-similarity profile trio.
  */
object Round13Ops46 {

  /** Seasonal Mann–Kendall: the MK sign-pair statistic computed
    * WITHIN each weekday strand (season = epoch-day mod 7 — an
    * arithmetic weekday, immune to the Spark-1-based/DuckDB-0-based
    * dayofweek mismatch) and summed, so a strong weekly cycle no
    * longer drowns the monotone trend the plain MK test sees. All
    * pair signs are exact cent comparisons; the variance term
    * Σ n(n−1)(2n+5)/18 and continuity-corrected z are the only
    * doubles. Pairs form per-season, so the self-join is 7 balanced
    * shuffle partitions, not one global cross.
    */
  def tsSeasonalMannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(sum((money($"o_totalprice") * 100).cast(LongType)).as("c"))
      .withColumn("season",
        pmod(datediff($"d", lit("1970-01-01").cast(DateType)), lit(7)))
    val pairs = daily.as("a").join(daily.as("b"),
        col("a.season") === col("b.season") && col("a.d") < col("b.d"))
      .select(col("a.season").as("season"),
        signum((col("b.c") - col("a.c")).cast(DoubleType))
          .cast(LongType).as("sg"))
    val perSeason = pairs.groupBy($"season")
      .agg(sum($"sg").as("sw"), count(lit(1)).as("npairs"))
    val counts = daily.groupBy($"season").agg(count(lit(1)).as("nw"))
    val tot = perSeason.join(counts, "season")
      .agg(count(lit(1)).as("n_seasons"), sum($"sw").as("s_total"),
        sum($"nw" * ($"nw" - 1) * ($"nw" * 2 + 5)).as("var18"))
    tot.select($"n_seasons", $"s_total", $"var18".as("var_num_x18"),
      round(($"s_total".cast(DoubleType) -
        signum($"s_total".cast(DoubleType))) /
        sqrt($"var18".cast(DoubleType) / 18.0), 6).as("z_score"))
  }

  /** Three string-similarity measures over consecutive part names:
    * Levenshtein distance, character-set Jaccard (computed from
    * explicit distinct-char lists on BOTH engines — never a builtin
    * whose tokenization might differ), and longest-common-prefix
    * length via monotone prefix equality. The record-linkage feature
    * block, as one codegen'd projection per pair.
    */
  def fnNameSimilarityProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = part(spark, sfDir).filter($"p_partkey" < 40)
      .select($"p_partkey".as("k"), $"p_name".as("nm"))
    val pairs = p.as("x").join(p.as("y"),
        col("y.k") === col("x.k") + 1)
      .select(col("x.k").as("key_a"), col("x.nm").as("name_a"),
        col("y.nm").as("name_b"))
    pairs.select($"key_a", $"name_a", $"name_b",
        levenshtein($"name_a", $"name_b").cast(LongType).as("lev_dist"),
        round(
          size(array_intersect(array_distinct(split($"name_a", "")),
            array_distinct(split($"name_b", "")))).cast(DoubleType) /
          size(array_union(array_distinct(split($"name_a", "")),
            array_distinct(split($"name_b", "")))), 6).as("char_jaccard"),
        expr("""CAST(size(filter(
            sequence(1, least(length(name_a), length(name_b))),
            i -> substring(name_a, 1, i) = substring(name_b, 1, i)))
          AS BIGINT)""").as("lcp_len"))
      .orderBy($"key_a")
  }
}
