package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 18: triangular weighted moving average,
  * experiment sample-size planning, and tokenizer vocabulary
  * coverage curves.
  */
object Round13Ops18 {

  /** 7-day triangular WMA of daily event volume (weight k+1 on the
    * value k days back... weight 7 on today): the lag-k join shape
    * (ts_acf_table — no dynamic window offsets), weights as exact
    * integer multipliers so the numerator is an exact integer;
    * only complete 7-day windows emit. One shuffle on (type, date).
    */
  def tsWmaTriangular(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val lagged = daily
      .withColumn("k", explode(array((0 to 6).map(lit): _*)))
      .select($"event_type", expr("date_add(d, k)").as("d"),
        (lit(7) - $"k").cast(LongType).as("w"), $"c")
    lagged.join(daily.select($"event_type".as("e2"), $"d".as("d2")),
        $"event_type" === $"e2" && $"d" === $"d2")
      .groupBy($"event_type", $"d")
      .agg(sum($"w" * $"c").as("num"), count(lit(1)).as("nw"))
      .filter($"nw" === 7)
      .select($"event_type", $"d",
        round($"num".cast(DoubleType) / lit(28.0), 6).as("wma7"))
      .orderBy($"event_type", $"d")
  }

  /** Sample-size planning: per market segment, the N per arm needed
    * to detect a 1% lift in mean order value at α=0.05 / power 0.8 —
    * n = 2(z_α/2+z_β)²σ²/δ². Variance comes from exact decimal
    * partials (one aggregate over the joined facts); the z constants
    * freeze as literals so no inverse-normal evaluation happens in
    * either engine. ceil to whole units.
    */
  def analyticSampleSizePower(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val g = orders(spark, sfDir)
      .select($"o_custkey", (money($"o_totalprice") * 100)
        .cast(LongType).as("y"))
      .join(customer(spark, sfDir)
        .select($"c_custkey", $"c_mktsegment".as("segment")),
        $"o_custkey" === $"c_custkey")
      .groupBy($"segment")
      // y² sums reach ~1e20: DECIMAL(38,0) partials, never a long sum
      .agg(count(lit(1)).as("n"), sum($"y").as("s"),
        sum($"y".cast(DecimalType(38, 0)) * $"y").as("ss"))
    val nD = $"n".cast(DoubleType)
    val mean = $"s".cast(DoubleType) / nD
    val varP = ($"ss".cast(DoubleType) * nD -
      $"s".cast(DoubleType) * $"s".cast(DoubleType)) / (nD * nD)
    val z = lit(1.959964) + lit(0.841621)
    val delta = lit(0.01) * mean
    g.select($"segment", $"n".as("n_observed"),
        round(mean, 4).as("mean_cents"),
        round(sqrt(varP), 4).as("sd_cents"),
        ceil(lit(2.0) * z * z * varP / (delta * delta))
          .cast(LongType).as("n_required_per_arm"))
      .orderBy($"segment")
  }

  /** Vocabulary coverage curve: the share of all token occurrences
    * covered by the top-100 / top-1000 / top-4000 words — the curve
    * that sizes a tokenizer's vocabulary before training it. The
    * corpus collapses to the word-count table once; each coverage
    * point is a bounded top-K over that vocabulary-sized table with a
    * full (count, word) tiebreak, so the boundary is deterministic.
    */
  def textVocabCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val total = counts.agg(sum($"c").as("t"), count(lit(1)).as("v"))
    val points = Seq(100, 1000, 4000).map { k =>
      counts.orderBy($"c".desc, $"w").limit(k)
        .agg(sum($"c").as("covered"))
        .select(lit(k.toLong).as("vocab_k"), $"covered")
    }.reduce(_ unionAll _)
    points.crossJoin(broadcast(total))
      .select($"vocab_k", $"covered", $"v".as("n_distinct_words"),
        round($"covered".cast(DoubleType) / $"t", 6).as("coverage"))
      .orderBy($"vocab_k")
  }
}
