package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 6: agreement statistics (Cohen's kappa,
  * Matthews correlation), cumulative gain/lift deciles, an A/B
  * two-proportion z-test, degree assortativity of the co-supply
  * graph, Jensen-Shannon divergence between language unigram
  * distributions, and the Theil-Sen robust trend estimator.
  *
  * All six follow the repo's exactness protocol: counts and sums stay
  * integer/DECIMAL until one final float expression per output row,
  * written with the IDENTICAL operation tree in the DuckDB oracle so
  * both engines round through the same path.
  */
object Round11Ops6 {

  private def u24(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    expr(s"CAST(conv(substring(md5(CAST(${key.toString} AS STRING)), 1, 6), 16, 10) AS BIGINT)")

  /** Cohen's kappa and the Matthews correlation coefficient of the
    * md5-uniform pseudo-classifier (ŷ = [p ≥ ½] ⇔ k ≥ 2²³) against the
    * value≥50 label, per event type. The confusion cells are one hash
    * aggregate; every product in both formulas rides DECIMAL(38,0)
    * (cell counts can reach 10¹² at corpus scale, so BIGINT products
    * would overflow), and the one sqrt+division per row is the only
    * float math. Chance-corrected agreement is the right scoreboard
    * when labels are imbalanced — accuracy alone (ml_confusion_metrics)
    * overstates degenerate models.
    */
  def mlKappaMcc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    val cells = events(spark, sfDir)
      .withColumn("y", (money($"value") >= lit(50)).cast(IntegerType))
      .withColumn("yh", (u24($"event_id") >= lit(8388608L)).cast(IntegerType))
      .groupBy($"event_type")
      .agg(count(when($"y" === 1 && $"yh" === 1, 1)).cast(d38).as("tp"),
        count(when($"y" === 0 && $"yh" === 1, 1)).cast(d38).as("fp"),
        count(when($"y" === 1 && $"yh" === 0, 1)).cast(d38).as("fn"),
        count(when($"y" === 0 && $"yh" === 0, 1)).cast(d38).as("tn"))
    cells.select($"event_type",
        $"tp".cast(LongType).as("tp"), $"fp".cast(LongType).as("fp"),
        $"fn".cast(LongType).as("fn"), $"tn".cast(LongType).as("tn"),
        round(($"tp" * $"tn" - $"fp" * $"fn").cast(DoubleType) * 2 /
          ((($"tp" + $"fp") * ($"fp" + $"tn") +
            ($"tp" + $"fn") * ($"fn" + $"tn")).cast(DoubleType)), 6)
          .as("kappa"),
        // pairwise sqrts: the 4-way integer product would overflow the
        // 38-digit lane at ~10¹² rows; two 2-way products stay exact
        round(($"tp" * $"tn" - $"fp" * $"fn").cast(DoubleType) /
          (sqrt((($"tp" + $"fp") * ($"tp" + $"fn")).cast(DoubleType)) *
           sqrt((($"tn" + $"fp") * ($"tn" + $"fn")).cast(DoubleType))), 6)
          .as("mcc"))
      .orderBy($"event_type")
  }

  /** Cumulative-gains / lift table by pseudo-score decile: decile 1 is
    * the top-scored 10% (the md5-uniform bin, reversed), gain is the
    * cumulative share of positives captured, lift is gain over the
    * random baseline d/10. The cumulative sum runs on the 10-row
    * decile table via the tiny triangular join — corpus work is one
    * hash aggregate. This is the campaign-targeting scoreboard that
    * complements ml_calibration_bins' reliability view.
    */
  def mlGainLift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec = events(spark, sfDir)
      .withColumn("k", u24($"event_id"))
      .withColumn("decile",
        (lit(10) - expr("CAST((10 * k + 5) DIV 16777216 AS INT)")).as("decile"))
      .withColumn("y", (money($"value") >= lit(50)).cast(LongType))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"), sum($"y").as("pos"))
    val tot = dec.agg(sum($"n").as("nt"), sum($"pos").as("pt"))
    val cum = dec.as("a").join(dec.as("b"), $"b.decile" <= $"a.decile")
      .groupBy($"a.decile".as("decile"), $"a.n".as("n"), $"a.pos".as("pos"))
      .agg(sum($"b.n").as("cn"), sum($"b.pos").as("cpos"))
    cum.crossJoin(broadcast(tot))
      .select($"decile", $"n", $"pos",
        round($"cpos".cast(DoubleType) / $"pt", 6).as("gain"),
        round($"cpos".cast(DoubleType) * $"nt" /
          ($"pt".cast(DoubleType) * $"cn"), 6).as("lift"))
      .orderBy($"decile")
  }

  /** Two-proportion z-test between md5-split user cohorts (classic A/B
    * readout): conversion = user has ≥1 BIG purchase (value ≥ 200 —
    * plain "any purchase" is universally true in this data and a 100%
    * pooled rate zeroes the variance); z uses the pooled variance. Per-user flags are one hash aggregate keyed by
    * user (the natural shard key); the four counts collapse to a
    * single row and the z formula is one fixed double expression —
    * both engines evaluate the identical tree on identical integers.
    */
  def analyticAbtestZtest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val users = events(spark, sfDir)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" && money($"value") >= 200, 1)
        .otherwise(0)).as("conv"))
      .withColumn("grp",
        expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 6), 16, 10) AS BIGINT) % 2"))
    users.agg(
        count(when($"grp" === 0, 1)).as("n_a"),
        count(when($"grp" === 1, 1)).as("n_b"),
        sum(when($"grp" === 0, $"conv").otherwise(0)).as("conv_a"),
        sum(when($"grp" === 1, $"conv").otherwise(0)).as("conv_b"))
      .select($"n_a", $"n_b", $"conv_a", $"conv_b",
        round($"conv_a".cast(DoubleType) / $"n_a", 6).as("p_a"),
        round($"conv_b".cast(DoubleType) / $"n_b", 6).as("p_b"),
        round(($"conv_a".cast(DoubleType) / $"n_a" -
               $"conv_b".cast(DoubleType) / $"n_b") /
          sqrt((($"conv_a" + $"conv_b").cast(DoubleType) / ($"n_a" + $"n_b")) *
            (lit(1.0) - ($"conv_a" + $"conv_b").cast(DoubleType) / ($"n_a" + $"n_b")) *
            (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")), 6).as("z"))
  }

  /** Degree assortativity of the thinned co-supply graph: Pearson
    * correlation of endpoint degrees over the DIRECTED edge list (each
    * undirected edge counted both ways, the standard symmetrization).
    * By symmetry Σx = Σy and Σx² = Σy², so r = (M·Σxy − S₁²)/(M·Σx² −
    * S₁²) — every sum an exact DECIMAL(38,0) integer (degrees are
    * bounded by the top-k thinning, so products can't overflow the
    * lane even at 10¹² edges), one double division at the end.
    * Positive r = hubs link hubs; negative = hub-and-spoke.
    */
  def graphAssortativity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    val und = Round10Ops4.thinnedGraph(spark, sfDir)
    val adj = und.select($"u".as("a"), $"v".as("b"))
      .unionAll(und.select($"v".as("a"), $"u".as("b")))
    val deg = adj.groupBy($"a".as("node")).agg(count(lit(1)).as("degree"))
    val withDeg = adj
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("degree", "dx"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("degree", "dy"), "b")
    withDeg.agg(
        count(lit(1)).cast(d38).as("m"),
        sum($"dx".cast(d38)).as("s1"),
        sum(($"dx" * $"dx").cast(d38)).as("s2"),
        sum(($"dx" * $"dy").cast(d38)).as("se"))
      .select($"m".cast(LongType).as("n_directed_edges"),
        round(($"m" * $"se" - $"s1" * $"s1").cast(DoubleType) /
          ($"m" * $"s2" - $"s1" * $"s1").cast(DoubleType), 6)
          .as("assortativity"))
  }

  /** Jensen-Shannon divergence (in bits) between the en and de unigram
    * distributions — the corpus-drift / style-gap measure. Each term's
    * contribution ½(p·log₂(p/m) + q·log₂(q/m)) is computed in doubles
    * from EXACT integer counts and immediately rounded into the 9-dp
    * DECIMAL lane, so the corpus-wide sum is order-free; absent terms
    * contribute only their present side (full outer join on the two
    * bounded vocab tables). JSD is symmetric and bounded in [0,1] bits
    * — the spec asserts both.
    */
  def textJsDivergence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def counts(l: String) = documents(spark, sfDir)
      .filter($"lang" === l)
      .select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as(s"c_$l"))
    val joined = counts("en").join(counts("de"), Seq("term"), "full_outer")
      .select($"term", coalesce($"c_en", lit(0L)).as("ca"),
        coalesce($"c_de", lit(0L)).as("cb"))
    val tot = joined.agg(sum($"ca").as("na"), sum($"cb").as("nb"))
    val contrib = joined.crossJoin(broadcast(tot))
      .withColumn("p", $"ca".cast(DoubleType) / $"na")
      .withColumn("q", $"cb".cast(DoubleType) / $"nb")
      .withColumn("m", ($"p" + $"q") / 2)
      .withColumn("c",
        round((when($"ca" > 0, $"p" * log2($"p" / $"m")).otherwise(lit(0.0)) +
               when($"cb" > 0, $"q" * log2($"q" / $"m")).otherwise(lit(0.0))) / 2, 9)
          .cast(DecimalType(28, 9)))
    contrib.agg(
        count(lit(1)).as("n_terms"),
        count(when($"ca" > 0 && $"cb" > 0, 1)).as("n_shared"),
        round(sum($"c").cast(DoubleType), 6).as("jsd_bits"))
  }

  /** Theil-Sen robust trend of daily revenue per event type: the
    * median over all C(n,2) pairwise slopes — outlier days can't move
    * it the way OLS (ts_trend_slope) lets them. The daily rollup
    * BOUNDS the series (≈30 points/type at any corpus size), so the
    * pair self-join and the per-type rank window both run on
    * constant-size inputs; the median avoids interpolation-formula
    * drift between engines by explicitly averaging the two middle
    * order statistics AFTER rounding each slope into the 9-dp lane.
    */
  def tsTheilSen(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type",
        date_trunc("day", $"ts").cast(DateType).as("d"))
      .agg(sum(money($"value")).as("v"))
      .withColumn("dn", datediff($"d", to_date(lit("2024-01-01"))))
    val pairs = daily.as("x").join(daily.as("y"),
        col("x.event_type") === col("y.event_type") && col("x.dn") < col("y.dn"))
      .select(col("x.event_type").as("event_type"),
        round((col("y.v") - col("x.v")).cast(DoubleType) /
          (col("y.dn") - col("x.dn")), 9).cast(DecimalType(28, 9)).as("slope"),
        col("x.dn").as("i"), col("y.dn").as("j"))
    val w = Window.partitionBy($"event_type").orderBy($"slope", $"i", $"j")
    val ranked = pairs.withColumn("rn", row_number().over(w))
    val n = pairs.groupBy($"event_type").agg(count(lit(1)).as("np"))
    ranked.join(broadcast(n), "event_type")
      // integer div (Spark's / on integers is true division); odd np
      // selects the single middle slope twice-as-one, even np both
      // middle order statistics
      .filter($"rn" === expr("(np + 1) div 2") || $"rn" === expr("np div 2 + 1"))
      .groupBy($"event_type", $"np")
      // mean of the ≤2 middle slopes via exact decimal sum / count —
      // avg(DECIMAL) would return DECIMAL here but DOUBLE in DuckDB
      .agg(round(sum($"slope").cast(DoubleType) / count(lit(1)), 6)
        .as("theil_sen_slope"))
      .select($"event_type", $"np".as("n_pairs"), $"theil_sen_slope")
      .orderBy($"event_type")
  }
}
