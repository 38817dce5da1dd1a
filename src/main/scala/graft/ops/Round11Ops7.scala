package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 7: marketing last-touch attribution, a
  * threshold sweep (precision/recall/F1 per score decile), Heaps'-law
  * vocabulary-growth fit, IQR outlier audit, language-centroid cosine
  * matrix, and weekday seasonal strength.
  */
object Round11Ops7 {

  /** Last-touch channel attribution: each purchase credits the user's
    * most recent PRECEDING non-purchase event type; purchases with no
    * preceding touch credit "direct". One partitioned window pass
    * (per-user state) + a bounded-key hash aggregate; revenue stays
    * exact DECIMAL to the display cast. The canonical marketing-mix
    * readout over a raw event stream.
    */
  def analyticAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, sfDir)
      .withColumn("chan",
        last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true)
          .over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"chan", lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(money($"value")).cast(DoubleType).as("revenue"))
      .orderBy($"channel")
  }

  /** Precision/recall/F1 at every score-decile threshold of the
    * md5-uniform pseudo-classifier: decile d = predict positive for
    * the top d deciles. The per-bin confusion counts come from ONE
    * corpus hash aggregate; the 10-threshold sweep is the triangular
    * join on the 10-row bin table, F1 in its fraction-free form
    * 2tp/(2tp+fp+fn) so every division starts from exact integers.
    * The operating-point picker that complements ml_gain_lift.
    */
  def mlThresholdSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bins = events(spark, sfDir)
      .withColumn("k",
        expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"))
      .withColumn("bin", expr("CAST((10 * k + 5) DIV 16777216 AS INT)"))
      .withColumn("y", (money($"value") >= lit(50)).cast(LongType))
      .groupBy($"bin").agg(count(lit(1)).as("n"), sum($"y").as("pos"))
    val tot = bins.agg(sum($"n").as("nt"), sum($"pos").as("pt"))
    val cum = bins.as("a").join(bins.as("b"), $"b.bin" >= $"a.bin")
      .groupBy($"a.bin".as("bin"))
      .agg(sum($"b.n").as("cn"), sum($"b.pos").as("tp"))
    cum.crossJoin(broadcast(tot))
      .select((lit(10) - $"bin").as("decile"), $"tp",
        ($"cn" - $"tp").as("fp"), ($"pt" - $"tp").as("fn"),
        round($"tp".cast(DoubleType) / $"cn", 6).as("precision"),
        round($"tp".cast(DoubleType) / $"pt", 6).as("recall"),
        round(($"tp" * 2).cast(DoubleType) /
          ($"tp" * 2 + ($"cn" - $"tp") + ($"pt" - $"tp")), 6).as("f1"))
      .orderBy($"decile")
  }

  /** Heaps'-law fit V = k·N^β over per-source vocabulary growth: the
    * log-log OLS of (ln tokens, ln types) across the 20 sources. Each
    * ln lands in the NANO-INTEGER lane (×10⁹, rounded — the
    * pipeline_column_entropy protocol): all OLS sums are then exact
    * DECIMAL(38,0) integers, the unit scale cancels in the slope, and
    * the intercept divides out one 10⁹ at the end. Corpus work is the
    * (source, term) hash aggregate; the regression folds 20 rows.
    * β ≈ 0.4-0.6 for natural text — a corpus-health signal.
    */
  def textHeapsFit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    val perSource = documents(spark, sfDir)
      .select($"source", explode(split($"text", " ")).as("term"))
      .groupBy($"source", $"term").agg(count(lit(1)).as("f"))
      .groupBy($"source")
      .agg(sum($"f").as("n_tokens"), count(lit(1)).as("n_types"))
    val nano = perSource.select(
      round(log($"n_tokens".cast(DoubleType)) * 1e9, 0).cast(d38).as("x"),
      round(log($"n_types".cast(DoubleType)) * 1e9, 0).cast(d38).as("y"))
    nano.agg(count(lit(1)).cast(d38).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"))
      .select($"n".cast(LongType).as("n_sources"),
        round(($"n" * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
          ($"n" * $"sxx" - $"sx" * $"sx").cast(DoubleType), 6).as("beta"),
        round(($"sy" * $"sxx" - $"sx" * $"sxy").cast(DoubleType) /
          ($"n" * $"sxx" - $"sx" * $"sx").cast(DoubleType) / 1e9, 6)
          .as("ln_k"))
  }

  /** Tukey-fence (1.5·IQR) outlier audit per event type on exact
    * 2-dp values: percentile_disc picks ACTUAL data elements (no
    * interpolation → no cross-engine float drift), the fences stay in
    * DECIMAL (1.5·IQR is exact at scale 3), and flag counts are one
    * aggregate. The distribution-free robust sibling of
    * pipeline_anomaly_mad's MAD screen.
    */
  def pipelineAnomalyIqr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select($"event_type", money($"value").as("v"))
      .createOrReplaceTempView("g11_iqr_events")
    spark.sql("""
      WITH q AS (
        SELECT event_type,
          percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS q1,
          percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS q3
        FROM g11_iqr_events GROUP BY event_type)
      SELECT e.event_type,
        CAST(q.q1 AS DOUBLE) AS q1, CAST(q.q3 AS DOUBLE) AS q3,
        CAST(count(*) AS BIGINT) AS n,
        CAST(count(CASE WHEN e.v < q.q1 - 1.5 * (q.q3 - q.q1)
          THEN 1 END) AS BIGINT) AS n_low,
        CAST(count(CASE WHEN e.v > q.q3 + 1.5 * (q.q3 - q.q1)
          THEN 1 END) AS BIGINT) AS n_high
      FROM g11_iqr_events e JOIN q ON e.event_type = q.event_type
      GROUP BY e.event_type, q.q1, q.q3
      ORDER BY e.event_type
    """)
  }

  /** Pairwise cosine similarity between per-language embedding
    * centroids — the 5×5 corpus-geometry map (which languages' docs
    * live in the same region of embedding space). Per-dimension
    * centroids are rounded into a 6-dp DECIMAL immediately after the
    * avg (the simCentroidDistance protocol), so the cross-centroid
    * dot/norm sums are EXACT decimal folds over 64 dims and the one
    * float division per pair rounds identically on both engines. The
    * corpus-sized work is the explode + (lang,pos) aggregate; the
    * matrix itself is 15 rows.
    */
  def simLangCentroidMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cent = embeddings(spark, sfDir)
      .join(documents(spark, sfDir).select($"doc_id", $"lang"),
        $"vec_id" === $"doc_id")
      .select($"lang", posexplode($"embedding"))
      .groupBy($"lang", $"pos")
      .agg(round(avg($"col".cast(DoubleType)), 6)
        .cast(DecimalType(12, 6)).as("c"))
    val pairs = cent.as("a").join(cent.as("b"),
        col("a.pos") === col("b.pos") && col("a.lang") <= col("b.lang"))
      .groupBy(col("a.lang").as("lang_a"), col("b.lang").as("lang_b"))
      .agg(sum(col("a.c") * col("b.c")).as("dot"),
        sum(col("a.c") * col("a.c")).as("na2"),
        sum(col("b.c") * col("b.c")).as("nb2"))
    pairs.select($"lang_a", $"lang_b",
        round($"dot".cast(DoubleType) /
          (sqrt($"na2".cast(DoubleType)) * sqrt($"nb2".cast(DoubleType))), 6)
          .as("cosine"))
      .orderBy($"lang_a", $"lang_b")
  }

  /** Weekday seasonal strength per event type: F = SS_between/SS_total
    * of daily event counts grouped by ISO weekday — how much of the
    * daily variance the weekly cycle explains (1 = pure weekly
    * pattern, 0 = none). Every sum-of-squares term starts from exact
    * integer daily counts; the ≤7 per-weekday S_w²/n_w terms are
    * rounded into the 9-dp lane before their (bounded, 7-row) sum, so
    * the statistic is order-free. Complements ts_seasonal_index's
    * per-weekday view with a single strength number.
    */
  def tsSeasonalStrength(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d38 = DecimalType(38, 0)
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).cast(d38).as("cnt"))
      .withColumn("dow", ((dayofweek($"d") + 5) % 7) + 1)
    val tot = daily.groupBy($"event_type")
      .agg(count(lit(1)).cast(d38).as("n"), sum($"cnt").as("s"),
        sum($"cnt" * $"cnt").as("ss"))
    val byDow = daily.groupBy($"event_type", $"dow")
      .agg(count(lit(1)).cast(d38).as("nw"), sum($"cnt").as("sw"))
      .groupBy($"event_type")
      .agg(sum(round(($"sw" * $"sw").cast(DoubleType) /
          $"nw".cast(DoubleType), 9)
        .cast(DecimalType(28, 9))).as("bw"))
    tot.join(byDow, "event_type")
      .select($"event_type", $"n".cast(LongType).as("n_days"),
        round(($"bw".cast(DoubleType) -
            ($"s" * $"s").cast(DoubleType) / $"n".cast(DoubleType)) /
          ($"ss".cast(DoubleType) -
            ($"s" * $"s").cast(DoubleType) / $"n".cast(DoubleType)), 6)
          .as("seasonal_strength"))
      .orderBy($"event_type")
  }
}
