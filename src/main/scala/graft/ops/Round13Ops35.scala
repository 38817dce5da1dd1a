package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 35: long-range dependence (Hurst R/S) and
  * stylometric distance (Burrows' Delta), both arranged so every
  * cross-row sum happens on exact integers or frozen decimals —
  * never on order-sensitive doubles.
  */
object Round13Ops35 {

  /** Rescaled-range Hurst exponent of daily revenue. Per m-day block
    * the rescaled range collapses to (max E − min E)/√(m·Σc²−T²)
    * with E_j = m·cum_j − j·T — integer numerators and one exact
    * DECIMAL(38,0) spread term, so R/S is a single double division
    * per block. Block R/S values and the per-size log₂ means are
    * frozen at 9 dp before averaging/regressing; the final Hurst
    * slope over x = log₂ m ∈ {6,7,8,9} is a closed-form integer×
    * decimal regression. H ≈ 0.5 ⇒ the series diffuses like noise;
    * H → 1 ⇒ persistent trends.
    */
  def tsHurstExponent(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // day index by posexplode of the sorted collected series — the
    // window-free ranking shape (plan pin: no unpartitioned Window)
    val daily = orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(sum((money($"o_totalprice") * 100).cast(LongType)).as("c"))
      .agg(array_sort(collect_list(struct($"d", $"c"))).as("s"))
      .select(posexplode(expr("transform(s, x -> x.c)"))
        .as(Seq("i", "c")))
    val sizes = Seq(64L, 128L, 256L, 512L).toDF("m")
    val bw = Window.partitionBy($"m", $"b")
    val cells = daily.crossJoin(broadcast(sizes))
      .withColumn("b", expr("i div m"))
      .withColumn("j", row_number().over(bw.orderBy($"i")))
      .withColumn("cum", sum($"c").over(
        bw.orderBy($"i").rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("cnt", count(lit(1)).over(bw))
      .withColumn("t", sum($"c").over(bw))
      .withColumn("ssq", sum(($"c".cast(DecimalType(38, 0)) * $"c")
        .cast(DecimalType(38, 0))).over(bw))
      .filter($"cnt" === $"m")
      .withColumn("e", $"m" * $"cum" - $"j" * $"t")
    val blocks = cells.groupBy($"m", $"b")
      .agg((max($"e") - min($"e")).as("rnum"),
        (max($"ssq") * max($"m").cast(DecimalType(38, 0)) -
          max($"t").cast(DecimalType(38, 0)) *
          max($"t")).cast(DecimalType(38, 0)).as("s2"))
      .select($"m", $"b",
        round($"rnum".cast(DoubleType) / sqrt($"s2".cast(DoubleType)), 9)
          .cast(DecimalType(22, 9)).as("rs9"))
    val perSize = blocks.groupBy($"m")
      .agg(count(lit(1)).as("n_blocks"), sum($"rs9").as("srs"))
      .withColumn("avg_rs",
        $"srs".cast(DoubleType) / $"n_blocks".cast(DoubleType))
      .withColumn("y", round(log2($"avg_rs"), 9).cast(DecimalType(22, 9)))
      .withColumn("x", log2($"m".cast(DoubleType)).cast(LongType))
    val slope = perSize.agg(count(lit(1)).as("kk"),
        sum($"x").as("sx"), sum($"x" * $"x").as("sxx"),
        sum($"y").as("sy"), sum($"y" * $"x").as("sxy"))
      .select(round(
        ($"kk" * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
          ($"kk" * $"sxx" - $"sx" * $"sx").cast(DoubleType), 6)
        .as("hurst"))
    perSize.crossJoin(broadcast(slope))
      .select($"m".as("block_size"), $"n_blocks",
        round($"avg_rs", 6).as("avg_rs"), $"hurst")
      .orderBy($"block_size")
  }

  /** Burrows' Delta between every source pair: z-scores of the 20
    * globally most frequent tokens' relative frequencies (frequencies
    * frozen at 9 dp, so the per-token mean/spread terms are exact
    * decimal algebra and z = (f·k − Σf)·√k/√Σ(f·k − Σf)² is one
    * mirrored double formula), then Δ = mean |z_a − z_b| with the
    * per-token |Δz| refrozen at 9 dp before the pair sum. The
    * canonical authorship-attribution distance, shuffle-safe by
    * construction.
    */
  def textBurrowsDelta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, sfDir)
      .select($"source", explode(expr(
        "regexp_extract_all(text, '[a-z0-9]+', 0)")).as("tok"))
    val topTok = toks.groupBy($"tok").agg(count(lit(1)).as("gc"))
      .orderBy($"gc".desc, $"tok").limit(20).select($"tok")
    val totals = toks.groupBy($"source").agg(count(lit(1)).as("ns"))
    val counts = toks.join(broadcast(topTok), "tok")
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
    // dense (source × top-token) grid: absent counts are real zeros
    val grid = totals.crossJoin(broadcast(topTok))
      .join(counts, Seq("source", "tok"), "left")
      .select($"source", $"tok", $"ns",
        coalesce($"c", lit(0L)).as("c"))
      // narrow precisions keep every decimal product under 38 digits
      // on BOTH engines — Spark would otherwise silently re-scale
      // (allowPrecisionLoss) where DuckDB stays exact
      .withColumn("f", round($"c".cast(DoubleType) / $"ns", 9)
        .cast(DecimalType(12, 9)))
    val kSrc = grid.select($"source").distinct().count()
    val tw = Window.partitionBy($"tok")
    val z = grid
      .withColumn("sumf", sum($"f").over(tw))
      .withColumn("dev", ($"f" * lit(kSrc).cast(DecimalType(3, 0)) -
        $"sumf").cast(DecimalType(18, 9)))
      .withColumn("ssq", sum(($"dev" * $"dev").cast(DecimalType(38, 18)))
        .over(tw))
      .withColumn("z", round($"dev".cast(DoubleType) *
        sqrt(lit(kSrc.toDouble)) / sqrt($"ssq".cast(DoubleType)), 9)
        .cast(DecimalType(22, 9)))
      .select($"source", $"tok", $"z")
    z.as("a").join(z.as("b"),
        col("a.tok") === col("b.tok") &&
        col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(abs((col("a.z") - col("b.z")).cast(DecimalType(24, 9))))
          .as("sad"))
      .select($"source_a", $"source_b", $"n_tokens",
        round($"sad".cast(DoubleType) / $"n_tokens", 6).as("delta"))
      .orderBy($"source_a", $"source_b")
  }
}
