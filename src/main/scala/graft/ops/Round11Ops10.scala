package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 10: Bollinger-band breakouts, weekly
  * DAU/WAU stickiness, log-log price elasticity, weight-of-evidence /
  * information value, AES encrypt-decrypt roundtrip, and
  * inter-arrival-time statistics.
  */
object Round11Ops10 {

  /** Bollinger-band breakout census: daily revenue vs a trailing
    * 20-day SMA ± 2σ band, per event type. The breakout predicate
    * never divides and never takes a square root — |c−μ| > 2σ over a
    * 20-row frame is equivalent to (20c−s)² > 4·(20·ss−s²) in exact
    * integer cents (s = Σc, ss = Σc² over the frame) — so the flags
    * are bit-identical on any engine. Sums ride DECIMAL(38,0): at
    * 100 TB a daily-revenue cell can reach ~1e12 cents, whose square
    * (1e24) overflows BIGINT but sits comfortably in 38 digits.
    * Daily rollup first bounds the windowed series to |days|·|types|.
    */
  def tsBollingerBands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg((sum(money($"value")) * 100).cast(DecimalType(38, 0)).as("c"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(-19, 0)
    val f = daily
      .withColumn("s", sum($"c").over(w))
      .withColumn("ss", sum(($"c" * $"c").cast(DecimalType(38, 0))).over(w))
      .withColumn("nf", count(lit(1)).over(w))
      .filter($"nf" === 20)
      .withColumn("dev", ($"c" * 20 - $"s").cast(DecimalType(38, 0)))
      .withColumn("brk",
        ($"dev" * $"dev").cast(DecimalType(38, 0)) >
          (($"ss" * 20 - $"s" * $"s") * 4).cast(DecimalType(38, 0)))
    f.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum(when($"brk" && $"dev" > 0, 1L).otherwise(0L)).as("n_break_up"),
        sum(when($"brk" && $"dev" < 0, 1L).otherwise(0L)).as("n_break_down"))
      .orderBy($"event_type")
  }

  /** Weekly stickiness (avg DAU / WAU) per event type — the product
    * health-metric. One distinct pass builds the (type, day, user)
    * activity set; everything after runs on the tiny week rollup.
    * `Σ daily-distinct / (n_days · WAU)` is a single double division
    * of exact BIGINT counts, so the 6-dp value is order-free.
    * Monday-aligned `date_trunc('week', …)` matches DuckDB exactly.
    */
  def analyticStickiness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val active = events(spark, sfDir)
      .select($"event_type", to_date($"ts").as("d"), $"user_id")
      .distinct()
    active
      .withColumn("week_start", date_trunc("week", $"d").cast(DateType))
      .groupBy($"event_type", $"week_start")
      .agg(count(lit(1)).as("dau_sum"),
        countDistinct($"d").as("n_days"),
        countDistinct($"user_id").as("wau"))
      .withColumn("stickiness",
        round($"dau_sum".cast(DoubleType) /
          ($"n_days" * $"wau").cast(DoubleType), 6))
      .orderBy($"event_type", $"week_start")
  }

  /** Log-log price elasticity of demand per part type:
    * slope of ln(quantity) on ln(retail price) via the closed-form
    * normal equation. Each row's two logarithms are rounded to the
    * 9-dp lane and scaled to exact integer nano-units, so all four
    * moment sums (Σx, Σy, Σxy, Σx²) accumulate order-free in
    * DECIMAL(38,0); only the final slope division runs in floating
    * point. lineitem⋈part stays a shuffle join — part scales with the
    * corpus (≈1/7 of lineitem) and must never be broadcast.
    */
  def analyticPriceElasticity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def nano(c: Column): Column =
      (round(log(c), 9).cast(DecimalType(28, 9)) * lit(1000000000L))
        .cast(DecimalType(38, 0))
    val j = lineitem(spark, sfDir)
      .select($"l_partkey", money($"l_quantity").cast(DoubleType).as("qty"))
      .join(part(spark, sfDir).select($"p_partkey", $"p_type",
        money($"p_retailprice").cast(DoubleType).as("price")),
        $"l_partkey" === $"p_partkey")
      .select($"p_type", nano(col("price")).as("x"), nano(col("qty")).as("y"))
    j.groupBy($"p_type")
      .agg(count(lit(1)).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"y").cast(DecimalType(38, 0))).as("sxy"),
        sum(($"x" * $"x").cast(DecimalType(38, 0))).as("sxx"))
      .select($"p_type", $"n",
        round(($"n".cast(DoubleType) * $"sxy".cast(DoubleType) -
            $"sx".cast(DoubleType) * $"sy".cast(DoubleType)) /
          ($"n".cast(DoubleType) * $"sxx".cast(DoubleType) -
            $"sx".cast(DoubleType) * $"sx".cast(DoubleType)), 6)
          .as("elasticity"))
      .orderBy($"p_type")
  }

  /** Weight of evidence + information value of market segment for
    * predicting order fallthrough (status 'F') — the credit-scoring
    * feature audit. One shuffle join orders⋈customer, one hash
    * aggregate to a 5-row segment table; totals come from a second
    * aggregate over that tiny table (broadcast back), never a
    * driver-side collect. WOE = ln((pos·N)/(neg·P)) is one logarithm
    * of an exact-count ratio per segment; the IV term multiplies the
    * exact distribution gap by it — all scalar per-row math, no
    * order-dependent float accumulation anywhere.
    */
  def mlWoeIv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val seg = orders(spark, sfDir)
      .join(customer(spark, sfDir),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("pos"),
        sum(when($"o_orderstatus" =!= "F", 1L).otherwise(0L)).as("neg"))
    val tot = seg.agg(sum($"pos").as("tp"), sum($"neg").as("tn"))
    seg.join(broadcast(tot))
      .withColumn("woe",
        round(log(($"pos".cast(DoubleType) * $"tn".cast(DoubleType)) /
          ($"neg".cast(DoubleType) * $"tp".cast(DoubleType))), 6))
      .withColumn("iv_term",
        round(($"pos".cast(DoubleType) / $"tp".cast(DoubleType) -
          $"neg".cast(DoubleType) / $"tn".cast(DoubleType)) * $"woe", 6))
      .select($"c_mktsegment", $"pos", $"neg", $"woe", $"iv_term")
      .orderBy($"c_mktsegment")
  }

  /** AES ECB/PKCS encrypt→decrypt roundtrip over the document corpus:
    * the at-rest column-encryption path. The oracle sees only the
    * recovered plaintext plus the ciphertext length (PKCS pads to the
    * next 16-byte block, so the length is a pure function of the
    * plaintext length — the one ciphertext property an engine without
    * the cipher can still check). ECB mode keeps the bytes
    * deterministic; per-row scalar crypto stays inside whole-stage
    * codegen with no shuffle at all.
    */
  def fnAesRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val key = lit("0123456789abcdef")
    documents(spark, sfDir)
      .select($"doc_id",
        expr("CAST(text AS BINARY)").as("pt"))
      .select($"doc_id",
        aes_decrypt(aes_encrypt($"pt", key, lit("ECB"), lit("PKCS")),
          key, lit("ECB"), lit("PKCS")).cast(StringType).as("text_rt"),
        length(aes_encrypt($"pt", key, lit("ECB"), lit("PKCS")))
          .cast(LongType).as("cipher_bytes"))
      .orderBy($"doc_id")
  }

  /** Inter-arrival-time statistics: per-user event gaps in exact
    * epoch microseconds (lag over a user-partitioned window — never
    * an unpartitioned sort), rolled up by the arriving event's type:
    * count, min, max, floor-of-mean (pure integer division — at 100 TB
    * the mean lands where double ULP exceeds any decimal rounding
    * grain, so float protocols tie-break differently per engine) and
    * discrete p50/p90 (actual observed gaps, no interpolation —
    * engine-tie-safe with zero rounding protocol).
    */
  def tsInterarrival(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val gaps = events(spark, sfDir)
      .select($"user_id", $"event_id", $"event_type",
        unix_micros($"ts".cast(TimestampType)).as("us"))
      .withColumn("gap", $"us" - lag($"us", 1).over(w))
      .filter($"gap".isNotNull)
    gaps.createOrReplaceTempView("g11_gaps")
    spark.sql("""
      SELECT event_type,
        CAST(count(*) AS BIGINT) AS n_gaps,
        min(gap) AS min_us, max(gap) AS max_us,
        CAST(sum(gap) DIV count(*) AS BIGINT) AS mean_floor_us,
        CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
          AS p50_us,
        CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap) AS BIGINT)
          AS p90_us
      FROM g11_gaps GROUP BY event_type ORDER BY event_type
    """)
  }
}
