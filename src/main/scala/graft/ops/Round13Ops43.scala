package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 43: Wald's sequential probability ratio
  * test and exponential recency-decay scoring.
  */
object Round13Ops43 {

  /** Wald SPRT on the daily purchase share: H0 p=0.15 vs H1 p=0.25,
    * α=β=0.05. Each day contributes x·ln(p1/p0)+(n−x)·ln(q1/q0),
    * frozen at 9 dp so the cumulative log-likelihood walk is an exact
    * decimal window sum — the sequential test a metrics platform runs
    * DAILY to stop experiments early, here replayable bit-for-bit.
    * Decisions compare the walk against ±ln(19); 'continue' until a
    * boundary is crossed (the walk keeps accumulating after — each
    * day reports the test state as of that day).
    */
  def analyticSprtConversion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"ts".cast(DateType).as("d"))
      .agg(count(lit(1)).as("n"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("x"))
    val la = log(lit(0.25) / 0.15)
    val lb = log(lit(0.75) / 0.85)
    // the cumulative walk is an array fold in exact nano-units (the
    // 9dp-frozen term ×1e9 is an integer-valued double < 2^53, so the
    // BIGINT cast is lossless) — no unpartitioned cumulative Window
    val terms = daily.withColumn("tm9",
      // re-round after the 1e9 scale-up: the 9dp double is only the
      // NEAREST double, so ×1e9 can land at 99999999.9999… and a bare
      // truncating cast would lose an ulp
      round(round($"x".cast(DoubleType) * la +
        ($"n" - $"x").cast(DoubleType) * lb, 9) * 1e9, 0)
        .cast(LongType))
    val arr = terms
      .agg(array_sort(collect_list(struct($"d", $"n", $"x", $"tm9")))
        .as("s"))
      .withColumn("cums", expr("""aggregate(
        transform(s, t -> t.tm9), CAST(array() AS ARRAY<BIGINT>),
        (acc, v) -> concat(acc, array(
          IF(size(acc) = 0, CAST(0 AS BIGINT),
             element_at(acc, size(acc))) + v)))"""))
    arr.select(posexplode($"s").as(Seq("p", "t")), $"cums")
      .select($"t.d".as("d"), $"t.n".as("n"), $"t.x".as("x"),
        (expr("element_at(cums, p + 1)").cast(DoubleType) / 1e9)
          .as("llrd"))
      .select($"d", $"n", $"x", round($"llrd", 6).as("llr"),
        when($"llrd" >= log(lit(19.0)), "accept_h1")
          .when($"llrd" <= -log(lit(19.0)), "accept_h0")
          .otherwise("continue").as("decision"))
      .orderBy($"d")
  }

  /** Exponential recency-decay engagement score: each event is worth
    * value·2^(−age/7) (7-day half-life, expressed as exp(−age·ln2/7)
    * so both engines walk the same libm path), per-event terms frozen
    * at 6 dp, summed exactly per user. Top 20 users — the feature
    * powering "recently active big spenders" ranking, shuffle-safe
    * because no raw doubles ever cross an aggregation.
    */
  def analyticRecencyDecayScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, sfDir)
      .select($"user_id", $"ts".cast(DateType).as("d"),
        (money($"value") * 100).cast(LongType).as("v"))
    val mx = e.agg(max($"d").as("dmax"))
    val scored = e.crossJoin(broadcast(mx))
      .withColumn("age", datediff($"dmax", $"d"))
      .withColumn("tm", round($"v".cast(DoubleType) *
        exp((-($"age".cast(DoubleType) * log(lit(2.0)))) / 7.0), 6)
        .cast(DecimalType(28, 6)))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"), sum($"tm").as("s"))
    // top-20 via TakeOrderedAndProject, then rank by posexplode of the
    // 20-row sorted collect — no global ranking Window (plan pin)
    scored.orderBy($"s".desc, $"user_id").limit(20)
      .agg(array_sort(collect_list(struct(($"s" * -1).as("ns"),
        $"user_id", $"n_events", $"s"))).as("a"))
      .select(posexplode($"a").as(Seq("p", "x")))
      .select(($"p" + 1).cast(LongType).as("rank"),
        $"x.user_id".as("user_id"), $"x.n_events".as("n_events"),
        round($"x.s".cast(DoubleType), 2).as("decay_score_cents"))
      .orderBy($"rank")
  }
}
