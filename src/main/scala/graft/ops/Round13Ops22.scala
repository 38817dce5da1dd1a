package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 22: Viterbi decoding score as a max-plus
  * fold, and the 4-4-5 fiscal calendar mapping.
  */
object Round13Ops22 {

  /** Viterbi best-path score of a 2-state regime HMM over each event
    * type's daily up/down sequence, in EXACT max-plus integer
    * arithmetic: emission +2 when the state matches the day's
    * direction (−1 otherwise), +1 to stay / −1 to switch. The
    * recurrence carries just (s_low, s_high) through one runtime
    * `aggregate` fold over the date-sorted direction array — the same
    * wavefront discipline as ts_dtw_distance, mirrored in the oracle
    * as a recursive CTE. The score gap to the trivial all-one-state
    * path quantifies how regime-switchy the series is.
    */
  def mlViterbiScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val nxt = daily.select($"event_type".as("e2"), $"d".as("d2"), $"c".as("c2"))
    val obs = daily.join(nxt,
        $"event_type" === $"e2" && $"d2" === date_add($"d", 1))
      .select($"event_type", $"d",
        when($"c2" > $"c", 1L).otherwise(0L).as("o"))
    val arr = obs.groupBy($"event_type")
      .agg(array_sort(collect_list(struct($"d", $"o"))).as("s"))
      .select($"event_type", size($"s").as("n_obs"),
        expr("transform(s, x -> x.o)").as("obs"))
    val vit = expr("""
      aggregate(obs,
        named_struct('s0', CAST(0 AS BIGINT), 's1', CAST(0 AS BIGINT)),
        (st, o) -> named_struct(
          's0', (CASE WHEN o = 0 THEN 2 ELSE -1 END) +
            greatest(st.s0 + 1, st.s1 - 1),
          's1', (CASE WHEN o = 1 THEN 2 ELSE -1 END) +
            greatest(st.s1 + 1, st.s0 - 1)),
        st -> greatest(st.s0, st.s1))""")
    // trivial baseline: stay in one state the whole time — the better
    // of all-low / all-high under the SAME convention as the fold
    // (every step, including the first, carries a stay/switch term,
    // so a one-state path banks n stay bonuses)
    val nUp = expr("aggregate(obs, CAST(0 AS BIGINT), (a, o) -> a + o)")
    arr.select($"event_type", $"n_obs", vit.as("viterbi_score"),
        nUp.as("n_up_days"))
      .withColumn("baseline_score",
        greatest($"n_up_days", $"n_obs" - $"n_up_days") * 2 +
          ($"n_obs" - greatest($"n_up_days", $"n_obs" - $"n_up_days")) *
            lit(-1L) + $"n_obs")
      .select($"event_type", $"n_obs", $"n_up_days", $"viterbi_score",
        $"baseline_score",
        ($"viterbi_score" - $"baseline_score").as("regime_gain"))
      .orderBy($"event_type")
  }

  /** The 4-4-5 fiscal calendar: 52-week years anchored at 1995-02-01,
    * quarters of 13 weeks split 4-4-5 — the retail calendar that
    * makes weeks comparable across years. Every field is pure integer
    * date arithmetic (no locale, no month lengths), so the rollup of
    * order value by (fiscal year, quarter, period) is exact in both
    * engines.
    */
  def fnFiscal445(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select((money($"o_totalprice") * 100).cast(LongType).as("cents"),
        datediff($"o_orderdate".cast(DateType), to_date(lit("1995-02-01")))
          .as("days"))
      .filter($"days" >= 0)
      .select($"cents",
        expr("days div 364").as("fy_off"),
        expr("(days % 364) div 7").as("wy"))
      .select($"cents", (lit(1995) + $"fy_off").as("fiscal_year"),
        (expr("wy div 13") + 1).as("fiscal_quarter"),
        expr("CASE WHEN wy % 13 < 4 THEN 1 WHEN wy % 13 < 8 THEN 2 " +
          "ELSE 3 END").as("period_in_quarter"))
      .groupBy($"fiscal_year", $"fiscal_quarter", $"period_in_quarter")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("sum_cents"))
      .orderBy($"fiscal_year", $"fiscal_quarter", $"period_in_quarter")
  }
}
