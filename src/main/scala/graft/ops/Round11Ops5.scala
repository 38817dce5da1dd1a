package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 5: rank statistics (Spearman, two-sample
  * Kolmogorov-Smirnov), a Benford first-digit fraud audit, per-user
  * max drawdown, Herfindahl-Hirschman market concentration, and
  * Yule's K vocabulary richness.
  *
  * Shared scale discipline for the two rank ops: ranks are NEVER
  * computed with a corpus-wide window. Both l_quantity and l_discount
  * (and 2-dp event values) have BOUNDED distinct-value domains, so
  * average ranks come from a distinct-value frequency table — corpus
  * rows reduce to ≤ a few thousand (value, count) pairs, the
  * cumulative counts run on that bounded table, and rows pick up
  * their rank via a broadcast join. The only corpus-sized passes are
  * hash aggregates.
  */
object Round11Ops5 {

  /** Twice-the-average-rank of each distinct value: 2·r̄(v) =
    * 2·(#below) + cnt + 1, exact in integers (the ×2 avoids the .5
    * from midrank ties). The triangular self-join runs on the BOUNDED
    * distinct-value table, so its cost is |V|² per group — a constant
    * w.r.t. corpus size.
    */
  private def midranks2(freq: DataFrame, grp: String, v: String): DataFrame =
    freq.as("f").join(freq.as("g"),
        col(s"f.$grp") === col(s"g.$grp") && col(s"g.$v") < col(s"f.$v"), "left")
      .groupBy(col(s"f.$grp").as(grp), col(s"f.$v").as(v),
        col("f.cnt").as("cnt"))
      .agg(coalesce(sum(col("g.cnt") * 2), lit(0L)).as("below2"))
      .select(col(grp), col(v), (col("below2") + col("cnt") + 1).as("r2"))

  /** Spearman rank correlation between quantity and discount per
    * return flag, with textbook midrank tie handling. ρ is Pearson on
    * the midranks; every sum (Σx, Σy, Σx², Σy², Σxy on 2·rank) is an
    * exact DECIMAL(38,0) integer — order-free and overflow-safe far
    * beyond 10¹² rows — so both engines reach the identical pair of
    * integers and the single double division + round(6) at the end is
    * deterministic. Corpus work: one hash aggregate to build each
    * frequency table and one to fold the sums; the rank tables ride
    * broadcast joins.
    */
  def mlSpearmanRho(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = lineitem(spark, sfDir).select($"l_returnflag".as("g"),
      money($"l_quantity").as("va"), money($"l_discount").as("vb"))
    def ranks(v: String) = midranks2(
      rows.groupBy($"g", col(v)).agg(count(lit(1)).as("cnt")), "g", v)
    val d38 = DecimalType(38, 0)
    val joined = rows
      .join(broadcast(ranks("va").withColumnRenamed("r2", "x")), Seq("g", "va"))
      .join(broadcast(ranks("vb").withColumnRenamed("r2", "y")), Seq("g", "vb"))
      .select($"g", $"x".cast(d38).as("x"), $"y".cast(d38).as("y"))
    joined.groupBy($"g".as("l_returnflag"))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
      .select($"l_returnflag", $"n".cast(LongType).as("n"),
        round(($"n" * $"sxy" - $"sx" * $"sy").cast(DoubleType) /
          (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast(DoubleType)) *
           sqrt(($"n" * $"syy" - $"sy" * $"sy").cast(DoubleType))), 6)
          .as("spearman_rho"))
      .orderBy($"l_returnflag")
  }

  /** Two-sample Kolmogorov-Smirnov distance between the click and
    * purchase event-value distributions. The ECDF difference is kept
    * in EXACT integer math — D·n₁·n₂ = |cum₁·n₂ − cum₂·n₁| — and the
    * cumulative counts use the repo's two-phase bucket pattern
    * (analytic_pareto_abc): an in-bucket running sum under a
    * PARTITIONED window over the bounded distinct-2-dp-value table,
    * plus lower-bucket offsets from a tiny triangular bucket join. No
    * unpartitioned window, nothing corpus-sized on one task; argmax
    * tie-break is the smallest value, so the answer is unique.
    */
  def mlKsTest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vals = events(spark, sfDir)
      .filter($"event_type".isin("click", "purchase"))
      .select(money($"value").as("v"),
        when($"event_type" === "click", 1L).otherwise(0L).as("a"),
        when($"event_type" === "purchase", 1L).otherwise(0L).as("b"))
    val perV = vals.groupBy($"v")
      .agg(sum($"a").as("ca"), sum($"b").as("cb"))
      .withColumn("bk", floor($"v".cast(DoubleType) / 16.0).cast(LongType))
    val w = Window.partitionBy($"bk").orderBy($"v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = perV
      .withColumn("ia", sum($"ca").over(w))
      .withColumn("ib", sum($"cb").over(w))
    val bTot = perV.groupBy($"bk")
      .agg(sum($"ca").as("ta"), sum($"cb").as("tb"))
    val offs = bTot.as("x").join(bTot.as("y"), $"y.bk" < $"x.bk", "left")
      .groupBy($"x.bk".as("bk"))
      .agg(coalesce(sum($"y.ta"), lit(0L)).as("oa"),
        coalesce(sum($"y.tb"), lit(0L)).as("ob"))
    val tot = vals.agg(sum($"a").as("na"), sum($"b").as("nb"))
    val ecdf = inBucket.join(broadcast(offs), "bk")
      .crossJoin(broadcast(tot))
      .select($"v", $"na", $"nb",
        abs(($"ia" + $"oa") * $"nb" - ($"ib" + $"ob") * $"na").as("ds"))
    val dmax = ecdf.agg(max($"ds").as("dsm"))
    ecdf.join(broadcast(dmax), $"ds" === $"dsm")
      .groupBy($"na", $"nb", $"ds")
      .agg(min($"v").as("ks_at"))
      .select($"na", $"nb", $"ks_at".cast(DoubleType).as("ks_at"),
        round($"ds".cast(DoubleType) /
          ($"na".cast(DoubleType) * $"nb".cast(DoubleType)), 6).as("d"))
  }

  /** Benford's-law first-digit audit of order totals — the classic
    * fabricated-amounts screen. The digit is taken from the DECIMAL's
    * canonical string form (exact; no float log10 near a power-of-ten
    * boundary), the expected share log₁₀(1+1/d) and the observed
    * share are each rounded at 6dp BEFORE the deviation subtraction,
    * so all three reported numbers are engine-identical. One hash
    * aggregate to 9 rows.
    */
  def analyticBenfordDigits(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val digits = orders(spark, sfDir)
      .filter(money($"o_totalprice") >= 1)
      .select(substring(money($"o_totalprice").cast(StringType), 1, 1)
        .cast(IntegerType).as("digit"))
    val tot = digits.agg(count(lit(1)).as("n"))
    digits.groupBy($"digit").agg(count(lit(1)).as("n_d"))
      .crossJoin(broadcast(tot))
      .select($"digit", $"n_d",
        round($"n_d".cast(DoubleType) / $"n", 6).as("share"),
        round(log10(lit(1.0) + lit(1.0) / $"digit"), 6).as("benford_share"))
      .withColumn("abs_dev", round(abs($"share" - $"benford_share"), 6))
      .orderBy($"digit")
  }

  /** Maximum drawdown of each user's cumulative NET value — purchases
    * credit, errors debit — the peak-to-trough risk statistic reused
    * as a trajectory anomaly screen (event values are all positive,
    * so the signed mix is what makes the series non-monotone). Running
    * sum and running max are PARTITIONED windows (per-user state only;
    * users are the natural shard key at any corpus size), all in exact
    * 2-dp DECIMAL; the drawdown subtraction stays in DECIMAL and only
    * the display cast touches doubles (2-dp decimals are float-exact).
    */
  def tsMaxDrawdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = events(spark, sfDir)
      .filter($"event_type".isin("purchase", "error"))
      .select($"user_id", $"ts", $"event_id",
        when($"event_type" === "purchase", money($"value"))
          .otherwise(-money($"value")).as("v"))
      .withColumn("cum", sum($"v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("peak", max($"cum").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    run.groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        max($"peak").cast(DoubleType).as("final_peak"),
        max($"peak" - $"cum").cast(DoubleType).as("max_drawdown"))
      .orderBy($"user_id")
  }

  /** Herfindahl-Hirschman supplier-concentration index per nation:
    * HHI = Σᵢ shareᵢ² over each supplier's revenue share of its
    * nation. Rewritten share-free as Σrevᵢ² / (Σrev)², computed in
    * integer CENTS on a DECIMAL(38,0) lane — the oracle uses HUGEINT
    * cents, and because the sums are the SAME integers on both
    * engines, the one double division per nation rounds identically
    * (a dollars-DECIMAL lane here vs a cents lane there would round
    * the >2⁵³ squares through different paths). Corpus work is a
    * single lineitem hash aggregate; supplier and nation are
    * broadcast dims, and the per-nation fold is on |suppliers| rows.
    * Also reports the top supplier's share — the CR1 concentration
    * ratio.
    */
  def analyticHerfindahl(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val srev = lineitem(spark, sfDir)
      .groupBy($"l_suppkey")
      .agg((sum(money($"l_extendedprice")) * 100).cast(DecimalType(38, 0))
        .as("rc"))
    val bySupp = srev
      .join(broadcast(supplier(spark, sfDir).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation(spark, sfDir).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
    bySupp.groupBy($"n_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum($"rc").as("tot"),
        sum($"rc" * $"rc").as("ssq"),
        max($"rc").as("top_rc"))
      .select($"n_name", $"n_suppliers",
        ($"tot".cast(DoubleType) / 100.0).as("total_revenue"),
        round($"ssq".cast(DoubleType) /
          ($"tot".cast(DoubleType) * $"tot".cast(DoubleType)), 6).as("hhi"),
        round($"top_rc".cast(DoubleType) / $"tot".cast(DoubleType), 6)
          .as("cr1"))
      .orderBy($"n_name")
  }

  /** Yule's K vocabulary-richness characteristic per language:
    * K = 10⁴·(Σₘ m²·Vₘ − N)/N², where Vₘ counts types of frequency m
    * and N is total tokens. Since Σ m²·Vₘ = Σ_term f(term)², the whole
    * statistic folds from the term-frequency table in exact BIGINT —
    * the ONLY float op is the final scaled division. Shapes: explode →
    * (lang, term) hash aggregate → per-lang fold; partial aggregation
    * makes the shuffle |vocab|-sized, not corpus-sized. Higher K =
    * more repetitive vocabulary, a practical LLM-corpus quality
    * signal (ties into [[LlmOps2.textQualityScore]]).
    */
  def textYuleK(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tf = documents(spark, sfDir)
      .select($"lang", explode(split($"text", " ")).as("term"))
      .groupBy($"lang", $"term").agg(count(lit(1)).as("f"))
    tf.groupBy($"lang")
      .agg(count(lit(1)).as("n_types"),
        sum($"f").as("n_tokens"),
        sum($"f" * $"f").as("m2"))
      .select($"lang", $"n_types", $"n_tokens",
        round(lit(10000.0) * ($"m2" - $"n_tokens").cast(DoubleType) /
          ($"n_tokens".cast(DoubleType) * $"n_tokens".cast(DoubleType)), 6)
          .as("yule_k"))
      .orderBy($"lang")
  }
}
