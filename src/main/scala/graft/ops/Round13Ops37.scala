package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 37: paired-classifier and paired-rank
  * tests — McNemar's χ² and Kendall's τ-b — both reduced to exact
  * integer pair counts with a single mirrored double at the end.
  */
object Round13Ops37 {

  /** McNemar's test on two fixed stump classifiers of order status
    * (h_date: month ≤ 6 ⇒ 'F'; h_price: totalprice > 150k ⇒ 'F'):
    * only the DISCORDANT cells matter — b = date-right/price-wrong,
    * c = date-wrong/price-right — and χ² = (b−c)²/(b+c) with the
    * continuity-corrected variant alongside. One scan, one 4-cell
    * aggregate; the canonical way to compare two models evaluated on
    * the same rows without assuming independence.
    */
  def mlMcnemarTest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = orders(spark, sfDir)
      .filter($"o_orderkey" < 2000)
      .select(($"o_orderstatus" === "F").as("y"),
        (month($"o_orderdate") <= 6).as("pa"),
        (money($"o_totalprice") > 150000).as("pb"))
      .select(($"pa" === $"y").as("ra"), ($"pb" === $"y").as("rb"))
    val c = t.agg(count(lit(1)).as("n"),
      sum(when($"ra" && !$"rb", 1L).otherwise(0L)).as("b"),
      sum(when(!$"ra" && $"rb", 1L).otherwise(0L)).as("c"))
    c.select($"n", $"b".as("a_only_right"), $"c".as("b_only_right"),
      round((($"b" - $"c") * ($"b" - $"c")).cast(DoubleType) /
        ($"b" + $"c").cast(DoubleType), 6).as("chi2"),
      round(((abs($"b" - $"c") - 1) * (abs($"b" - $"c") - 1))
        .cast(DoubleType) / ($"b" + $"c").cast(DoubleType), 6)
        .as("chi2_cc"))
  }

  /** Kendall's τ-b between order value and priority rank on a fixed
    * 300-key slice: all 44 850 unordered pairs classified by the two
    * sign products — concordant, discordant, or tied in either
    * margin — as exact integers; τ-b's tie-corrected denominator
    * √((n₀−n₁)(n₀−n₂)) is the only double. The tie-robust companion
    * to ml_spearman_rho for ordinal-vs-continuous association.
    */
  def analyticKendallTau(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = orders(spark, sfDir)
      .filter($"o_orderkey" < 300)
      .select($"o_orderkey".as("k"),
        (money($"o_totalprice") * 100).cast(LongType).as("x"),
        substring($"o_orderpriority", 1, 1).cast(LongType).as("y"))
    val p = t.as("a").join(t.as("b"), col("a.k") < col("b.k"))
      .select(signum((col("a.x") - col("b.x")).cast(DoubleType))
        .cast(LongType).as("sx"),
        signum((col("a.y") - col("b.y")).cast(DoubleType))
          .cast(LongType).as("sy"))
    val c = p.agg(count(lit(1)).as("n0"),
      sum(when($"sx" * $"sy" > 0, 1L).otherwise(0L)).as("cc"),
      sum(when($"sx" * $"sy" < 0, 1L).otherwise(0L)).as("dd"),
      sum(when($"sx" === 0, 1L).otherwise(0L)).as("n1"),
      sum(when($"sy" === 0, 1L).otherwise(0L)).as("n2"))
    c.select($"n0".as("n_pairs"), $"cc".as("concordant"),
      $"dd".as("discordant"), $"n1".as("ties_x"), $"n2".as("ties_y"),
      round(($"cc" - $"dd").cast(DoubleType) /
        sqrt((($"n0" - $"n1") * ($"n0" - $"n2")).cast(DoubleType)), 6)
        .as("tau_b"))
  }
}
