package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 52: Gini decomposition and Tukey's
  * five-number robust summary — both on exact order statistics.
  */
object Round13Ops52 {

  /** Global ascending rank (ties broken by key) via the bucket-offset
    * distributed-selection shape: value-range buckets count in
    * parallel, each row's rank = rows in lower buckets + bucket-local
    * rank. No unpartitioned ranking Window (plan pin).
    */
  private def globalAscRank(df: DataFrame): DataFrame = {
    val b = df.withColumn("bkt", expr("c div 1048576"))
    val bc = b.groupBy(col("bkt")).agg(count(lit(1)).as("bn"))
    val off = bc.as("a").join(bc.as("b"),
        col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"))
      .agg(coalesce(sum(col("b.bn")), lit(0L)).as("n_before"))
    b.join(broadcast(off), "bkt")
      .withColumn("i", col("n_before") + row_number().over(
        Window.partitionBy(col("bkt")).orderBy(col("c"), col("k"))))
      .drop("bkt", "n_before")
  }

  /** Gini decomposition across priority classes: total inequality
    * splits into between-group (pairwise |μ_g−μ_h| masses, kept as
    * the exact integer cross-products |S_g·n_h − S_h·n_g|),
    * within-group (population- and income-weighted per-group Ginis
    * via the sorted-index formula Σ(2i−n−1)x_i) and the stratification
    * overlap residual. Every numerator is an exact integer or
    * DECIMAL(38,0); the three ratios are the only doubles — the
    * inequality-accounting readout pareto/Lorenz reporting feeds.
    */
  def analyticGiniDecomposition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, sfDir)
      .select(substring($"o_orderpriority", 1, 1).as("g"),
        (money($"o_totalprice") * 100).cast(LongType).as("c"),
        $"o_orderkey".as("k"))
    // per-group Gini numerators: sort within group, Σ(2i−n_g−1)·c
    val ranked = o.withColumn("i", row_number().over(
      Window.partitionBy($"g").orderBy($"c", $"k")))
    val per = ranked.groupBy($"g")
      .agg(count(lit(1)).as("ng"), sum($"c").as("sg"),
        sum((($"i" * 2).cast(DecimalType(38, 0)) * $"c"))
          .as("iw2"))
      .withColumn("gnum", ($"iw2" -
        (($"ng" + 1).cast(DecimalType(38, 0)) * $"sg"))
        .cast(DecimalType(38, 0)))
    val tot = per.agg(sum($"ng").as("n"), sum($"sg").as("t"))
    // total Gini from a global ranking (bucket-offset shape)
    val g0 = globalAscRank(o)
      .crossJoin(broadcast(tot))
      .agg(sum((($"i" * 2).cast(DecimalType(38, 0)) * $"c")).as("iw2"),
        max($"n").as("n"), max($"t").as("t"))
      .select((($"iw2" - (($"n" + 1).cast(DecimalType(38, 0)) * $"t"))
        .cast(DoubleType) /
        ($"n".cast(DoubleType) * $"t".cast(DoubleType))).as("gini"),
        $"n", $"t")
    // between: Σ pairs |S_g n_h − S_h n_g| over 2 n T
    val pairs = per.as("a").join(per.as("b"),
        col("a.g") < col("b.g"))
      .select(abs(col("a.sg") * col("b.ng") -
        col("b.sg") * col("a.ng")).as("d"))
      .agg(sum($"d".cast(DecimalType(38, 0))).as("bnum"))
    // within: Σ_g (n_g/n)(S_g/T)·G_g = Σ_g gnum_g/(n·T)  [since
    // G_g = gnum/(n_g·S_g), the weights cancel]
    val wnum = per.agg(sum($"gnum").as("wnum"))
    g0.crossJoin(broadcast(pairs)).crossJoin(broadcast(wnum))
      .select(round($"gini", 6).as("gini_total"),
        round($"bnum".cast(DoubleType) /
          ($"n".cast(DoubleType) * $"t".cast(DoubleType)), 6)
          .as("gini_between"),
        round($"wnum".cast(DoubleType) /
          ($"n".cast(DoubleType) * $"t".cast(DoubleType)), 6)
          .as("gini_within"),
        round($"gini" -
          $"bnum".cast(DoubleType) /
            ($"n".cast(DoubleType) * $"t".cast(DoubleType)) -
          $"wnum".cast(DoubleType) /
            ($"n".cast(DoubleType) * $"t".cast(DoubleType)), 6)
          .as("overlap_residual"))
  }

  /** Tukey's robust summary of order value: exact type-1 order
    * statistics for Q1/median/Q3 (rank = ceil(p·n), no
    * interpolation), midhinge and trimean emitted in half-cents so
    * they stay integers, plus the IQR fence count — the outlier
    * screen that never needs a float until nothing is left to
    * compare.
    */
  def aggTukeySummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = globalAscRank(orders(spark, sfDir)
      .select((money($"o_totalprice") * 100).cast(LongType).as("c"),
        $"o_orderkey".as("k")))
    val n = o.agg(count(lit(1)).as("n"))
    val q = o.crossJoin(broadcast(n))
      .agg(max($"n").as("n"),
        sum(when($"i" === expr("(n + 3) div 4"), $"c")).as("q1"),
        sum(when($"i" === expr("(n + 1) div 2"), $"c")).as("q2"),
        sum(when($"i" === expr("(3 * n + 3) div 4"), $"c")).as("q3"))
    val fenced = o.crossJoin(broadcast(q.select($"q1".as("f1"),
        $"q3".as("f3"))))
      .agg(sum(when($"c" * 2 > $"f3" * 5 - $"f1" * 3, 1L)
        .otherwise(0L)).as("n_high_outliers"))
    q.crossJoin(broadcast(fenced))
      .select($"n", $"q1".as("q1_cents"), $"q2".as("median_cents"),
        $"q3".as("q3_cents"),
        ($"q1" + $"q3").as("midhinge_x2_cents"),
        ($"q1" + $"q2" * 2 + $"q3").as("trimean_x4_cents"),
        ($"q3" - $"q1").as("iqr_cents"), $"n_high_outliers")
  }
}
