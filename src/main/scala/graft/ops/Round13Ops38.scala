package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 38: deterministic hash-bootstrap
  * confidence intervals and interaction information gain.
  */
object Round13Ops38 {

  /** Bootstrap CI on mean order value with HASH resampling: replicate
    * b draws row k with multiplicity decided by the first hex digit
    * of md5(k_b) — a 6/6/3/1 split over {0,1,2,3} approximating
    * Poisson(1) — so the "random" resample is a pure function of the
    * data and is identical on every engine and every rerun (the only
    * sound way to bootstrap inside a differential-tested pipeline).
    * Replicate means are frozen at 6 dp; the CI bounds are exact
    * order statistics (2nd and 49th of 50), not interpolated
    * percentiles. One scan fans out to 50 replicates map-side; the
    * shuffle carries 50 partial-sum rows.
    */
  def mlBootstrapCiHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = orders(spark, sfDir)
      .filter($"o_orderkey" < 5000)
      .select($"o_orderkey".as("k"),
        (money($"o_totalprice") * 100).cast(LongType).as("v"))
      .withColumn("b", explode(expr("sequence(1, 50)")))
      .withColumn("h", substring(
        md5(concat($"k".cast(StringType), lit("_"),
          $"b".cast(StringType))), 1, 1))
      .withColumn("w", when($"h" <= "5", 0L)
        .when($"h" <= "b", 1L).when($"h" <= "e", 2L).otherwise(3L))
    val reps = cells.groupBy($"b")
      .agg(sum($"w").as("sw"), sum($"w" * $"v").as("swc"))
      .select($"b", round($"swc".cast(DoubleType) / $"sw", 6)
        .cast(DecimalType(24, 6)).as("m"))
    // order statistics of the 50 replicate means via a sorted collect
    // (50 rows — no global ranking Window needed or allowed)
    val ranked = reps
      .agg(array_sort(collect_list(struct($"m", $"b"))).as("a"),
        count(lit(1)).as("n_reps"), sum($"m").as("sm"))
    val bounds = ranked.select($"n_reps", $"sm",
      expr("element_at(a, 2).m").as("lo"),
      expr("element_at(a, 49).m").as("hi"))
    bounds.select($"n_reps",
      round($"sm".cast(DoubleType) / $"n_reps", 6).as("mean_of_means"),
      round($"lo".cast(DoubleType), 6).as("ci_low"),
      round($"hi".cast(DoubleType), 6).as("ci_high"))
  }

  /** Interaction information of two features w.r.t. order status:
    * gains IG(A)=H(L)−H(L|A), IG(B), IG(A,B), and the synergy
    * IG(A,B)−IG(A)−IG(B) — positive means the features predict the
    * label jointly beyond their individual contributions (the signal
    * a pairwise feature-selection pass misses). Every entropy is a
    * sum of 9dp-frozen decimal terms over exact integer contingency
    * cells; cells number ≤ 45, so this is three tiny aggregates no
    * matter the corpus size.
    */
  def mlInteractionInfoGain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = orders(spark, sfDir).select(
      substring($"o_orderpriority", 1, 1).as("a"),
      ($"o_custkey" % 3).cast(StringType).as("bb"),
      $"o_orderstatus".as("l"))

    // conditional entropy H(L | keys): Σ_cells −(n_cell/N)·log2(n_cell/n_group)
    def condEntropy(keys: Seq[Column], label: Boolean): DataFrame = {
      val gcols = if (label) keys :+ $"l" else keys
      val cellCols = if (keys.isEmpty && label) Seq($"l") else gcols
      val cells = base.groupBy(cellCols: _*).agg(count(lit(1)).as("nc"))
      // for the unconditional entropy the "group" is everything: use
      // the corpus total via a broadcast cross join, not a Window on
      // a constant key (the optimizer folds that into an unpartitioned
      // Window, which the plan pin bans)
      val grouped = if (keys.isEmpty)
        cells.crossJoin(broadcast(
          base.agg(count(lit(1)).as("ng"))))
      else cells.withColumn("ng", sum($"nc").over(
        org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)))
      grouped
        .crossJoin(broadcast(base.agg(count(lit(1)).as("n"))))
        .select(round(-($"nc".cast(DoubleType) / $"n") *
          log2($"nc".cast(DoubleType) / $"ng"), 9)
          .cast(DecimalType(20, 9)).as("tm"))
        .agg(sum($"tm").as("s"))
        .select($"s".cast(DoubleType).as("h"))
    }
    val hl  = condEntropy(Seq.empty, label = true).select($"h".as("hl"))
    val ha  = condEntropy(Seq($"a"), label = true).select($"h".as("hla"))
    val hb  = condEntropy(Seq($"bb"), label = true).select($"h".as("hlb"))
    val hab = condEntropy(Seq($"a", $"bb"), label = true)
      .select($"h".as("hlab"))
    hl.crossJoin(ha).crossJoin(hb).crossJoin(hab)
      .select(round($"hl", 6).as("h_label"),
        round($"hl" - $"hla", 6).as("ig_a"),
        round($"hl" - $"hlb", 6).as("ig_b"),
        round($"hl" - $"hlab", 6).as("ig_ab"),
        round(($"hl" - $"hlab") - ($"hl" - $"hla") - ($"hl" - $"hlb"), 6)
          .as("synergy"))
  }
}
