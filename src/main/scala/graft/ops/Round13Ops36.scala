package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 36: ordinal-pattern entropy, classical
  * one-way ANOVA, and Borda-count rank fusion over two ANN metrics.
  */
object Round13Ops36 {

  /** Permutation entropy (order 3) of daily revenue: each consecutive
    * triple is classified by its ordinal pattern — three exact-cents
    * comparisons packed into a code, so the symbolization never
    * touches a float — and the pattern distribution's entropy is
    * summed over 9dp-frozen decimal terms. Low H/log₂6 means the
    * series' local shapes repeat (trend/seasonality); ≈1 means
    * noise-like. One global lead-window (calendar-bounded) + one
    * 6-row aggregate.
    */
  def tsPermutationEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // triples as array neighbors over the collected calendar series —
    // no unpartitioned lead() windows (plan pin)
    val codes = orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(sum((money($"o_totalprice") * 100).cast(LongType)).as("c"))
      .agg(array_sort(collect_list(struct($"d", $"c"))).as("s"))
      .select(expr("transform(s, x -> x.c)").as("cs"))
      .select(explode(expr("""transform(
        sequence(1, CAST(size(cs) - 2 AS INT)), i ->
          CAST(IF(element_at(cs, i) < element_at(cs, i + 1), 4, 0) +
               IF(element_at(cs, i + 1) < element_at(cs, i + 2), 2, 0) +
               IF(element_at(cs, i) < element_at(cs, i + 2), 1, 0)
            AS BIGINT))""")).as("code"))
    val cnts = codes.groupBy($"code").agg(count(lit(1)).as("cnt"))
    val tot = cnts.agg(sum($"cnt").as("n"))
    val withTerm = cnts.crossJoin(broadcast(tot))
      .withColumn("freq", round($"cnt".cast(DoubleType) / $"n", 6))
      .withColumn("tm", round(-($"cnt".cast(DoubleType) / $"n") *
        log2($"cnt".cast(DoubleType) / $"n"), 9).cast(DecimalType(20, 9)))
    val h = withTerm.agg(sum($"tm").as("sh"))
      .select(round($"sh".cast(DoubleType), 6).as("entropy_bits"),
        round($"sh".cast(DoubleType) / log2(lit(6.0)), 6)
          .as("norm_entropy"))
    withTerm.crossJoin(broadcast(h))
      .select($"code", $"cnt", $"freq", $"entropy_bits", $"norm_entropy")
      .orderBy($"code")
  }

  /** One-way ANOVA of order value across the five priority classes:
    * per-group Σx and Σx² stay exact (BIGINT cents / DECIMAL(38,0)
    * squares — long·long would overflow silently at sf≥0.1), the
    * per-group s²/n terms are frozen at 6dp decimals before the
    * cross-group sum, and only the final F and η² are mirrored double
    * formulas. The parametric sibling of analytic_kruskal_wallis.
    */
  def analyticAnovaF(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = orders(spark, sfDir)
      .select($"o_orderpriority".as("g"),
        (money($"o_totalprice") * 100).cast(LongType).as("v"))
    val per = x.groupBy($"g")
      .agg(count(lit(1)).as("ng"), sum($"v").as("sg"),
        sum(($"v".cast(DecimalType(38, 0)) * $"v")
          .cast(DecimalType(38, 0))).as("qg"))
      .withColumn("tg", round(($"sg".cast(DoubleType) *
        $"sg".cast(DoubleType)) / $"ng".cast(DoubleType), 6)
        .cast(DecimalType(38, 6)))
    val tot = per.agg(count(lit(1)).as("k"), sum($"ng").as("n"),
      sum($"sg").as("s"), sum($"qg").as("q"), sum($"tg").as("st"))
    val ssb = tot.select($"k", $"n",
      ($"st".cast(DoubleType) -
        ($"s".cast(DoubleType) * $"s".cast(DoubleType)) /
          $"n".cast(DoubleType)).as("ssb"),
      ($"q".cast(DoubleType) - $"st".cast(DoubleType)).as("ssw"))
    ssb.select($"k".as("k_groups"), $"n".as("n_total"),
      round(($"ssb" / ($"k" - 1).cast(DoubleType)) /
        ($"ssw" / ($"n" - $"k").cast(DoubleType)), 6).as("f_stat"),
      round($"ssb" / ($"ssb" + $"ssw"), 6).as("eta_sq"))
  }

  /** Borda-count fusion of two retrieval lists for probe vec 0: the
    * cosine top-20 and the euclidean top-20 (distance expanded as
    * ⟨a,a⟩−2⟨a,p⟩+⟨p,p⟩ — one mirrored fold per row, no row² blowup),
    * each candidate scoring 21−rank per list it appears in. Rank
    * fusion is how hybrid retrieval merges heterogeneous scorers
    * without calibrating their scales; ties everywhere break on
    * vec_id so the fused list is deterministic.
    */
  def simBordaFusion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val t = embeddings(spark, sfDir)
    val probe = t.filter($"vec_id" === 0)
      .select($"embedding".as("pe"))
    val scored = t.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .select($"vec_id",
        (expr("graft_dot(embedding, pe)") /
          (sqrt(expr("graft_dot(embedding, embedding)")) *
            sqrt(expr("graft_dot(pe, pe)")))).as("cos"),
        (expr("graft_dot(embedding, embedding)") -
          lit(2.0) * expr("graft_dot(embedding, pe)") +
          expr("graft_dot(pe, pe)")).as("dist2"))
    // top-20 via TakeOrderedAndProject (orderBy+limit), ranks assigned
    // by posexplode over the 20-row sorted collect — no global Window
    def top20(df: DataFrame, key: org.apache.spark.sql.Column,
        asc: Boolean, outCol: String): DataFrame = {
      val lim = (if (asc) df.orderBy(key.asc, col("vec_id"))
        else df.orderBy(key.desc, col("vec_id"))).limit(20)
      val sortKey = if (asc) key else key * -1.0
      lim.select(col("vec_id"), sortKey.as("sk"))
        .agg(array_sort(collect_list(struct(col("sk"), col("vec_id"))))
          .as("a"))
        .select(posexplode($"a").as(Seq("p", "x")))
        .select($"x.vec_id".as("vec_id"), (lit(20L) - $"p").as(outCol))
    }
    val byCos = top20(scored, $"cos", asc = false, "pc")
    val byEuc = top20(scored, $"dist2", asc = true, "pe2")
    byCos.join(byEuc, Seq("vec_id"), "full_outer")
      .select($"vec_id",
        (coalesce($"pc", lit(0L)) + coalesce($"pe2", lit(0L)))
          .as("borda_score"),
        coalesce($"pc", lit(0L)).as("cosine_points"),
        coalesce($"pe2", lit(0L)).as("euclid_points"))
      .orderBy($"borda_score".desc, $"vec_id")
      .limit(10)
  }
}
