package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 24: modularity, out-of-fold target
  * encoding, dedup cluster histogram, Theil index, markdown strip,
  * Mann-Kendall trend test.
  */
object Round11Ops24 {

  /** Modularity of the supplier-nation partition over the co-supply
    * graph — "do suppliers co-supply within their nation?" — computed
    * as SCALED INTEGERS: Q·4m² = Σ_c (4m·e_c − d_c²) needs only edge
    * counts and degree sums, so the only double is ONE final
    * division. Edge/degree aggregation is edge-linear; communities
    * are the bounded nation dim (broadcast).
    */
  def graphModularity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val und = Round10Ops4.thinnedGraph(spark, sfDir)
    val natOf = supplier(spark, sfDir)
      .select($"s_suppkey".as("node"), $"s_nationkey".as("comm"))
    val e = und
      .join(broadcast(natOf.select($"node".as("u"), $"comm".as("cu"))), "u")
      .join(broadcast(natOf.select($"node".as("v"), $"comm".as("cv"))), "v")
    val m = e.count()
    val intra = e.filter($"cu" === $"cv")
      .groupBy($"cu".as("comm")).agg(count(lit(1)).as("e_in"))
    val deg = e.select($"u".as("node"), $"cu".as("comm"))
      .unionAll(e.select($"v".as("node"), $"cv".as("comm")))
      .groupBy($"comm")
      .agg(count(lit(1)).as("d_sum"), countDistinct($"node").as("n_nodes"))
    val cells = deg.join(intra, Seq("comm"), "left")
      .select($"comm", $"n_nodes", coalesce($"e_in", lit(0L)).as("e_in"),
        $"d_sum",
        (lit(4L * m) * coalesce($"e_in", lit(0L)) - $"d_sum" * $"d_sum")
          .as("q_contrib_scaled"))
    val qtot = cells.agg(sum($"q_contrib_scaled").as("qs"))
    cells.crossJoin(broadcast(qtot))
      .select($"comm".as("community"), $"n_nodes", $"e_in", $"d_sum",
        $"q_contrib_scaled",
        round($"qs".cast(DoubleType) / lit(4.0 * m * m), 6).as("modularity"))
      .orderBy($"community")
  }

  /** Out-of-fold target encoding — the LEAK-FREE variant every
    * training pipeline should use: each row's category rate is
    * computed from the OTHER folds only ((pos_c − pos_f)/(n_c − n_f),
    * one exact-integer division), so a fold never sees its own
    * labels. Folds come from a stable md5 hash; everything is two
    * aggregations of one scan plus a category-keyed rejoin.
    */
  def mlTargetEncodeOof(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = events(spark, sfDir)
      .select($"event_type",
        expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 6), " +
          "16, 10) AS BIGINT) % 4").as("fold"),
        (money($"value") >= lit(50)).cast(LongType).as("y"))
    val perFold = base.groupBy($"event_type", $"fold")
      .agg(count(lit(1)).as("n_f"), sum($"y").as("pos_f"))
    val perCat = perFold.groupBy($"event_type".as("et"))
      .agg(sum($"n_f").as("n_c"), sum($"pos_f").as("pos_c"))
    perFold.join(perCat, $"event_type" === $"et")
      .select($"event_type", $"fold", $"n_f", $"pos_f",
        round(($"pos_c" - $"pos_f").cast(DoubleType) /
          ($"n_c" - $"n_f").cast(DoubleType), 6).as("oof_enc"))
      .orderBy($"event_type", $"fold")
  }

  /** Duplicate-cluster size census: connected components over the
    * exact near-dup pairs, histogrammed by cluster size, with
    * untouched documents reported as the size-1 row — the dataset
    * card's "how duplicated is this corpus" line. Reuses the
    * pointer-jumping CC kernel; the histogram is a two-level
    * aggregation of its labels.
    */
  def dedupClusterSizeHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cc = Round3Ops.nearDupClusters(spark, sfDir)
    val sizes = cc.select($"doc_id", $"cluster_id").distinct()
      .groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
    val hist = sizes.groupBy($"sz".as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"))
    val nDocs = documents(spark, sfDir).count()
    val inClusters = cc.select($"doc_id").distinct().count()
    val singles = Seq((1L, nDocs - inClusters)).toDF("cluster_size", "n_clusters")
    hist.unionAll(singles)
      .groupBy($"cluster_size")
      .agg(sum($"n_clusters").as("n_clusters"))
      .filter($"n_clusters" > 0)
      .orderBy($"cluster_size")
  }

  /** Theil T inequality index of customer revenue per year:
    * T = mean((x/μ)·ln(x/μ)). μ is ONE division of exact decimals;
    * each per-customer term does one log and freezes at 9 dp as
    * DECIMAL before the sum — the freeze-then-sum protocol again, so
    * the index is partitioning-independent. Complements the Lorenz/
    * Gini pair with the decomposable inequality measure.
    */
  def analyticTheilIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = orders(spark, sfDir)
      .groupBy(year($"o_orderdate").as("yr"), $"o_custkey")
      .agg(sum(money($"o_totalprice")).as("x"))
    val tots = rev.groupBy($"yr".as("y2"))
      .agg(sum($"x").as("tx"), count(lit(1)).as("n"))
      .select($"y2", $"n",
        ($"tx".cast(DoubleType) / $"n".cast(DoubleType)).as("mu"))
    rev.join(tots, $"yr" === $"y2")
      .select($"yr", $"n",
        round(($"x".cast(DoubleType) / $"mu") *
          log($"x".cast(DoubleType) / $"mu"), 9)
          .cast(DecimalType(28, 9)).as("term"))
      .groupBy($"yr")
      .agg(max($"n").as("n_cust"), sum($"term").as("st"))
      .select($"yr", $"n_cust",
        round($"st".cast(DoubleType) / $"n_cust".cast(DoubleType), 6)
          .as("theil"))
      .orderBy($"yr")
  }

  /** Markdown strip: a deterministically constructed markdown
    * wrapper (heading, bold span, one link) is reduced back to plain
    * text by three regexp rules — link text extraction, bold-marker
    * removal, heading-marker removal. The oracle states the EXPECTED
    * plain text directly from the source column, so the regex chain
    * is checked against the semantics, not against itself.
    */
  def textMarkdownStrip(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val md = concat(lit("# title\n\n**"), $"text",
      lit("** see [link](http://example.com/"), $"lang", lit(")"))
    documents(spark, sfDir)
      .select($"doc_id", md.as("md"))
      .select($"doc_id",
        regexp_replace(
          regexp_replace(
            regexp_replace($"md", "\\[([^\\]]*)\\]\\([^)]*\\)", "$1"),
            "\\*\\*", ""),
          "^#+ *", "").as("stripped"),
        expr("CAST((length(md) - length(replace(md, '](', ''))) DIV 2 " +
          "AS BIGINT)").as("n_links"))
      .orderBy($"doc_id")
  }

  /** Mann-Kendall trend test per event type: S = Σ_{i<j}
    * sign(c_j − c_i) over the daily series — exact integers from a
    * day-bounded self-join — variance scaled by 18 to stay integer,
    * and the continuity-corrected Z is ONE mirrored double
    * expression. The trend label derives from S's sign (exact), not
    * from the float.
    */
  def tsMannKendall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val s = daily.as("a").join(daily.as("b"),
        col("a.event_type") === col("b.event_type") &&
        col("a.d") < col("b.d"))
      .select(col("a.event_type").as("event_type"),
        when(col("b.c") > col("a.c"), 1L)
          .when(col("b.c") < col("a.c"), -1L)
          .otherwise(0L).as("sg"))
      .groupBy($"event_type").agg(sum($"sg").as("s_stat"))
    val n = daily.groupBy($"event_type".as("et"))
      .agg(count(lit(1)).as("n_days"))
    s.join(n, $"event_type" === $"et")
      .select($"event_type", $"n_days", $"s_stat",
        ($"n_days" * ($"n_days" - 1) * ($"n_days" * 2 + 5)).as("var18"),
        when($"s_stat" > 0, $"s_stat" - 1)
          .when($"s_stat" < 0, $"s_stat" + 1)
          .otherwise(lit(0L)).as("s_adj"))
      .select($"event_type", $"n_days", $"s_stat",
        round($"s_adj".cast(DoubleType) /
          sqrt($"var18".cast(DoubleType) / 18.0), 6).as("z"),
        when($"s_stat" > 0, "up").when($"s_stat" < 0, "down")
          .otherwise("flat").as("trend"))
      .orderBy($"event_type")
  }
}
