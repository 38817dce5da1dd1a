package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 21: Katz centrality, nearest-centroid
  * classification, distinct-count rollup, segment migration,
  * compression-ratio quality signal, stable UUID derivation.
  */
object Round11Ops21 {

  /** Katz centrality on the thinned co-supply graph, α = 1/4, four
    * iterations — computed ENTIRELY in scaled integers: with
    * X_k = 4^k·x_k the recurrence x' = 1 + α·Σ_nbr x becomes
    * X' = 4^(k+1) + Σ_nbr X, so every iteration is an integer
    * neighbor-sum join (the pagerank join shape with no doubles until
    * ONE final division by 4^4). Degree is bounded by the k-NN
    * thinning, so X stays far inside Long range and each iteration's
    * shuffle is edge-linear.
    */
  def graphKatzCentrality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val und = Round10Ops4.thinnedGraph(spark, sfDir)
    val adj = und.select($"u".as("a"), $"v".as("b"))
      .unionAll(und.select($"v".as("a"), $"u".as("b")))
    val nodes = adj.select($"a".as("node")).distinct()
    var x = nodes.withColumn("x", lit(1L))
    for (k <- 1 to 4) {
      val nbrSum = adj.join(x, $"b" === $"node")
        .groupBy($"a").agg(sum($"x").as("sx"))
      x = nodes.join(nbrSum, $"node" === $"a", "left")
        .select($"node",
          (lit(math.pow(4, k).toLong) + coalesce($"sx", lit(0L))).as("x"))
    }
    x.select($"node", $"x".as("katz_scaled"),
        round($"x".cast(DoubleType) / lit(256.0), 6).as("katz"))
      .orderBy($"node")
  }

  /** Nearest-centroid classification on the embedding table (train =
    * even ids, test = odd): per-label centroids from a columnar
    * posexplode — component sums frozen at 6 dp as DECIMAL, ONE
    * division per component — then test×centroid scores with the SAME
    * per-dim 9 dp freeze-then-exact-sum arithmetic, folded per row.
    * The centroid side is labels×dims and broadcasts.
    *
    * Round 19: the scoring side no longer explodes — the old shape
    * shipped test-corpus × dims × labels rows through a dim-keyed
    * join into a composite-key hash aggregate; the centroids now
    * collapse to one ordered array per label (labels × 1 rows,
    * broadcast) and each test vector scores against each label with
    * one codegen'd zip_with/aggregate fold over the arrays — the same
    * round(x·c, 9)::DECIMAL(28,9) per-element values, folded as their
    * exact ×10⁹ BIGINT unscaling (the decimal HOF fold itself is
    * unusable: DECIMAL(38,9)+DECIMAL(28,9) loses a scale digit under
    * Spark's precision-loss rule, while the BIGINT fold is the same
    * numbers ×10⁹ — |x·c| < 1 here so 64 terms sum < 10¹¹, and the
    * scores are ONLY compared, so a strictly order-isomorphic exact
    * integer is argmax-identical). 64× fewer rows and zero scoring
    * shuffle (mlPermutationImportance's shape).
    */
  def mlCentroidClassifier(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Round 20: the centroid explode (train half × 64 dims) and the
    // broadcast scoring fold (test half × 5 labels × 64-dim decimal
    // zip_with) are per-row-heavy pre-shuffle stages, and the
    // single-split embeddings scan serialized both (r20 before-dump:
    // 1.48 s, 0.05 MB shuffle). Guard the parallelism once here — both
    // halves inherit it (ScaleTechniques.ensureParallelism).
    val emb = ScaleTechniques.ensureParallelism(embeddings(spark, sfDir)
      .select($"vec_id", $"label",
        $"embedding".cast(ArrayType(DoubleType)).as("e")))
    val cent = emb.filter($"vec_id" % 2 === 0)
      .select($"vec_id", $"label", posexplode($"e"))
      .select($"label", ($"pos" + 1).as("dim"), $"col".as("xv"))
      .groupBy($"label".as("clabel"), $"dim")
      .agg((sum(round($"xv", 6).cast(DecimalType(18, 6))).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("cv"))
    val centArr = cent.groupBy($"clabel")
      .agg(expr("transform(array_sort(collect_list(struct(dim, cv))), p -> p.cv)")
        .as("cvs"))
    val scores = emb.filter($"vec_id" % 2 =!= 0)
      .crossJoin(broadcast(centArr))
      .select($"vec_id", $"label", $"clabel", expr(
        "aggregate(zip_with(e, cvs, (x, c) -> " +
          "CAST(CAST(round(x * c, 9) AS DECIMAL(28, 9)) * 1000000000 AS BIGINT)), " +
          "CAST(0 AS BIGINT), (s, t) -> s + t)").as("score"))
    val pred = scores.withColumn("rk", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"score".desc, $"clabel")))
      .filter($"rk" === 1)
    pred.groupBy($"label".as("true_label"))
      .agg(count(lit(1)).as("n_test"),
        count(when($"clabel" === $"label", 1)).as("n_correct"))
      .select($"true_label", $"n_test", $"n_correct",
        round($"n_correct".cast(DoubleType) / $"n_test".cast(DoubleType), 6)
          .as("accuracy"))
      .orderBy($"true_label")
  }

  /** Distinct-count rollup: exact distinct users at (type, day),
    * per-type, and grand-total levels in one ROLLUP pass. Distinct
    * counts are non-additive, so each level genuinely re-deduplicates
    * — Catalyst plans this as an Expand + two-phase distinct
    * aggregate, the right distributed shape (no level is computed by
    * summing another).
    */
  def aggDistinctRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select($"event_type", to_date($"ts").as("d"), $"user_id")
      .rollup($"event_type", $"d")
      .agg(countDistinct($"user_id").as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type".asc_nulls_first, $"d".asc_nulls_first)
  }

  /** Customer value-segment migration: yearly revenue quartiles
    * (ntile over a year-partitioned total order) self-joined across
    * consecutive years into a transition matrix — the
    * churn-and-upgrade census. ntile's equal-division semantics are
    * identical in both engines given the same total order, and the
    * year partitioning keeps every window bounded.
    */
  def analyticSegmentMigration(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val yearly = orders(spark, sfDir)
      .groupBy($"o_custkey", year($"o_orderdate").as("yr"))
      .agg(sum(money($"o_totalprice")).as("rev"))
    val seg = yearly.withColumn("q", ntile(4).over(
      Window.partitionBy($"yr").orderBy($"rev".desc, $"o_custkey")))
    seg.as("a").join(seg.as("b"),
        col("a.o_custkey") === col("b.o_custkey") &&
        col("b.yr") === col("a.yr") + 1)
      .groupBy(col("a.yr").as("yr_from"), col("a.q").as("q_from"),
        col("b.q").as("q_to"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy($"yr_from", $"q_from", $"q_to")
  }

  /** Deflate compression ratio as a text-quality signal — the classic
    * "too compressible = repetitive boilerplate" heuristic. The codec
    * runs inside a typed mapPartitions (one Deflater per partition,
    * reused across rows — the multimodal imperative-escape pattern;
    * no SQL built-in exists). No oracle: deflate byte counts are
    * codec-implementation specific; the spec pins the signal's
    * discriminative direction instead.
    */
  def textCompressionRatio(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds = documents(spark, sfDir)
      .select($"doc_id", $"text").as[(Long, String)]
    ds.mapPartitions { it =>
      val defl = new java.util.zip.Deflater(6, true)
      it.map { case (id, text) =>
        val in = text.getBytes("UTF-8")
        defl.reset()
        defl.setInput(in)
        defl.finish()
        val buf = new Array[Byte](in.length * 2 + 64)
        var out = 0
        while (!defl.finished()) out += defl.deflate(buf, out, buf.length - out)
        (id, in.length.toLong, out.toLong,
          BigDecimal(out.toLong)./(BigDecimal(in.length))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }.toDF("doc_id", "orig_bytes", "comp_bytes", "ratio")
      .orderBy($"doc_id")
  }

  /** Name-based stable UUID (v3 layout over md5) — the deterministic
    * surrogate-key every ingest needs for idempotent re-runs: same
    * business key, same UUID, any engine. Pure string/bit splicing on
    * the md5 hex (version nibble forced to 3, variant nibble to
    * 8–b), so the oracle owns the identical construction.
    */
  def fnUuid3Stable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey", md5(concat(lit("order:"),
        $"o_orderkey".cast(StringType))).as("h"))
      .select($"o_orderkey", concat(
        substring($"h", 1, 8), lit("-"),
        substring($"h", 9, 4), lit("-"),
        lit("3"), substring($"h", 14, 3), lit("-"),
        element_at(array(lit("8"), lit("9"), lit("a"), lit("b")),
          (conv(substring($"h", 17, 1), 16, 10).cast(IntegerType) % 4) + 1),
        substring($"h", 18, 3), lit("-"),
        substring($"h", 21, 12)).as("uuid"))
      .orderBy($"o_orderkey")
  }
}
