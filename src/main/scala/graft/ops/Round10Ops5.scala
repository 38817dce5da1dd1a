package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 widening, part 5: 2-D skyline via a distributed prefix
  * min, CUSUM-argmax changepoint detection, key-skew diagnosis,
  * cross-document n-gram novelty scoring, and Gaussian naive Bayes.
  */
object Round10Ops5 {

  /** 2-D skyline (Pareto frontier) of parts minimizing (retailprice,
    * size). Dominance splits into two exact tests: m1 = min size over
    * STRICTLY cheaper prices (any such ≤-size row dominates), m2 = min
    * size at the SAME price (a strictly smaller size dominates). m2 is
    * a plain partitioned aggregate; m1 is the running min over the
    * price order — computed with the same two-phase bucket shape as
    * analytic_pareto_abc (floor(price/64) buckets, per-bucket window +
    * strictly-richer-bucket offset join), so the global sweep never
    * funnels through one partition. All comparisons are on raw doubles
    * and integers — no arithmetic, so no float divergence.
    */
  def analyticSkyline2d(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val p = part(spark, sfDir)
      .select($"p_partkey", $"p_retailprice".as("price"), $"p_size".as("sz"))
    // per-price group minimum size (ties at the same price)
    val gmin = p.groupBy($"price").agg(min($"sz").as("m2"))
    // prefix-min of m2 over strictly-smaller prices, two-phase:
    val bucketed = gmin.withColumn("b",
      floor($"price" / 64.0).cast(LongType))
    val within = bucketed.withColumn("mw",
      min($"m2").over(Window.partitionBy($"b").orderBy($"price")
        .rowsBetween(Window.unboundedPreceding, -1)))
    val btot = bucketed.groupBy($"b").agg(min($"m2").as("bmin"))
    val offs = btot.as("t1")
      .join(btot.as("t2"), $"t2.b" < $"t1.b", "left")
      .groupBy($"t1.b".as("b")).agg(min($"t2.bmin").as("moff"))
    val m1 = within.join(offs, "b")
      .select($"price",
        least(coalesce($"mw", lit(Int.MaxValue)),
          coalesce($"moff", lit(Int.MaxValue))).as("m1"), $"m2")
    p.join(m1, "price")
      .filter($"sz" < $"m1" && !($"m2" < $"sz"))
      .select($"p_partkey", $"price", $"sz".as("size"))
      .orderBy($"price", $"size", $"p_partkey")
  }

  /** Changepoint estimate per event type: the k maximizing |D_k| of
    * the exact-DECIMAL CUSUM statistic (ties → smallest k), i.e. the
    * point where the cumulative deviation from the global mean is
    * largest — the standard single-changepoint location estimator.
    * Selection is an argmax AGGREGATE — max(struct(absd, -k, ...))
    * compares |D| first, then -k, so ties go to the smallest k — which
    * two-phases (partial max per task, final merge) instead of sorting
    * each type's whole series under a 5-partition window (round-16
    * low-card-window sweep). Every comparison is exact DECIMAL/
    * integer; the single division by n happens once per emitted row.
    */
  def tsChangepoint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cum = Round10Ops4.cusumFrame(spark, sfDir)
      .withColumn("absd", abs($"d"))
    cum.groupBy($"event_type")
      .agg(max(struct($"absd", (-$"k").as("negk"),
        $"d", $"n", $"k".as("kk"))).as("top"))
      .selectExpr("event_type", "CAST(top.n AS BIGINT) AS n",
        "CAST(top.kk AS BIGINT) AS k_star",
        "round(CAST(top.d AS DOUBLE) / CAST(top.n AS DOUBLE), 6) AS excursion")
      .orderBy($"event_type")
  }

  /** Key-skew diagnosis for the lineitem→supplier distribution: one
    * row of the metrics a shuffle-skew triage needs — key count, max
    * per-key rows, which key carries the max (min id on ties), the
    * skew ratio max/mean, and the p50/p99 of per-key row counts. Two
    * aggregation levels, both partitioned; the second input is
    * key-cardinality-bounded.
    */
  def pipelineSkewReport(spark: SparkSession, sfDir: String): DataFrame = {
    lineitem(spark, sfDir).createOrReplaceTempView("g10e_lineitem")
    spark.sql("""
      WITH per_key AS (
        SELECT l_suppkey, count(*) AS cnt
        FROM g10e_lineitem GROUP BY l_suppkey),
      mx AS (SELECT max(cnt) AS m FROM per_key)
      SELECT
        count(*) AS n_keys,
        sum(cnt) AS n_rows,
        max(cnt) AS max_rows,
        (SELECT min(l_suppkey) FROM per_key CROSS JOIN mx
          WHERE cnt = m) AS heavy_key,
        round(CAST(max(cnt) AS DOUBLE) /
          (CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
          AS skew_ratio,
        CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY cnt) AS BIGINT)
          AS p50_rows,
        CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY cnt) AS BIGINT)
          AS p99_rows
      FROM per_key
    """)
  }

  /** Cross-document n-gram novelty: the share of a document's distinct
    * bigrams that occur in NO other document (document frequency = 1)
    * — a contamination/memorization signal scored corpus-wide in two
    * vocabulary-bounded shuffles: (doc, bigram) distinct pairs → df
    * per bigram → join back on the bigram key and re-aggregate per
    * doc. Nothing corpus-sized is ever broadcast or windowed.
    */
  def textNgramNovelty(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("t"))
    val bigrams = toks
      .select($"doc_id", explode(expr(TextExprs.bigrams("t"))).as("bg"))
      .distinct()
    val df = bigrams.groupBy($"bg").agg(count(lit(1)).as("dfreq"))
    bigrams.join(df, "bg")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        count(when($"dfreq" === 1, 1)).as("n_novel"))
      .selectExpr("doc_id", "n_bigrams", "n_novel",
        "round(CAST(n_novel AS DOUBLE) / CAST(n_bigrams AS DOUBLE), 6) AS novelty")
      .orderBy($"doc_id")
  }

  /** Gaussian naive Bayes over the embedding corpus (closed-form
    * per-class mean/variance — no iterative fitting, so the model is
    * deterministic without a seed). The target is the derived
    * sign-of-dim-1 signal (the fixture's `label` column is noise — the
    * same reason MLSpec's "learns a real signal" test derives one), so
    * the spec can assert a real accuracy floor, not just determinism.
    * Train on the hash split's train side, score the test side;
    * per-class likelihoods are row-local products on the executors.
    * Not SQL-expressible (MLlib's smoothed Gaussian likelihood) —
    * scalatest-only: determinism + coverage + accuracy in
    * Round10Spec5.
    */
  def mlNaiveBayes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.ml.classification.NaiveBayes
    val base = ML.mlRfTrainPredictInput(spark, sfDir)
      .withColumn("y", (element_at($"embedding", 1) > 0f).cast(IntegerType))
    val model = new NaiveBayes()
      .setModelType("gaussian")
      .setLabelCol("y").setFeaturesCol("features")
      .fit(base.filter($"split" === "train"))
    model.transform(base.filter($"split" === "test"))
      .select($"vec_id", $"y".as("label"),
        $"prediction".cast(IntegerType).as("prediction"))
      .orderBy($"vec_id")
  }
}
