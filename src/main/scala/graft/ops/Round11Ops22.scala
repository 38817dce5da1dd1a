package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 22: LATERAL top-k, distributed exact
  * quantiles, BPE merge training, lang-id confusion matrix, delta
  * attribution, slugify.
  */
object Round11Ops22 {

  /** Correlated LATERAL top-k — the SQL surface for "top 3 orders per
    * customer" written as a lateral subquery with ORDER BY + LIMIT.
    * Catalyst rewrites the correlated limit into a window rank over
    * the join (no per-customer re-scan); the physical plan is the
    * same partitioned top-k as win_topk_per_group, reached from the
    * SQL form a migrating user actually writes.
    */
  def sqlLateralTopk(spark: SparkSession, sfDir: String): DataFrame = {
    customer(spark, sfDir).createOrReplaceTempView("g11_customer_lt")
    orders(spark, sfDir).createOrReplaceTempView("g11_orders_lt")
    spark.sql("""
      SELECT c_custkey, o_orderkey, cents
      FROM g11_customer_lt,
      LATERAL (SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   AS cents
               FROM g11_orders_lt WHERE o_custkey = c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)
      ORDER BY c_custkey, cents DESC, o_orderkey
    """)
  }

  /** Exact global quantiles WITHOUT a global sort or unpartitioned
    * window — distributed selection: value-range buckets count in
    * parallel, bucket offsets come from a bounded bucket×bucket join,
    * the target rank (⌈q·n⌉, integer math) locates its bucket, and
    * only THAT bucket's values are ranked (a q-partitioned,
    * bucket-bounded window). At 100 TB the full sort this replaces is
    * the single most expensive plan shape; this touches each value
    * once plus one small bucket's re-rank.
    */
  def aggExactGlobalMedian(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val v = lineitem(spark, sfDir)
      .select($"l_extendedprice".as("x"),
        floor($"l_extendedprice" / 1024.0).cast(LongType).as("bkt"))
    val bc = v.groupBy($"bkt").agg(count(lit(1)).as("bn"))
    val off = bc.as("a").join(bc.as("b"), col("b.bkt") < col("a.bkt"), "left")
      .groupBy(col("a.bkt").as("bkt"), col("a.bn").as("bn"))
      .agg(coalesce(sum(col("b.bn")), lit(0L)).as("n_before"))
    val tot = bc.agg(sum($"bn").as("n"))
    val targets = broadcast(tot
      .select($"n", explode(array(lit(25), lit(50), lit(75))).as("q"))
      .select($"q", $"n", expr("CAST((q * n + 99) DIV 100 AS BIGINT)").as("r")))
    val spec = targets.join(off,
        $"n_before" < $"r" && $"r" <= $"n_before" + $"bn")
      .select($"q", $"n", $"bkt", ($"r" - $"n_before").as("k"))
    v.join(broadcast(spec), "bkt")
      .withColumn("rn", row_number().over(
        Window.partitionBy($"q").orderBy($"x")))
      .filter($"rn" === $"k")
      .select($"q".as("quantile_pct"), $"n".as("n_rows"), $"x".as("value"))
      .orderBy($"quantile_pct")
  }

  /** BPE merge training — the tokenizer-learning core loop: the word
    * frequency table (ONE corpus pass) drives 8 merge rounds; each
    * round counts frequency-weighted adjacent symbol pairs
    * (distributed explode + groupBy), picks the argmax pair (a 1-row
    * driver scalar, like pagerank's normalization count), and applies
    * the merge with a left-to-right sequential fold per word (the
    * greedy BPE semantics — an `aggregate` HOF over word-bounded
    * arrays). At 100 TB the expensive object is the word table, which
    * is vocabulary-sized, not corpus-sized. No oracle: the 8-round
    * loop is not expressible as one SQL query; the spec pins merge
    * validity and compression.
    */
  def mlBpeTrainMerges(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    var words = documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .select(split($"w", "").as("syms"), $"n")
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    for (round <- 1 to 8) {
      val pairs = words
        .filter(size($"syms") >= 2)
        .select($"n", explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))"))
          .as("p"))
        .groupBy($"p.a", $"p.b").agg(sum($"n").as("cnt"))
      val best = pairs.orderBy($"cnt".desc, $"a", $"b").limit(1)
        .as[(String, String, Long)].head()
      merges += ((round, best._1, best._2, best._3))
      val (a, b) = (best._1, best._2)
      words = words.select(
        when(size($"syms") < 2, $"syms").otherwise(
          aggregate(slice($"syms", lit(2), size($"syms") - 1),
            array(element_at($"syms", 1)),
            (acc: Column, s: Column) =>
              when(element_at(acc, -1) === lit(a) && s === lit(b),
                concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
                .otherwise(concat(acc, array(s))))).as("syms"),
        $"n").localCheckpoint()
    }
    merges.toSeq.toDF("merge_rank", "left_sym", "right_sym", "pair_count")
      .orderBy($"merge_rank")
  }

  /** Language-ID confusion matrix: the n-gram marker heuristic's
    * predictions crossed with true labels, with per-cell recall share
    * — the evaluation artifact a pipeline publishes alongside any
    * heuristic classifier. Reuses text_lang_id's exact CASE-chain
    * argmax; one groupBy on a langs² key space.
    */
  def textLangidConfusion(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pred = LlmOps2.textLangId(spark, sfDir)
      .select($"doc_id", $"predicted")
    val cells = documents(spark, sfDir).select($"doc_id", $"lang")
      .join(pred, "doc_id")
      .groupBy($"lang".as("true_lang"), $"predicted")
      .agg(count(lit(1)).as("n"))
    val totals = cells.groupBy($"true_lang".as("tl"))
      .agg(sum($"n").as("n_true"))
    cells.join(totals, $"true_lang" === $"tl")
      .select($"true_lang", $"predicted", $"n",
        round($"n".cast(DoubleType) / $"n_true".cast(DoubleType), 6)
          .as("share"))
      .orderBy($"true_lang", $"predicted")
  }

  /** Day-over-day delta attribution: each event type's contribution
    * to the total daily change — the "why did the metric move"
    * waterfall. Per-type deltas are lags on type-partitioned windows
    * (exact integers); the day total re-aggregates the deltas; the
    * share divides the two exact integers once, null when the total
    * is zero (0/0 is a report gap, not a number).
    */
  def tsDeltaAttribution(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val withDelta = daily
      .withColumn("delta", $"c" - lag($"c", 1).over(
        Window.partitionBy($"event_type").orderBy($"d")))
      .filter($"delta".isNotNull)
    val dayTot = withDelta.groupBy($"d".as("d2"))
      .agg(sum($"delta").as("total_delta"))
    withDelta.join(dayTot, $"d" === $"d2")
      .select($"d", $"event_type", $"c", $"delta", $"total_delta",
        // + 0.0 collapses IEEE -0.0 to +0.0 (0 delta over a negative
        // day total would otherwise sign-differ between engines)
        when($"total_delta" =!= 0,
          round($"delta".cast(DoubleType) / $"total_delta".cast(DoubleType), 6)
            + 0.0)
          .as("share"))
      .orderBy($"d", $"event_type")
  }

  /** Slugify — the URL/key normalization every catalog ingest runs:
    * lowercase, collapse non-alphanumeric runs to single hyphens,
    * strip edge hyphens. Pure regexp algebra, identical engine
    * semantics (character classes only), fully pushdown-friendly.
    */
  def fnSlugify(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    part(spark, sfDir)
      .select($"p_partkey", $"p_name",
        regexp_replace(
          regexp_replace(lower(trim($"p_name")), "[^a-z0-9]+", "-"),
          "^-|-$", "").as("slug"))
      .orderBy($"p_partkey")
  }
}
