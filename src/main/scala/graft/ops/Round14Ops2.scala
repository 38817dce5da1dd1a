package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 widening, part 2: odds ratio with Woolf CI, deterministic
  * permutation feature importance.
  */
object Round14Ops2 {

  /** 2×2 odds ratio with the Woolf (log) confidence interval:
    * exposure = purchase vs view, outcome = high-value event
    * (≥ 5000 cents). The four cells are exact integer counts from one
    * grouped pass; OR = ad/bc and the CI bounds
    * exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d)) are the only double math,
    * identical expression shape on both engines, rounded 6dp. The
    * retrospective-study effect-size surface (case-control analysis
    * over event logs) — one shuffle of |2×2| partials at any scale.
    */
  def analyticOddsRatio(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = events(spark, sfDir)
      .filter($"event_type".isin("purchase", "view"))
      .select($"event_type",
        ((money($"value") * 100).cast(LongType) >= 5000L).as("hi"))
      .agg(
        sum(when($"event_type" === "purchase" && $"hi", 1L).otherwise(0L)).as("a"),
        sum(when($"event_type" === "purchase" && !$"hi", 1L).otherwise(0L)).as("b"),
        sum(when($"event_type" === "view" && $"hi", 1L).otherwise(0L)).as("c"),
        sum(when($"event_type" === "view" && !$"hi", 1L).otherwise(0L)).as("d"))
    val or = ($"a" * $"d").cast(DoubleType) / ($"b" * $"c").cast(DoubleType)
    val se = sqrt(lit(1.0) / $"a" + lit(1.0) / $"b" +
      lit(1.0) / $"c" + lit(1.0) / $"d")
    cells.select($"a", $"b", $"c", $"d",
      round(or, 6).as("odds_ratio"),
      round(exp(log(or) - lit(1.96) * se), 6).as("ci_lo"),
      round(exp(log(or) + lit(1.96) * se), 6).as("ci_hi"))
  }

  /** Frequent 3-itemsets over order→brand baskets at 1/256 support
    * (binary-exact; 1/64 — the pair tier's threshold — leaves the L3
    * tier empty at every SF) — the apriori L3 tier. The
    * in-basket triple self-join's per-basket fan-out is bounded by
    * basket width (≤7 brands/order ⟹ ≤35 triples), shuffled on basket
    * id, so the census is linear in baskets at any scale; counts are
    * exact and the ceil threshold is binary-exact. Extends the
    * pair census honestly where FP-Growth's tree machinery would
    * still be overkill (bounded itemset size).
    *
    * Round 16: the DOUBLE corpus self-join (two corpus-sized sort
    * sides per run — the worst instance of the shape the
    * analytic_basket_lift rewrite removed) became the collect_set
    * co-occurrence form: one order-keyed aggregate, then the ≤35
    * in-basket triples generated inline from the sorted array.
    * Byte-identical output at sf0.01 and sf0.1.
    */
  def mlFpmFrequentTriples(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Round 20: materialize the basket table once (localCheckpoint —
    // see the pair tier's note on why not persist): threshold count +
    // triple census otherwise each rebuild the scan + join +
    // collect_set exchange.
    val sets = lineitem(spark, sfDir)
      .join(part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_set($"p_brand")).as("bs"))
      .localCheckpoint(true)
    val th = sets.agg(ceil(lit(0.00390625) * count(lit(1))).as("t"))
    // 0-based outer index i, then j within the post-i tail, then the
    // post-(i, j) tail — 1-based slice starts i + 2 and i + j + 3
    val s3 = sets
      .select(explode(expr(
        "flatten(transform(bs, (x, i) -> flatten(" +
          "transform(slice(bs, i + 2, size(bs)), (y, j) -> " +
            "transform(slice(bs, i + j + 3, size(bs)), z -> " +
              "struct(x AS a, y AS b, z AS c))))))"
      )).as("p"))
      .groupBy($"p.a".as("item1"), $"p.b".as("item2"), $"p.c".as("item3"))
      .agg(count(lit(1)).as("freq"))
    s3.crossJoin(broadcast(th))
      .filter($"freq" >= $"t")
      .select($"item1", $"item2", $"item3", $"freq")
      .orderBy($"item1", $"item2", $"item3")
  }

  /** Deterministic permutation feature importance over the embedding
    * corpus, centroid-classifier target: accuracy is measured with
    * each 16-dim feature BLOCK replaced by the cyclic donor's
    * ((vec_id+1) mod n — a fixed derangement, no RNG), and importance
    * is the accuracy drop vs the unpermuted base. Everything that
    * must be order-free is integer: vectors are int-scaled
    * (round(x·10⁷), exact for float inputs), centroids are per-dim
    * BIGINT sums (shuffle-order-free where a double mean is not), and
    * the score dot products fold the SAME integer inputs in the SAME
    * array order on both engines, so the per-vector argmax —
    * tie-broken by language — is engine-identical. Cost shape: one
    * dim-explode for centroids (|langs|·64 rows), one cyclic-donor
    * equi-join, 5 variants × n scoring rows against a 5-row broadcast
    * centroid table — linear in the corpus at any scale.
    */
  def mlPermutationImportance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Round 20: the 5-variant × n × 64-dim integer scoring folds are
    // per-row-heavy pre-shuffle work over a single-split scan (r20
    // before-dump: 2.25 s, 1.5 MB shuffle) — guard the parallelism once
    // on the labeled frame (ScaleTechniques.ensureParallelism)
    val lab = ScaleTechniques.ensureParallelism(embeddings(spark, sfDir)
      .join(documents(spark, sfDir).select($"doc_id", $"lang"),
        $"vec_id" === $"doc_id")
      .select($"vec_id", $"lang", expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000000.0) AS BIGINT))")
        .as("xi")))
    val nn = lab.agg(count(lit(1)).as("n"))
    val don = lab.crossJoin(broadcast(nn))
      .join(lab.select($"vec_id".as("did"), $"xi".as("xj")),
        $"did" === pmod($"vec_id" + 1, $"n"))
    val cl = lab.select($"lang", posexplode($"xi").as(Seq("i", "x")))
      .groupBy($"lang", $"i").agg(sum($"x").as("s"))
      .groupBy($"lang")
      .agg(expr("transform(array_sort(collect_list(struct(i, s))), p -> p.s)").as("c"))
      .withColumn("nrm", expr(
        "sqrt(aggregate(zip_with(c, c, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "0D, (s, t) -> s + t))"))
      .select($"lang".as("clang"), $"c", $"nrm")
    val scored = don
      .withColumn("v", explode(sequence(lit(0), lit(4))))
      .withColumn("xv", expr(
        "transform(sequence(0, 63), ii -> IF(v > 0 AND ii DIV 16 = v - 1, " +
          "element_at(xj, ii + 1), element_at(xi, ii + 1)))"))
      .crossJoin(broadcast(cl))
      .withColumn("score", expr(
        "aggregate(zip_with(xv, c, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "0D, (s, t) -> s + t)") / $"nrm")
    val pred = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy($"v", $"vec_id").orderBy($"score".desc, $"clang")))
      .filter($"rn" === 1)
    val acc = pred.groupBy($"v")
      .agg(count(lit(1)).as("n"),
        sum(when($"clang" === $"lang", 1L).otherwise(0L)).as("n_correct"))
    val base = acc.filter($"v" === 0)
      .select(($"n_correct".cast(DoubleType) / $"n".cast(DoubleType)).as("base_acc"))
    acc.crossJoin(broadcast(base))
      .select(
        when($"v" === 0, lit("base"))
          .otherwise(concat(lit("block"), ($"v" - 1).cast(StringType))).as("variant"),
        $"n", $"n_correct",
        round($"n_correct".cast(DoubleType) / $"n".cast(DoubleType), 6).as("accuracy"),
        round($"base_acc" - $"n_correct".cast(DoubleType) / $"n".cast(DoubleType), 6)
          .as("importance"))
      .orderBy($"variant")
  }
}
