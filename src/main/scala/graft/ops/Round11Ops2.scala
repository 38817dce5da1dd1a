package graft.ops

import graft.Tables._
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 2: Zipf rank-frequency slope, stopword
  * coverage, referential-integrity and column-entropy audits,
  * stream-static enrichment join and stream-union merge (each with a
  * real `readStream` twin exercised in Round11Spec), an explicit
  * shuffle-hash-join strategy demo, max-inner-product and
  * Hamming-distance top-k similarity, and two deterministic MLlib
  * learners (closed-form linear regression, seeded GMM).
  *
  * Same float protocol as part 1: doubles that must cross an
  * aggregation boundary are floor-quantized to integer nanos/micros
  * (identical IEEE ops on both engines, exact integer sums); final
  * metrics combine exact integer sums in one shared double expression.
  */
object Round11Ops2 {

  private val toVec = udf((a: Seq[Float]) =>
    Vectors.dense(a.map(_.toDouble).toArray))

  /** Same bounded synchronized get-or-train as ML.cachedModel: one
    * fit per (learner, sfDir), and — the part that matters here —
    * concurrent callers serialize on the monitor. Test suites run in
    * parallel, and two simultaneous breeze-backed fits (GMM EM +
    * normal-equation solve) raced to a NotConvergedException in the
    * round-11 board sweep.
    */
  private def cachedModel[M](cache: scala.collection.concurrent.TrieMap[String, M],
                             key: String)(train: => M): M =
    cache.getOrElse(key, cache.synchronized {
      cache.getOrElseUpdate(key, {
        if (cache.size >= 4)
          cache.headOption.foreach { case (k, _) => cache.remove(k) }
        train
      })
    })

  private val lrCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.ml.regression.LinearRegressionModel]
  // (weight, mu1, mu2, s11, s12, s22) per component — the closed-form
  // EM below owns its parameters; see mlGmmCluster for why MLlib's
  // GaussianMixtureModel is not used
  private val gmmCache = scala.collection.concurrent.TrieMap
    .empty[String, Array[(Double, Double, Double, Double, Double, Double)]]

  /** Corpus-global stopword list (top-20 tokens by frequency, token
    * tie-break) joined back as a broadcast to score per-source
    * stopword coverage. The ratio divides two exact per-source token
    * counts — one double division, no float accumulation. The list is
    * 20 rows: the canonical tiny-dimension broadcast.
    */
  def textStopwordCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tok = documents(spark, sfDir)
      .select($"source", $"doc_id", explode(split($"text", " ")).as("t"))
    val stop = tok.groupBy($"t").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"t").limit(20).select($"t".as("sw"))
    tok.join(broadcast(stop), $"t" === $"sw", "left")
      .groupBy($"source")
      .agg(countDistinct($"doc_id").as("n_docs"),
        count(lit(1)).as("n_tokens"), count($"sw").as("n_stop"))
      .select($"source", $"n_docs", $"n_tokens", $"n_stop",
        round($"n_stop".cast(DoubleType) / $"n_tokens".cast(DoubleType), 6)
          .as("stop_ratio"))
      .orderBy($"source")
  }

  /** Referential-integrity audit over every FK edge of the star
    * schema: child row count and orphan count (child key with no
    * parent) per relationship. Each check is one left join + count —
    * at scale, each is a broadcast join against the (smaller) parent
    * key column, and the 7 relationship rows are the entire output.
    */
  def pipelineReferentialIntegrity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def chk(rel: String, child: DataFrame, key: String,
            parent: DataFrame, pkey: String): DataFrame =
      child.select(col(key).as("k"))
        .join(parent.select(col(pkey).as("pk")).distinct(),
          $"k" === $"pk", "left")
        .agg(count(lit(1)).as("n_child"),
          count(when($"pk".isNull, 1)).as("n_orphans"))
        .select(lit(rel).as("rel"), $"n_child", $"n_orphans")
    val l = lineitem(spark, sfDir); val o = orders(spark, sfDir)
    val c = customer(spark, sfDir); val s = supplier(spark, sfDir)
    val p = part(spark, sfDir); val n = nation(spark, sfDir)
    val r = region(spark, sfDir)
    chk("customer.c_nationkey->nation", c, "c_nationkey", n, "n_nationkey")
      .unionAll(chk("lineitem.l_orderkey->orders", l, "l_orderkey", o, "o_orderkey"))
      .unionAll(chk("lineitem.l_partkey->part", l, "l_partkey", p, "p_partkey"))
      .unionAll(chk("lineitem.l_suppkey->supplier", l, "l_suppkey", s, "s_suppkey"))
      .unionAll(chk("nation.n_regionkey->region", n, "n_regionkey", r, "r_regionkey"))
      .unionAll(chk("orders.o_custkey->customer", o, "o_custkey", c, "c_custkey"))
      .unionAll(chk("supplier.s_nationkey->nation", s, "s_nationkey", n, "n_nationkey"))
      .orderBy($"rel")
  }

  /** Shannon entropy (nats) of six categorical columns across four
    * tables — the data-profiling step that flags near-constant or
    * over-dispersed columns. Each −p·ln p term is floor-quantized to
    * integer nanos (value-count tables are bounded by the category
    * domains), so the per-column sums are exact; output is the single
    * identical division on both engines.
    */
  def pipelineColumnEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def ent(tbl: String, colName: String, df: DataFrame): DataFrame = {
      val cnt = df.groupBy(col(colName).as("v")).agg(count(lit(1)).as("c"))
      cnt.agg(sum($"c").as("n"), count(lit(1)).as("nd"),
          sum(floor(($"c".cast(DoubleType)) * lit(-1.0e9) *
            log($"c".cast(DoubleType))).cast(LongType)).as("sq"))
        // H = -Σ p ln p = ln n - (Σ c ln c)/n; Σ c·ln c is quantized
        // per distinct value (bounded terms), n and the outer ops are
        // the same double expression on both engines
        .select(lit(tbl).as("tbl"), lit(colName).as("col_name"),
          $"nd".as("n_distinct"),
          (log($"n".cast(DoubleType)) +
            ($"sq".cast(DoubleType) / 1.0e9) / $"n".cast(DoubleType))
            .as("entropy_nats"))
    }
    ent("customer", "c_mktsegment", customer(spark, sfDir))
      .unionAll(ent("documents", "lang", documents(spark, sfDir)))
      .unionAll(ent("documents", "source", documents(spark, sfDir)))
      .unionAll(ent("events", "event_type", events(spark, sfDir)))
      .unionAll(ent("lineitem", "l_returnflag", lineitem(spark, sfDir)))
      .unionAll(ent("orders", "o_orderpriority", orders(spark, sfDir)))
      .orderBy($"tbl", $"col_name")
  }

  /** Stream-static enrichment join (batch mirror): events joined to
    * the customer dimension on user_id = c_custkey, aggregated per
    * market segment. In the streaming twin ([[staticJoinStream]]) the
    * dimension is a batch DataFrame joined into each micro-batch —
    * Spark re-broadcasts it per trigger, the standard dimension-
    * enrichment topology; state never grows with the stream.
    */
  def streamStaticJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .join(broadcast(customer(spark, sfDir)), $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("n_users"),
        sum(money($"value")).as("_sv"))
      .select($"c_mktsegment", $"n_events", $"n_users",
        $"_sv".cast(DoubleType).as("sum_value"))
      .orderBy($"c_mktsegment")
  }

  /** Streaming twin of [[streamStaticJoin]]: stream ⋈ static batch
    * dimension, complete-mode aggregate.
    */
  def staticJoinStream(events: DataFrame, dim: DataFrame): DataFrame = {
    val spark = dim.sparkSession
    import spark.implicits._
    events.join(broadcast(dim), $"user_id" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_events"))
  }

  /** Union of two filtered event streams (clicks ⊎ purchases) merged
    * into one hourly windowed aggregate — the batch mirror of a
    * multi-source ingest topology. The union is plan-level (no
    * shuffle of its own); the single downstream aggregation shuffles
    * once on (window, type).
    */
  def streamUnionMerge(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, sfDir)
    val clicks = e.filter($"event_type" === "click")
    val buys = e.filter($"event_type" === "purchase")
    clicks.unionAll(buys)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(money($"value")).as("_sv"))
      .select($"window.start".as("win_start"), $"event_type", $"n",
        $"_sv".cast(DoubleType).as("sum_value"))
      .orderBy($"win_start", $"event_type")
  }

  /** Streaming twin of [[streamUnionMerge]]: two MemoryStream sources
    * unioned before one windowed aggregation.
    */
  def unionMergeStream(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    a.unionAll(b)
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("count"))
  }

  /** Explicit SHUFFLE_HASH join-strategy demo: orders (the smaller
    * side, but above any broadcast threshold at scale) is hinted as
    * the hash-build side, avoiding both the sort of a sort-merge join
    * and the memory wall of a broadcast — the right strategy when the
    * build side fits an executor but not the driver broadcast budget.
    * PlanSpec pins ShuffledHashJoin in the physical plan; result
    * equals the plain join (same oracle shape as the other scale_*
    * demos).
    */
  def scaleShuffleHashJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .join(orders(spark, sfDir).hint("shuffle_hash"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(money($"l_extendedprice") *
          (lit(1).cast(D4_2) - rate($"l_discount"))).as("_rev"))
      .select($"o_orderpriority", $"n_items",
        $"_rev".cast(DoubleType).as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** Max-inner-product top-10 against the probe vector vec_id = 1 —
    * the retrieval scoring used when embeddings are NOT normalized
    * (recommendation logits), where cosine and MIPS rank differently.
    * Same compiled graft_dot kernel and broadcast-probe shape as
    * sim_knn_query.
    */
  def simMipsTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val t = embeddings(spark, sfDir)
    val probe = t.filter($"vec_id" === 1).select($"embedding".as("pe"))
    t.filter($"vec_id" =!= 1)
      .crossJoin(broadcast(probe))
      .withColumn("ip", LlmOps.dot($"embedding", $"pe"))
      .orderBy($"ip".desc, $"vec_id")
      .limit(10)
      .select($"vec_id", round($"ip", 6).as("inner_product"))
  }

  /** Hamming-distance top-3 per probe over the 32-bit SimHash
    * signatures (probes = doc_id < 5): bit_count(sig ⊕ probe_sig)
    * via the codegen'd bit_count — the cheap integer-domain
    * candidate search that fronts a simhash dedup at scale. The
    * probe set broadcasts; the corpus side streams through one
    * XOR+popcount per (probe, doc) with a top-k-per-group window.
    */
  def simHammingTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sig = LlmOps2.dedupSimhash(spark, sfDir)
    val probes = sig.filter($"doc_id" < 5)
      .select($"doc_id".as("probe_id"), $"simhash".as("ps"))
    val scored = sig.crossJoin(broadcast(probes))
      .filter($"doc_id" =!= $"probe_id")
      .select($"probe_id", $"doc_id",
        expr("bit_count(simhash ^ ps)").as("hamming"))
    scored
      .withColumn("rn", row_number().over(Window.partitionBy($"probe_id")
        .orderBy($"hamming", $"doc_id")))
      .filter($"rn" <= 3)
      .select($"probe_id", $"doc_id", $"hamming", $"rn")
      .orderBy($"probe_id", $"rn")
  }

  /** Closed-form (normal-equation) linear regression predicting
    * embedding dim 4 from dims 1–3 — solver="normal" is a
    * deterministic matrix solve, no iterative seed sensitivity.
    * Scalatest-only (not SQL-expressible as one query); Round11Spec
    * asserts bitwise re-run determinism and a sane R².
    */
  def mlLinearRegression(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.ml.regression.LinearRegression
    val m = cachedModel(lrCache, sfDir) {
      val df = embeddings(spark, sfDir).select(
        toVec(slice($"embedding", 1, 3)).as("features"),
        element_at($"embedding", 4).cast(DoubleType).as("label"))
        .repartition(8)
      new LinearRegression().setSolver("normal").setRegParam(0.0).fit(df)
    }
    val coef = m.coefficients.toArray
    spark.createDataFrame(Seq((
        math.rint(coef(0) * 1e6) / 1e6,
        math.rint(coef(1) * 1e6) / 1e6,
        math.rint(coef(2) * 1e6) / 1e6,
        math.rint(m.intercept * 1e6) / 1e6,
        math.rint(m.summary.r2 * 1e6) / 1e6)))
      .toDF("c1", "c2", "c3", "intercept", "r2")
  }

  /** Gaussian-mixture clustering (k = 3, 20 EM iterations) on
    * embedding dims 1–2: per-cluster sizes. Scalatest-only;
    * Round11Spec asserts re-run determinism (served by the model
    * cache) and that sizes partition the corpus.
    *
    * Round 18: hand-rolled closed-form EM, NOT MLlib's
    * GaussianMixture. The MLlib fit computes each component's
    * covariance constants with breeze eigSym -> netlib f2j `dsyev`
    * INSIDE executor tasks, and f2j's `dlascl` spins forever when a
    * collapsed component hands it a NaN covariance (NaN comparisons
    * never satisfy its scaling-loop exit). Observed in-session: one
    * executor thread pinned a core for 40+ minutes mid-suite — an
    * operator that can hang an entire 1000-executor job on one bad
    * component is not scale-safe no matter how fast its happy path
    * is. In 2-D every quantity has closed form (2x2 determinant /
    * inverse), so EM runs as plain codegen'd Column arithmetic — one
    * whole-stage aggregation per iteration, no LAPACK, no UDF — and
    * the M-step ridge-floors each covariance (escalating until the
    * determinant is strictly positive) and rebirths near-empty
    * components, so a NaN/singular matrix cannot exist by
    * construction. Init is data-derived and deterministic (global
    * mean +/- 0.8 sigma along both dims), not seeded-random.
    */
  def mlGmmCluster(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pts = embeddings(spark, sfDir).select($"vec_id",
      element_at($"embedding", 1).cast(DoubleType).as("x1"),
      element_at($"embedding", 2).cast(DoubleType).as("x2"))
    // log component densities as Column arithmetic; p = (w, mu1, mu2,
    // s11, s12, s22) with det(s) > 0 guaranteed by the M-step
    def logDens(p: (Double, Double, Double, Double, Double, Double)) = {
      val (w, mu1, mu2, s11, s12, s22) = p
      val det = s11 * s22 - s12 * s12
      val (i11, i12, i22) = (s22 / det, -s12 / det, s11 / det)
      val d1 = $"x1" - lit(mu1); val d2 = $"x2" - lit(mu2)
      lit(math.log(w) - math.log(2 * math.Pi) - 0.5 * math.log(det)) -
        (d1 * d1 * lit(i11) + d1 * d2 * lit(2 * i12) + d2 * d2 * lit(i22)) * 0.5
    }
    val params = cachedModel(gmmCache, sfDir) {
      val Array(n, m1, m2, v1, v2) = pts.agg(
        count(lit(1)).cast(DoubleType), avg($"x1"), avg($"x2"),
        var_pop($"x1"), var_pop($"x2"))
        .as[(Double, Double, Double, Double, Double)].head()
        .productIterator.map(_.asInstanceOf[Double]).toArray
      val (sd1, sd2) = (math.sqrt(v1 max 1e-6), math.sqrt(v2 max 1e-6))
      var ps = Array(-0.8, 0.0, 0.8).map(o =>
        (1.0 / 3, m1 + o * sd1, m2 + o * sd2, v1 max 1e-6, 0.0, v2 max 1e-6))
      for (_ <- 1 to 20) {
        // E-step responsibilities, max-shifted for stable exp
        val ls = ps.map(logDens)
        val mx = greatest(ls(0), ls(1), ls(2))
        val es = ls.map(l => exp(l - mx))
        val tot = es(0) + es(1) + es(2)
        // one aggregation pass: per-component weighted sufficient stats
        val cols = es.flatMap { e =>
          val r = e / tot
          Seq(sum(r), sum(r * $"x1"), sum(r * $"x2"),
            sum(r * $"x1" * $"x1"), sum(r * $"x1" * $"x2"),
            sum(r * $"x2" * $"x2"))
        }
        val row = pts.agg(cols.head, cols.tail: _*).head()
        val stats = Array.tabulate(3, 6)((k, j) => row.getDouble(6 * k + j))
        ps = Array.tabulate(3) { k =>
          val Array(rk, sx1, sx2, sq11, sq12, sq22) = stats(k)
          // died OR any non-finite stat (NaN in the source column
          // would otherwise poison the ridge loop): rebirth at the
          // global mean — never divide by ~0, never carry NaN forward
          if (rk < 1e-6 || !stats(k).forall(java.lang.Double.isFinite))
            (1e-6, m1, m2, v1 max 1e-6, 0.0, v2 max 1e-6)
          else {
            val (mu1, mu2) = (sx1 / rk, sx2 / rk)
            var (c11, c12, c22) = (sq11 / rk - mu1 * mu1,
              sq12 / rk - mu1 * mu2, sq22 / rk - mu2 * mu2)
            // ridge until strictly positive-definite — the invariant
            // that makes the log/inverse above total functions;
            // bounded (finite inputs + geometric ridge), but belt-and-
            // braces capped with a spherical fallback
            var ridge = 1e-9
            var tries = 0
            while ((!(c11 * c22 - c12 * c12 > 1e-12) || !(c11 > 0)) &&
                tries < 64) {
              c11 += ridge; c22 += ridge; ridge *= 10; tries += 1
            }
            if (tries >= 64) { c11 = v1 max 1e-6; c12 = 0.0; c22 = v2 max 1e-6 }
            (rk, mu1, mu2, c11, c12, c22)
          }
        }
        val wTot = ps.map(_._1).sum
        ps = ps.map { case (w, a, b, c, d, e) => (w / wTot, a, b, c, d, e) }
      }
      ps
    }
    val ls = params.map(logDens)
    pts.select(
        when(ls(0) >= ls(1) && ls(0) >= ls(2), 0)
          .when(ls(1) >= ls(2), 1).otherwise(2).as("prediction"))
      .groupBy($"prediction")
      .agg(count(lit(1)).as("n"))
      .orderBy($"prediction")
  }
}
