package graft.ops

import graft.Tables._
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 widening, part 2: bounded-degree graph analytics,
  * frequent-pattern mining, time-series autocorrelation, the
  * single-pass Observation metrics API, exchange-reuse as a scale
  * technique, and two MLlib additions (PCA projection, ALS
  * recommendations).
  */
object Round10Ops2 {

  /** Triangle census over a bounded-degree similarity graph. The raw
    * supplier co-supply relation is dense (at sf0.01 every supplier
    * pair shares a part — a complete graph), so the graph is first
    * thinned to each node's top-3 strongest neighbours (shared-part
    * count, ties broken by id — a total order, so the graph is a pure
    * function of the data), then symmetrized. That k-NN thinning is
    * the 100 TB move: degree is capped by construction, so the wedge
    * join that follows is O(k²·n) rather than O(Σdeg²) on a dense
    * co-occurrence graph, and every shuffle key is a supplier id.
    * Triangles close with a third equi-join (x<y<z each counted
    * once); output is each supplier's triangle participation count.
    */
  def graphTriangleCount(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // the thinned graph is the shared materialized artifact (built
    // once per dataset by Round10Ops4.thinnedGraph — the co-supply
    // self-join whose per-part fanout is deg_p², the expensive step
    // every graph op would otherwise repeat)
    val und = Round10Ops4.thinnedGraph(spark, sfDir)
    val tri = und.as("a")
      .join(und.as("b"), $"a.u" === $"b.u" && $"a.v" < $"b.v")
      .join(und.as("c"), $"c.u" === $"a.v" && $"c.v" === $"b.v")
      .select($"a.u".as("x"), $"a.v".as("y"), $"b.v".as("z"))
    tri.select(explode(array($"x", $"y", $"z")).as("supplier"))
      .groupBy($"supplier").agg(count(lit(1)).as("n_triangles"))
      .orderBy($"supplier")
  }

  /** Frequent-itemset census over order→brand baskets, itemset size
    * ≤ 2: singletons = presence census, pairs = in-basket self-join,
    * both exact counts. minSupport 1/64 is exactly representable in
    * binary, so `ceil(minSupport·n)` agrees with the oracle's
    * identical expression for any basket count < 2⁴⁶.
    *
    * Round 14: the MLlib FPGrowth fit this op originally wrapped was
    * the board's #2 cost (4.1 s — an iterative multi-job parallel-
    * FP-tree build, all of it spent deriving counts the ≤2-truncation
    * then throws away). For bounded itemset size the exact SQL census
    * IS the better algorithm at any scale: basket width is bounded
    * (≤7 brands/order at every SF — TPC-H order fan-out), so the
    * in-basket self-join's per-basket fan-out is a constant ≤ 21
    * pairs, shuffled on basket id. FP-Growth earns its tree machinery
    * only for unbounded itemset sizes, which this surface never asks
    * for. Output verified identical to the FPGrowth form (same sets,
    * same counts — both are exact) by the unchanged DuckDB oracle.
    *
    * Round 16: the DISTINCT + in-basket self-join became the
    * collect_set co-occurrence shape (the analytic_basket_lift
    * rewrite): ONE order-keyed aggregate builds each basket's sorted
    * brand set, singles explode from it, and the ≤21 in-basket pairs
    * are generated inline from the array — the corpus-sized
    * self-join sort (which GC-stormed on large heaps at 10×+) is
    * gone. Byte-identical output at sf0.01 and sf0.1.
    */
  def mlFpmFrequentPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Round 20: materialize the basket table ONCE — the threshold's
    // count and the census both consume it, and without this the whole
    // scan + broadcast join + collect_set exchange ran TWICE per
    // execution (PlanDump r19: two identical 15-node subtrees, 6.9 MB
    // shuffled where one build is ~3.5). localCheckpoint, not persist:
    // an eager raw-block checkpoint has no cache-fill race between the
    // broadcast threshold subquery and the census (a lazy .persist()
    // here measured 2.9–19 s warm across runs — both consumers racing
    // to fill the same columnar cache), and blocks are freed by the
    // harness like every other checkpoint.
    val sets = lineitem(spark, sfDir)
      .join(part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .groupBy($"l_orderkey")
      .agg(array_sort(collect_set($"p_brand")).as("bs"))
      .localCheckpoint(true)
    // threshold rides a 1-row broadcast; ceil(double) matches the
    // oracle bit-for-bit because 1/64 is a binary-exact literal
    // (one row per basket here, so count(1) == countDistinct(o))
    val th = sets.agg(ceil(lit(0.015625) * count(lit(1))).as("t"))
    // singletons (item2 NULL) and pairs ride ONE explode + ONE
    // aggregate — a separate singles branch re-runs the whole basket
    // build (measured at 10x min-of-3: old self-join 6.9 s,
    // two-branch collect_set 9.1 s, this merged census 3.4 s)
    val census = sets
      .select(explode(expr(
        "concat(" +
          "transform(bs, x -> struct(x AS a, CAST(NULL AS STRING) AS b)), " +
          "flatten(transform(bs, (x, i) -> " +
            "transform(slice(bs, i + 2, size(bs)), y -> struct(x AS a, y AS b)))))"
      )).as("p"))
      .groupBy($"p.a".as("item1"), $"p.b".as("item2"))
      .agg(count(lit(1)).as("freq"))
    census.crossJoin(broadcast(th))
      .filter($"freq" >= $"t")
      .select($"item1", $"item2", $"freq")
      // Spark ASC is NULLS FIRST, DuckDB/ANSI is NULLS LAST — pin the
      // singleton (item2 NULL) rows to the oracle's placement
      .orderBy($"item1", $"item2".asc_nulls_last)
  }

  /** Lag-k autocorrelation (k = 1..3) of the event value series per
    * event type — the agg_corr_pairs exact-decimal-moments recipe
    * applied to (x_t, x_{t+k}) pairs formed by a lead window over the
    * (ts, event_id) total order. One window pass materializes all
    * three leads, `stack` unpivots them to (lag, x, y) rows, and one
    * grouped aggregate computes the six exact DECIMAL moments per
    * (type, lag); the Pearson formula then runs once on doubles,
    * identically on both engines, rounded at 6dp. The lead window runs
    * per 1024-row chunk with the NEXT chunk's first 3 rows replicated
    * in (TwoPhase, round-16 low-card-window sweep) — the (x, x_{t+k})
    * pair multiset is identical to the single per-type window's, and
    * the exact-DECIMAL moment sums are order-free, so the output
    * cannot move while parallelism grows with the data instead of
    * stopping at the 5 event types.
    */
  def tsAutocorr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val chunkRows = 1024
    val pos = TwoPhase.eventPositions(spark, sfDir, chunkRows)
    val ord = Window.partitionBy($"event_type", $"chunk").orderBy($"rn")
    val leads = TwoPhase.withCarries(pos, chunkRows, before = 0, after = 3)
      .select($"event_type", $"is_carry", $"x",
        lead($"x", 1).over(ord).as("y1"),
        lead($"x", 2).over(ord).as("y2"),
        lead($"x", 3).over(ord).as("y3"))
      .filter(!$"is_carry")
    val pairs = leads
      .selectExpr("event_type",
        "stack(3, 1, x, y1, 2, x, y2, 3, x, y3) AS (lag, x, y)")
      .filter($"y".isNotNull)
    val mom = pairs.groupBy($"event_type", $"lag")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"y" * $"y").as("syy"),
        sum($"x" * $"y").as("sxy"))
    mom.selectExpr("event_type", "lag", "n_pairs",
        """round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
          |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          | / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
          |    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          |  * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
          |    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
          |AS acf""".stripMargin.replace("\n", " "))
      .orderBy($"event_type", $"lag")
  }

  /** Spark's Observation API: data-quality counters collected as a
    * side effect of ONE pass over the corpus (a CollectMetrics node in
    * the plan — zero extra jobs, vs re-scanning once per metric). The
    * pass itself is driven by a `noop`-sink write, so nothing but the
    * 1-row metric map ever reaches the driver; the returned frame is
    * built from that map. This is the monitoring shape a 100 TB
    * quality gate wants: piggyback the counters on the write you were
    * already doing.
    */
  def pipelineObserveMetrics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val obs = Observation("dq_metrics")
    // Run the observed pass on a child session: registering an
    // Observation initializes the session's ObservationManager, and a
    // session with an initialized manager can no longer ride inside
    // serialized task closures (it poisons e.g. MLlib models whose
    // trainingSummary references the session). newSession() shares the
    // SparkContext but isolates that state from the caller's session.
    val child = spark.newSession()
    documents(child, sfDir)
      .observe(obs,
        count(lit(1)).as("n_docs"),
        count(when(length($"text") > 500, 1)).as("n_long"),
        count(when($"lang" === "en", 1)).as("n_en"),
        sum(size(split($"text", " ")).cast(LongType)).as("total_tokens"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    Seq((m("n_docs").asInstanceOf[Long], m("n_long").asInstanceOf[Long],
      m("n_en").asInstanceOf[Long], m("total_tokens").asInstanceOf[Long]))
      .toDF("n_docs", "n_long", "n_en", "total_tokens")
  }

  /** Month-over-month revenue growth via a self-join of one monthly
    * aggregate — the plan-level point is exchange REUSE: both join
    * branches read the identical scan→partial-agg→shuffle subtree, and
    * Spark plans the second branch as a ReusedExchange over the first
    * (pinned in PlanSpec), so the 100 TB fact table is scanned and
    * shuffled ONCE, not twice. Revenue sums stay exact DECIMAL until
    * the final DOUBLE cast; growth is rounded at 6dp.
    */
  def scaleExchangeReuse(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // coalesce makes the key expression non-nullable: otherwise the
    // join infers isnotnull(ym) on one branch and isnotnull(CASE…) on
    // the other, the pushed-down filters diverge, and the two agg
    // subtrees stop being canonically equal — no reuse (observed).
    // No order has a NULL date, so the 0 sentinel never materializes.
    val monthly = orders(spark, sfDir)
      .groupBy(coalesce(year($"o_orderdate") * 100 + month($"o_orderdate"),
        lit(0)).as("ym"))
      .agg(sum(money($"o_totalprice")).as("rev"))
    val next = monthly.select(
      when($"ym" % 100 === 12, $"ym" + 89).otherwise($"ym" + 1).as("ym"),
      $"rev".as("prev_rev"))
    monthly.join(next, "ym")
      .select($"ym",
        $"rev".cast(DoubleType).as("rev"),
        $"prev_rev".cast(DoubleType).as("prev_rev"),
        round(($"rev" - $"prev_rev").cast(DoubleType) /
          $"prev_rev".cast(DoubleType), 6).as("growth"))
      .orderBy($"ym")
  }

  /** PCA projection of the 64-dim embedding corpus to its top-8
    * principal components — the dimensionality-reduction step that
    * precedes clustering/ANN in an embedding pipeline. Covariance is
    * accumulated distributed (one pass of Gram-matrix partial sums);
    * only the 64×64 eigensolve is driver-side. Component sign is
    * basis-dependent (not SQL-expressible — scalatest-only: MLSpec
    * asserts the explained-variance ordering and that projected
    * variance matches it).
    *
    * Round 13: the rotation comes from breeze eigSym (LAPACK's
    * symmetric dsyevd) on the covariance instead of MLlib PCA's
    * general dgesdd SVD — dgesdd intermittently threw NotConverged in
    * long shared-JVM board sweeps (the round-11 "pca flake"; passed
    * standalone every time). dsyevd is the right routine for a
    * symmetric PSD matrix and removes the flake at the root. Each
    * component's sign is normalized (largest-|loading| entry made
    * positive) so the projection is deterministic, not just
    * variance-equivalent.
    */
  def mlPcaProject(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = 64; val k = 8
    val toVec = udf((a: Seq[Float]) =>
      org.apache.spark.mllib.linalg.Vectors.dense(a.map(_.toDouble).toArray))
    val rm = new org.apache.spark.mllib.linalg.distributed.RowMatrix(
      embeddings(spark, sfDir).select(toVec($"embedding").as("f"))
        .rdd.map(_.getAs[org.apache.spark.mllib.linalg.Vector](0)))
    val cov = rm.computeCovariance()
    val es = breeze.linalg.eigSym(
      new breeze.linalg.DenseMatrix(d, d, cov.toArray))
    // eigSym returns eigenvalues ASCENDING: take the top-k columns in
    // descending order, sign-normalized
    val w = Array.tabulate(k) { j =>
      val col = es.eigenvectors(::, d - 1 - j).toArray
      val m = col.indices.maxBy(i => math.abs(col(i)))
      if (col(m) < 0) col.map(v => -v) else col
    }
    val bw = spark.sparkContext.broadcast(w)
    val project = udf((a: Seq[Float]) => {
      val x = a.map(_.toDouble).toArray
      bw.value.map(c => {
        var s = 0.0; var i = 0
        while (i < x.length) { s += x(i) * c(i); i += 1 }
        s
      })
    })
    embeddings(spark, sfDir)
      .select($"vec_id", $"label", project($"embedding").as("pc"))
      .select($"vec_id" +: $"label" +:
        (0 until k).map(i => element_at($"pc", i + 1).as(s"pc${i + 1}")): _*)
      .orderBy($"vec_id")
  }

  /** ALS collaborative filtering over the implicit user×event-type
    * activity matrix (rating = interaction count), returning each
    * user's top-2 recommended event types. The factorization is
    * seed-pinned and deterministic for a fixed partitioning
    * (block-coordinate descent order is data-partition-defined), but
    * not SQL-expressible — scalatest-only: MLSpec asserts re-run
    * determinism, coverage, and that recommendations exclude nothing
    * outside the item vocabulary.
    */
  def mlAlsRecommend(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // deterministic item ids without a global window (the board-wide
    // "no unpartitioned Window" pin): murmur3 of the type name — any
    // distinct Int works for ALS, and hash() is partition-independent
    val items = events(spark, sfDir).select($"event_type").distinct()
      .withColumn("item_id", hash($"event_type"))
    val ratings = events(spark, sfDir)
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).cast(FloatType).as("rating"))
      .join(broadcast(items), "event_type")
      .select($"user_id".cast(IntegerType).as("user"),
        $"item_id".as("item"), $"rating")
    val model = new ALS()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setRank(4).setMaxIter(5).setRegParam(0.1).setSeed(7)
      .setImplicitPrefs(true)
      .fit(ratings)
    model.setColdStartStrategy("drop")
    model.recommendForAllUsers(2)
      .select($"user".cast(LongType).as("user_id"),
        posexplode($"recommendations"))
      .select($"user_id", ($"pos" + 1).as("rec_rank"),
        $"col.item".as("item_id"))
      .join(broadcast(items), "item_id")
      .select($"user_id", $"rec_rank", $"event_type".as("rec_type"))
      .orderBy($"user_id", $"rec_rank")
  }
}
