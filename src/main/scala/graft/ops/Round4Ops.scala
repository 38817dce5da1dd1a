package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-4 widening: the remaining SQL surface (recursive CTEs, VALUES,
  * FILTER-clause aggregates, multi-distinct, OFFSET pagination, right
  * outer join, CTE chains) plus training-pipeline composites (scalable
  * bucketed range join, label-centroid similarity, benchmark
  * contamination check, token-budget shard packing, containment
  * near-dup, windowed top-k) — SURVEY §2 round-4 table.
  */
object Round4Ops {

  /** RIGHT OUTER join surface: every customer appears, order columns
    * NULL for the order-less (mirrors join_left_outer from the other
    * side — Catalyst plans both as the same outer SMJ/BHJ with sides
    * swapped).
    */
  def joinRightOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .join(customer(spark, sfDir), $"o_custkey" === $"c_custkey", "right_outer")
      .select($"c_custkey", $"o_orderkey",
        $"o_totalprice".cast(DoubleType).as("total"))
      .orderBy($"c_custkey", $"o_orderkey")
  }

  /** CTE chain where the first CTE is consumed twice (join + scalar
    * subquery) — exercises Catalyst's CTE dedup/inline decisions
    * (WithCTE / InlineCTE).
    */
  def sqlCteChain(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g4_orders")
    customer(spark, sfDir).createOrReplaceTempView("g4_customer")
    spark.sql("""
      WITH co AS (
        SELECT o_custkey, count(*) AS n,
               sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM g4_orders GROUP BY o_custkey),
      hi AS (SELECT * FROM co WHERE n >= 12)
      SELECT c.c_mktsegment, count(*) AS n_cust,
             CAST(sum(co.rev) AS DOUBLE) AS segment_rev
      FROM co JOIN g4_customer c ON co.o_custkey = c.c_custkey
      WHERE co.n >= (SELECT min(n) FROM hi)
      GROUP BY c.c_mktsegment
      ORDER BY c.c_mktsegment
    """)
  }

  /** Recursive CTE (Spark 4's UnionLoop): a 1995 month ladder built by
    * recursion, LEFT-joined to orders — the relational idiom for
    * gap-free time axes without a generator function.
    */
  def sqlRecursiveCte(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g4_orders")
    spark.sql("""
      WITH RECURSIVE months(m) AS (
        SELECT TIMESTAMP_NTZ '1995-01-01 00:00:00'
        UNION ALL
        SELECT m + INTERVAL '1' MONTH FROM months
        WHERE m < TIMESTAMP_NTZ '1995-12-01 00:00:00')
      SELECT m, count(o_orderkey) AS n_orders,
             CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS rev
      FROM months LEFT JOIN g4_orders ON date_trunc('MONTH', o_orderdate) = m
      GROUP BY m ORDER BY m
    """)
  }

  /** Inline VALUES relation joined to a fact table — constant dimension
    * tables without a file (LocalRelation; folds into a broadcast).
    */
  def sqlValuesInline(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g4_orders")
    spark.sql("""
      SELECT t.tier, count(*) AS n,
             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
      FROM g4_orders o
      JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                   ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                   ('5-LOW', 'cold')) AS t(pri, tier)
        ON o.o_orderpriority = t.pri
      GROUP BY t.tier ORDER BY t.tier
    """)
  }

  /** FILTER (WHERE ...) aggregate modifiers — per-aggregate predicates
    * in one pass over the fact table (no self-joins, no CASE pyramids).
    */
  def aggFilterClause(spark: SparkSession, sfDir: String): DataFrame = {
    lineitem(spark, sfDir).createOrReplaceTempView("g4_lineitem")
    spark.sql("""
      SELECT l_returnflag,
        count(*) AS n_all,
        count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
        CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
          FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE) AS rev_discounted,
        count(*) FILTER (WHERE l_shipdate >= TIMESTAMP_NTZ '1995-01-01 00:00:00') AS n_recent
      FROM g4_lineitem
      GROUP BY l_returnflag ORDER BY l_returnflag
    """)
  }

  /** Several COUNT(DISTINCT ...) over different columns in one
    * aggregate — Catalyst's RewriteDistinctAggregates Expand path.
    */
  def aggDistinctMulti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .groupBy($"event_type")
      .agg(
        countDistinct($"user_id").as("n_users"),
        countDistinct(date_trunc("DAY", $"ts")).as("n_days"),
        count(lit(1)).as("n_events"))
      .orderBy($"event_type")
  }

  /** ORDER BY ... LIMIT ... OFFSET pagination (total order: tiebreak on
    * the unique key, so page 3 is engine-independent).
    */
  def limitOffset(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey", $"o_totalprice".cast(DoubleType).as("total"))
      .orderBy($"total".desc, $"o_orderkey")
      .offset(40)
      .limit(20)
  }

  /** The 100 TB form of [[Relational.joinThetaRange]]: same result
    * (order pairs of one customer within 30 days), but the non-equi
    * date-range condition is bucketized — each left row is exploded to
    * 30-day-epoch buckets {b, b+1} (d2 >= d1 makes lower buckets
    * unreachable) and the join becomes a plain (custkey, bucket)
    * EQUI-join with the exact range check as a residual. A pair's
    * bucket distance is unique, so no pair matches twice (no dedup).
    * Turns the broadcast-nested-loop theta join into a
    * shuffle-partitionable hash join: shuffle volume O(2n), never
    * O(n²/customers).
    */
  def joinRangeBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bucketDays = 30
    def withBucket(df: DataFrame): DataFrame =
      df.withColumn("bkt",
        floor(datediff(col("d").cast(DateType), lit("1970-01-01")) / bucketDays))
    val o1 = withBucket(orders(spark, sfDir)
      .select($"o_custkey".as("custkey"), $"o_orderkey".as("k1"), $"o_orderdate".as("d")))
      .withColumn("probe", explode(array(col("bkt"), col("bkt") + 1)))
      .select($"custkey", $"k1", $"d".as("d1"), $"probe")
    val o2 = withBucket(orders(spark, sfDir)
      .select($"o_custkey".as("ck2"), $"o_orderkey".as("k2"), $"o_orderdate".as("d")))
      .select($"ck2", $"k2", $"d".as("d2"), $"bkt")
    o1.join(o2,
        $"custkey" === $"ck2" && $"probe" === $"bkt" && $"k1" < $"k2" &&
        $"d2" >= $"d1" && $"d2" <= $"d1" + expr("INTERVAL '30' DAY"))
      .select($"custkey", $"k1", $"k2")
      .orderBy($"k1", $"k2")
  }

  /** Label-centroid similarity: per-label mean embedding computed
    * relationally (posexplode → per-(label, dim) partial-aggregated
    * avg — map-side combine keeps the shuffle at labels × dims rows,
    * corpus-size independent), then each probe vector's dot product
    * with its own label's centroid via a broadcast of the tiny
    * centroid table. ROUND 4dp: the avg absorbs accumulation-order
    * float noise.
    */
  def simCentroidDistance(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ex = embeddings(spark, sfDir)
      .select($"vec_id", $"label", posexplode($"embedding"))
      .select($"vec_id", $"label", $"pos", $"col".cast(DoubleType).as("v"))
    val centroids = ex.groupBy($"label", $"pos").agg(avg($"v").as("c"))
    ex.filter($"vec_id" < 200)
      .join(broadcast(centroids), Seq("label", "pos"))
      .groupBy($"vec_id", $"label")
      // + 0.0 collapses IEEE -0.0 to +0.0 (engines round tiny negative
      // dots to differently-signed zeros — observed at sf0.1)
      .agg((round(sum($"v" * $"c"), 4) + lit(0.0)).as("dot_centroid"))
      .orderBy($"vec_id")
  }

  /** Benchmark-contamination check — the eval-set hygiene pass of a
    * training-data pipeline: which training docs share at least one
    * 3-token shingle with any document of a (small) benchmark set.
    * The benchmark side is legitimately BROADCAST (it is small by
    * construction — eval sets are thousands of docs, not corpora), so
    * the scan over the training corpus stays shuffle-free: a
    * broadcast nested-loop with the compiled graft_isect kernel as
    * the only per-pair cost, pruned by the shared-lang block.
    */
  def pipelineContaminationCheck(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val sh = documents(spark, sfDir)
      .select($"doc_id", $"lang",
        call_function("graft_shingles", $"text", lit(3)).as("sh"))
    val bench = sh.filter($"doc_id" < 20)
      .select($"doc_id".as("bench_id"), $"lang".as("bench_lang"), $"sh".as("bench_sh"))
    val isect = call_function("graft_isect", $"sh", $"bench_sh")
    sh.filter($"doc_id" >= 20)
      .join(broadcast(bench), $"lang" === $"bench_lang" && isect > 0)
      .select($"doc_id", $"bench_id", isect.as("n_shared"))
      .orderBy($"doc_id", $"bench_id")
  }

  /** Token-budget shard packing — greedy sequential packing of docs
    * into fixed-budget training shards per language stream:
    * shard = floor(tokens-before-this-doc / budget) over the doc_id
    * order. The token cursor is a DISTRIBUTED prefix sum (round-16
    * low-card-window sweep: a lang-only window caps parallelism at 5
    * languages forever): intra-bucket running sums over fixed doc_id
    * ranges plus running bucket totals from the |langs| x |buckets|
    * census — the same two-phase shape at any corpus size.
    */
  def pipelineTokenBudgetPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val budget = 8192
    val docs = documents(spark, sfDir)
      .select($"doc_id", $"lang",
        size(split($"text", " ")).cast(LongType).as("n_tokens"))
      .withColumn("b", expr("doc_id DIV 512"))
    val wIn = Window.partitionBy($"lang", $"b").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val census = docs.groupBy($"lang".as("c_lang"), $"b".as("c_b"))
      .agg(sum($"n_tokens").as("bt"))
    val wOff = Window.partitionBy($"c_lang").orderBy($"c_b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = census
      .withColumn("off", coalesce(sum($"bt").over(wOff), lit(0L)))
      .select($"c_lang", $"c_b", $"off")
    docs.join(broadcast(offsets),
        $"lang" === $"c_lang" && $"b" === $"c_b")
      .withColumn("shard",
        floor(($"off" + sum($"n_tokens").over(wIn) - $"n_tokens") / budget))
      .select($"doc_id", $"lang", $"n_tokens", $"shard")
      .orderBy($"doc_id")
  }

  /** Asymmetric containment near-dup: |A∩B| / |A| >= 0.9 with A the
    * smaller token set — catches sub-document duplication (quotes,
    * wrappers) that symmetric jaccard misses. Same sketch tier as
    * dedup_near_jaccard: lang-blocked pairs, integer prune inside the
    * join (10·|A∩B| >= 9·|A|), compiled two-pointer intersect.
    *
    * Pair generation is the same fragment-replicate (1-Bucket-Theta)
    * SHUFFLE join as dedup_near_jaccard: the small-side sketch
    * replicates across nBuckets salts, the big side hashes into one,
    * both shuffle-partition on (lang, bucket) — no corpus-sized
    * broadcast (the round-4 variant broadcast the entire sketch table,
    * which is linear in the corpus). A banded-MinHash candidate tier
    * is NOT sound here: banding collides with probability ~jaccard^r,
    * and containment pairs with |A| << |B| have arbitrarily low
    * jaccard (A ⊂ B with |A| = 0.1|B| => jac ≈ 0.1 => certain miss),
    * so exactness demands the full lang-blocked compare.
    *
    * OUTPUT-BOUND at probe scale (round-16 full-board probe, fresh
    * JVM min-of-3): 18.9× time at 10× data against 53× output pairs
    * (1.80 M → 95.0 M rows) — time per emitted pair FELL 0.31 →
    * 0.11 µs; the pair count is a property of this word-soup corpus
    * at t ≥ 0.9, same as dedup_near_jaccard / dedup_ngram_jaccard.
    */
  def textContainment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val nBuckets = 32
    val t = LlmOps.tokenHashes(spark, sfDir)
    val b = t.select($"doc_id".as("id_big"), $"lang".as("lang_b"),
      $"th".as("th_b"), $"sz".as("sz_b"),
      pmod($"doc_id", lit(nBuckets)).as("bkt_b"))
    val isect = LlmOps.isect($"th", $"th_b")
    t.withColumn("bkt", explode(array((0 until nBuckets).map(lit): _*)))
      .select($"doc_id".as("id_small"), $"lang", $"th", $"sz", $"bkt")
      .join(b,
        $"lang" === $"lang_b" && $"bkt" === $"bkt_b" &&
        ($"sz" < $"sz_b" || ($"sz" === $"sz_b" && $"id_small" < $"id_big")) &&
        isect * 10 >= $"sz" * 9)
      .select($"id_small", $"id_big",
        round(isect.cast(DoubleType) / $"sz", 6).as("containment"))
      .orderBy($"id_small", $"id_big")
  }

  /** Windowed top-k (streaming shape, batch mirror): the dominant
    * event type of every 1-hour tumbling window — tumbling agg + one
    * rank pass, ties to the lexicographically smallest type.
    */
  def streamTopkPerWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = events(spark, sfDir)
      .groupBy(date_trunc("HOUR", $"ts").as("win_start"), $"event_type")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy($"win_start").orderBy($"n".desc, $"event_type".asc)))
      .filter($"rn" === 1)
      .select($"win_start", $"event_type", $"n")
      .orderBy($"win_start")
  }
}
