package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LLM-data-pipeline operators (SURVEY §2j): deduplication, similarity
  * search, text analysis, multimodal metadata — the training-data-prep
  * surface this engine adds beyond the reference.
  *
  * Scale design notes:
  *  - exact near-dup (all-pairs jaccard) is the VERIFY path, blocked by
  *    language so cost is Σ|block|², not |corpus|²; the 100 TB path is
  *    [[dedupMinhashLsh]] (MinHash banding → candidates only).
  *  - cosine uses the native codegen kernel graft_dot with per-side
  *    precomputed norms — SQL HOF lambdas are interpreted per element
  *    and were measured 170× slower (SURVEY §6).
  */
object LlmOps {

  // ---- native vector kernel: graft_dot is a custom Catalyst
  // Expression with doGenCode (graft.expressions.FloatDotProduct) —
  // the dot loop runs inside whole-stage codegen with no UDF
  // indirection, accumulating left-to-right in double (bit-identical
  // to DuckDB's list math on ::DOUBLE[] casts). ----

  private[ops] def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** Codegen'd two-pointer intersect-size over sorted long arrays
    * (graft.expressions.SortedLongIntersectSize) — the pair-verify
    * kernel, evaluated once per candidate pair inside the join stage.
    */
  private[ops] def isect(a: Column, b: Column): Column =
    call_function("graft_isect", a, b)

  /** Sorted-long-array intersection size — two-pointer merge over
    * primitive arrays (Spark passes ArrayType(LongType,false) as
    * Array[Long]: no boxing, no per-element string conversion). Token
    * sets are pre-hashed to 64-bit once per document; with a ~100-word
    * vocabulary the collision probability is ~1e-15, so the count
    * equals the exact string-set intersection.
    */
  private[graft] val intersectSizeUdf = udf { (a: Array[Long], b: Array[Long]) =>
    var i = 0; var j = 0; var n = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** (doc_id, lang, sz, th): distinct-token count + sorted hashed
    * token set — the compact per-doc sketch all pair ops verify
    * against. ~40 B/doc of longs instead of ~500 B of strings, small
    * enough to BROADCAST, so pair verification never shuffles arrays.
    */
  private[ops] def tokenHashes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    // The repartition is an EVALUATION BARRIER, not a distribution
    // choice: Spark's higher-order functions are interpreted (no
    // codegen), and without an exchange between the sketch projection
    // and its consumers, CollapseProject + filter pushdown re-inline
    // this chain into every downstream expression that references th —
    // measured 12+ re-evaluations per doc in the minhash plan (14 s →
    // 2 s at sf0.1). The exchange materializes the sketch once and
    // ReuseExchange shares it across self-join branches; its cost is
    // one corpus-sized shuffle of ~200 B/doc sketches — cheaper than a
    // single re-evaluation of the chain, at any scale.
    // explicit partition count: a bare repartition(col) is an AQE
    // coalesce target — collapsing the barrier to 1 partition would
    // serialize every downstream sketch consumer
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // graft_shingles(text, 1) = the sorted distinct token-hash set in
    // one compiled pass over the UTF8 bytes (replaced the interpreted
    // sort_array(transform(array_distinct(split(...)))) chain — only
    // set sizes/intersections are consumed downstream, so the hash
    // family is free to differ from xxhash64-of-string)
    documents(spark, sfDir)
      .select($"doc_id", $"lang",
        call_function("graft_shingles", $"text", lit(1)).as("th"))
      .repartition(n, col("doc_id"))
      .withColumn("sz", size($"th"))
  }

  // ---- dedup ----

  /** Exact dedup: content hash → group, keep min doc_id. One shuffle
    * on the 128-bit hash regardless of document size; at 100 TB the
    * hash is computed scan-side and only (hash, id) pairs move.
    */
  def dedupExactHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .groupBy(md5($"text").as("hash"))
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keep_id"))
      .orderBy($"hash")
  }

  /** Exact near-dup: token-set Jaccard >= 0.8 over same-language pairs
    * (language = natural blocking key; the synthetic corpus's tiny
    * vocabulary makes 0.5 catch ~99% of pairs).
    *
    * Pair generation is a fragment-replicate (1-Bucket-Theta, Okcan &
    * Riedewald SIGMOD'11) SHUFFLE join: the a side replicates its
    * ~40 B/doc sketch across nBuckets salt values, the b side hashes
    * into one bucket, and both sides shuffle-partition on
    * (lang, bucket) — parallelism is langs x nBuckets at any corpus
    * size and NOTHING corpus-sized is broadcast (the earlier
    * broadcast-probe variant shipped the whole sketch table to every
    * executor, which grows linearly with the corpus and breaks the
    * 100 TB contract). Shuffle volume is nBuckets x sketch bytes —
    * linear with a tunable constant; the O(Σ|lang-block|²) compare
    * cost is inherent to EXACT jaccard (prefix filtering degenerates
    * on this corpus: 31-token vocabulary => every token is in ~75% of
    * docs, so candidate volume exceeds brute force). The sublinear
    * scale path stays [[dedupMinhashLsh]].
    */
  def dedupNearJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nBuckets = 32
    val t = tokenHashes(spark, sfDir)
    val b = t.select($"doc_id".as("id_b"), $"lang".as("lang_b"),
      $"th".as("th_b"), $"sz".as("sz_b"),
      pmod($"doc_id", lit(nBuckets)).as("bkt_b"))
    val a = t.withColumn("bkt", explode(array((0 until nBuckets).map(lit): _*)))
      .select($"doc_id".as("id_a"), $"lang", $"th".as("th_a"),
        $"sz".as("sz_a"), $"bkt")
    // jac >= 0.8 as integer math (9·|A∩B| >= 4·(|A|+|B|)) placed LAST
    // in the join condition: a separate filter(jac >= t) gets pushed
    // into the join as the FIRST conjunct and runs the intersect
    // kernel before the cheap id/size prunes (see dedupNgramJaccard).
    a.join(b,
        $"lang" === $"lang_b" && $"bkt" === $"bkt_b" && $"id_a" < $"id_b" &&
        // size-ratio prefilter: jaccard >= 0.8 forces 5*min >= 4*max
        $"sz_a" * 5 >= $"sz_b" * 4 && $"sz_b" * 5 >= $"sz_a" * 4 &&
        isect($"th_a", $"th_b") * 9 >= ($"sz_a" + $"sz_b") * 4)
      .withColumn("inter", isect($"th_a", $"th_b"))
      .select($"id_a", $"id_b",
        round($"inter".cast(DoubleType) / ($"sz_a" + $"sz_b" - $"inter"), 6)
          .as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  /** Scalable near-dup: banded MinHash (Broder's min-wise hashing with
    * the classic r×b AND/OR band amplification — shingle → minhash →
    * band → bucket-join), built from first principles because MLlib's
    * MinHashLSH only OR-amplifies (r=1) — on a self-similar corpus
    * that degenerates to an all-pairs join. Here r=4 rows per band ×
    * b=3 bands: a pair collides in a band only if all 4 minhashes
    * agree (P = j^4 per band), so candidate volume tracks the true
    * near-dup density, not n². Candidates are then verified with the
    * exact two-pointer jaccard and filtered at 0.8 — output is a
    * high-recall subset of dedup_near_jaccard (recall asserted in
    * LlmSpec). No oracle: bucketing is hash-family specific.
    */
  def dedupMinhashLsh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rows = 4; val bands = 3
    // The per-doc sketch (sz + sorted 64-bit token hashes) is the ONLY
    // corpus pass. All rows×bands minhashes AND the per-band signature
    // fold are one compiled pass over the token-hash array
    // (graft_bandsigs — graft.expressions.MinHashBandSigs; replaced
    // the k interpreted array_min(transform(...)) HOFs re-evaluated
    // per band branch, and the concat_ws string signature, with k
    // running minima and a 64-bit chained sig). posexplode fans the
    // `bands` signatures out to (band, sig) rows — no bands-way union,
    // so the corpus is scanned once, not `bands` times.
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val sk = tokenHashes(spark, sfDir)
    // SLIM candidate join (round-11 A/B, kept winner): the bucket
    // shuffle carries only (band, sig, doc_id, sz) — the fused round-9
    // variant rode the full th token-hash array through the shuffle b×
    // per side and re-evaluated the intersect kernel twice per
    // surviving row, and its 3×-replicated arrays were the board's
    // worst GC driver (6.9 s of the sweep's gc_ms). Candidates
    // distinct FIRST (collapsing band multiplicity before any array
    // work), then ONE exact verification per unique pair after a
    // re-join to the sketch table. The bucket shuffle is O(corpus × b);
    // the verify stage is O(candidates) — and on THIS corpus that is
    // the honest, irreducible cost: at sf0.1, 5,000 documents yield
    // 2.46 MILLION verified pairs (j >= 0.8 holds for ~20% of ALL
    // pairs — the synthetic corpus is pathologically self-similar), so
    // the pair join materializes 2.5M rows each carrying two th
    // arrays, and the jvm GC time the driver benches attribute here
    // (~2.6 s over 3 runs) is those short-lived per-pair arrays, not a
    // fixable plan defect. The round-11 A/B note's "0.55 s / ~0 gc"
    // was a contended-session artifact and is retracted; measured
    // round 13 isolated: ~1.5 s med. A round-13 A/B pruning the
    // sketch re-join to candidate ids (semi-join + eager-checkpointed
    // candIds) measured 4.1 s — WORSE, because every doc is a
    // candidate here, so the prune buys nothing and the checkpoint
    // adds a job. On a realistic corpus (near-dup density << 1) the
    // same candidate-count argument makes this shape sublinear; the
    // output volume, not the plan, is what a 100 TB run must budget.
    // NO broadcast anywhere — every side is corpus-sized except the
    // candidate list, which is data-dependent and may be too. Skew on
    // identical-doc signatures is AQE skew-join territory.
    val buckets = sk
      .select($"doc_id", $"sz",
        posexplode(call_function("graft_bandsigs", $"th", lit(rows), lit(bands))))
      .select($"doc_id", $"sz", $"pos".as("band"), $"col".as("sig"))
    val candIds = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.doc_id") < col("y.doc_id") &&
        // size-ratio prune (j >= 0.8 forces 5*min >= 4*max)
        col("x.sz") * 5 >= col("y.sz") * 4 &&
        col("y.sz") * 5 >= col("x.sz") * 4)
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val sa = sk.select($"doc_id".as("id_a"), $"th".as("th_a"), $"sz".as("sz_a"))
    val sb = sk.select($"doc_id".as("id_b"), $"th".as("th_b"), $"sz".as("sz_b"))
    candIds.join(sa, Seq("id_a")).join(sb, Seq("id_b"))
      .withColumn("inter", isect($"th_a", $"th_b"))
      // jac >= 0.8 as integer math — exact two-pointer intersect, once
      .filter($"inter" * 9 >= ($"sz_a" + $"sz_b") * 4)
      .select($"id_a", $"id_b",
        round($"inter".cast(DoubleType) / ($"sz_a" + $"sz_b" - $"inter"), 6)
          .as("jaccard"))
      .orderBy($"id_a", $"id_b")
  }

  // ---- similarity search ----

  /** embeddings with the norm precomputed once per side. */
  private[ops] def embeddingsWithNorm(spark: SparkSession, sfDir: String): DataFrame =
    withNorm(spark, sfDir)

  private def withNorm(spark: SparkSession, sfDir: String): DataFrame = {
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        sqrt(dot(col("embedding"), col("embedding"))).as("nrm"))
  }

  /** All-pairs generator on a G×G grid: row x lands in grid row
    * x mod G and replicates across all G columns; row y lands in grid
    * column y mod G and replicates across all G rows, so every
    * unordered pair (x < y) meets in EXACTLY ONE cell — an equi-join
    * key on (gr, gc), hence a shuffle hash/merge join with the cheap
    * id order as residual. NO broadcast: shuffle volume is G × corpus
    * and the O(n²) compare work spreads evenly across G² cells; G
    * scales as sqrt(cluster parallelism). Every non-id column of the
    * input is emitted twice, suffixed `_a` / `_b`.
    */
  private[ops] def gridPairs(df0: DataFrame, idCol: String, g: Int): DataFrame = {
    // Round 20: the O(n²) compare work happens INSIDE this join, and a
    // single-split input serialized it — at bench scale the planner
    // broadcasts the (small) b side, so the stream side's task count IS
    // the scan's split count: ONE (measured: sim_euclidean_topk 1.1 s,
    // 3 jobs, ZERO shuffle records). Guard the stream side's
    // parallelism before the explode (no-op once the scan splits;
    // ScaleTechniques.ensureParallelism).
    val df = ScaleTechniques.ensureParallelism(df0)
    val payload = df.columns.filter(_ != idCol)
    val cells = array((0 until g).map(lit): _*)
    val a = df.withColumn("gc", explode(cells))
      .select(col(idCol).as("id_a") +: pmod(col(idCol), lit(g)).as("gr") +:
        col("gc") +: payload.map(c => col(c).as(s"${c}_a")): _*)
    val b = df.withColumn("gr_b", explode(cells))
      .select(col(idCol).as("id_b") +: col("gr_b") +:
        pmod(col(idCol), lit(g)).as("gc_b") +: payload.map(c => col(c).as(s"${c}_b")): _*)
    a.join(b, col("gr") === col("gr_b") && col("gc") === col("gc_b") &&
        col("id_a") < col("id_b"))
      .drop("gr", "gc", "gr_b", "gc_b")
  }

  /** Brute-force cosine top-20 pairs — the exactness baseline for ANN.
    * Pair generation is the G×G grid SHUFFLE join (gridPairs) — no
    * corpus broadcast, so the plan shape survives an unbounded table
    * swap — and the top-20 is TakeOrderedAndProject: each cell keeps
    * its local top-20 map-side and only G² × 20 candidate rows reach
    * the driver-side merge. The scale path for open-ended corpora is
    * the LSH-bucketed variant (sim_ann_lsh).
    *
    * QUADRATIC BY CONTRACT (round-14 scale probe: 85× time at 10×
    * data — exactly the n² pair count): this op's declared output is
    * the EXACT global top-20, the ground truth every ANN op's recall
    * pin (LlmSpec, Round8Spec, Round12Spec) is measured against, so it
    * cannot sample. At 100 TB a user runs sim_ann_lsh / sim_ann_ivf /
    * sim_ann_pq (all linear probe shapes in this repo) and accepts
    * their pinned recall; this baseline exists to CALIBRATE them on a
    * slice.
    */
  def simCosineTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = withNorm(spark, sfDir)
    gridPairs(t, "vec_id", 8)
      .withColumn("cos", dot($"embedding_a", $"embedding_b") / ($"nrm_a" * $"nrm_b"))
      .orderBy($"cos".desc, $"id_a", $"id_b")
      .limit(20)
      .select($"id_a", $"id_b", round($"cos", 6).as("cosine"))
  }

  /** k=10 nearest neighbors of the probe vector (vec_id = 0). */
  def simKnnQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = withNorm(spark, sfDir)
    val probe = t.filter($"vec_id" === 0)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    t.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .withColumn("cos", dot($"embedding", $"pe") / ($"nrm" * $"pn"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(10)
      .select($"vec_id", round($"cos", 6).as("cosine"))
  }

  // ---- text analysis ----

  /** Global term frequencies, top-50. explode() is Spark's Generator
    * (UDTF) path; counts partial-aggregate before the shuffle.
    */
  def textTokenizeTf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .select(explode(split($"text", " ")).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"term")
      .limit(50)
  }

  /** Top-30 bigrams per language (sequence+transform zip of the token
    * array, then the top-k-per-group window pattern).
    */
  def textNgramBigrams(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bg = documents(spark, sfDir)
      .withColumn("t", split($"text", " "))
      .filter(size($"t") >= 2)
      .select($"lang", explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
      )).as("bigram"))
      .groupBy($"lang", $"bigram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"bigram")
    bg.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 30)
      .orderBy($"lang", $"rn")
  }

  def textStatsPerSource(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        (sum($"n_chars").cast(DoubleType) / count(lit(1))).as("avg_chars"),
        countDistinct($"lang").as("n_langs"),
        max_by($"doc_id", struct($"n_chars", $"doc_id")).as("longest_doc"))
      .orderBy($"source")
  }

  /** Pack doc metadata + computed stats into a struct, emit unpacked
    * columns + the to_json rendering.
    */
  def multimodalStructJson(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .withColumn("meta", struct(
        $"doc_id".as("id"), $"lang",
        size(split($"text", " ")).cast(LongType).as("n_tokens"),
        $"n_chars"))
      .select($"doc_id", $"meta.lang".as("lang"),
        $"meta.n_tokens".as("n_tokens"), to_json($"meta").as("js"))
      .orderBy($"doc_id")
  }
}
