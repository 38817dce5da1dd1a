package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-9 widening: partition-share analytics, the transformWithState
  * batch mirror, calendar arithmetic, URL canonicalization dedup, and
  * the dataset-card profile. Same contract as every other ops file:
  * declarative plans, SURVEY §7d determinism protocol (exact DECIMAL
  * accumulation, ln-rounded-to-9dp decimal moments, doubles only as
  * final casts, total ORDER BY).
  */
object Round9Ops {

  /** Ratio-to-report: each customer's share of its market segment's
    * total balance and of the grand total — the classic contribution
    * report. Segment shares ride ONE partitioned window on the segment
    * key; the grand total is a 1-row broadcast cross join (never an
    * unpartitioned window — PlanSpec's board sweep). Balances
    * accumulate in exact DECIMAL; both engines derive the same doubles
    * before the one rounded division, so shares tie out bit-for-bit.
    */
  def winRatioToReport(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment", money($"c_acctbal").as("bal"))
    val grand = c.agg(sum($"bal").as("grand"))
    // segment totals as a 5-row broadcast rollup, not a window: a
    // Window.partitionBy(c_mktsegment) would cap parallelism at the 5
    // segments and SORT each n/5 slice for no reason (round-16
    // low-card-window sweep); the rollup-join form is a two-phase
    // aggregate plus a map-side join at any scale
    val segTot = c.groupBy($"c_mktsegment".as("seg"))
      .agg(sum($"bal").as("seg_total"))
    c.join(broadcast(segTot), $"c_mktsegment" === $"seg")
      .crossJoin(broadcast(grand))
      .select($"c_custkey", $"c_mktsegment",
        $"bal".cast(DoubleType).as("acctbal"),
        // floor-quantization (floor(x·1e6 + 0.5)/1e6) instead of
        // round(): both engines run the identical IEEE multiply/add/
        // floor sequence, so a share that lands EXACTLY on a 5e-7
        // boundary (or at −0.0, which round() signs differently across
        // engines) cannot diverge
        (floor($"bal".cast(DoubleType) / $"seg_total".cast(DoubleType)
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("share_segment"),
        (floor($"bal".cast(DoubleType) / $"grand".cast(DoubleType)
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("share_total"))
      .orderBy($"c_custkey")
  }

  /** Batch mirror of [[Streaming.statefulUserTotalsTws]]'s Append-mode
    * emission log: events arrive as three deterministic micro-batches
    * (event_id mod 3 = arrival trigger), and each (user, batch) row
    * carries the CUMULATIVE totals the processor would emit at that
    * trigger. The cumulative pass is a window on the user partitioning
    * (state per key, exactly the StateStore contract); the real
    * incremental path is asserted in StreamingSpec with RocksDB state.
    */
  def streamStatefulTotals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val batches = events(spark, sfDir)
      .select($"user_id", pmod($"event_id", lit(3)).as("batch_id"),
        money($"value").as("v"))
      .groupBy($"user_id", $"batch_id")
      .agg(count(lit(1)).as("bn"), sum($"v").as("bs"))
    val w = Window.partitionBy($"user_id").orderBy($"batch_id")
    batches
      .select($"user_id", $"batch_id",
        sum($"bn").over(w).as("n_events"),
        sum($"bs").over(w).cast(DoubleType).as("sum_value"))
      .orderBy($"user_id", $"batch_id")
  }

  /** Calendar arithmetic surface: month shifting (end-of-month
    * clamped), month boundaries, quarter/ISO-weekday/day-of-year
    * fields, quarter truncation — the date dimensions every
    * time-partitioned warehouse derives at ingest. All functions are
    * codegen'd column expressions; ISO weekday is written as
    * weekday()+1 (Mon=1..Sun=7) because the engines' native dayofweek
    * numberings disagree (Spark Sun=1 vs DuckDB Sun=0) while the ISO
    * numbering is shared.
    */
  def fnDatetimeExtras(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey",
        add_months($"o_orderdate".cast(DateType), 3).as("plus3m"),
        last_day($"o_orderdate".cast(DateType)).as("month_end"),
        quarter($"o_orderdate").cast(LongType).as("q"),
        (weekday($"o_orderdate".cast(DateType)) + 1).cast(LongType).as("isodow"),
        dayofyear($"o_orderdate").cast(LongType).as("doy"),
        // DATE on both engines (DuckDB's quarter-trunc returns DATE)
        date_trunc("quarter", $"o_orderdate").cast(DateType).as("q_start"))
      .orderBy($"o_orderkey")
  }

  /** URL canonicalization dedup — the crawl-frontier primitive: the
    * same resource arrives under scheme/host case variants, a www
    * prefix, an explicit default port, a trailing slash, tracking
    * params, and fragments; canonicalization collapses them so the
    * frontier dedups on ONE key. Synthetic-but-messy URLs are derived
    * deterministically from documents (path = doc_id mod 50, so real
    * collisions exist); every normalization step is a character-class
    * regex or plain replace, shared verbatim by both engines. Shuffle
    * is on the canonical key — corpus-partitioned, no driver state.
    */
  def dedupUrlCanonicalize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val urls = documents(spark, sfDir).select($"doc_id",
      concat(
        when(pmod($"doc_id", lit(3)) === 0, lit("HTTPS://WWW."))
          .when(pmod($"doc_id", lit(3)) === 1, lit("https://"))
          .otherwise(lit("https://www.")),
        $"source", lit(".Example.COM"),
        when(pmod($"doc_id", lit(2)) === 0, lit(":443")).otherwise(lit("")),
        lit("/doc/"), pmod($"doc_id", lit(50)).cast(StringType),
        when(pmod($"doc_id", lit(4)) === 0, lit("/")).otherwise(lit("")),
        when(pmod($"doc_id", lit(5)) === 0, lit("?utm_source=feed&utm_campaign=x"))
          .otherwise(lit("")),
        when(pmod($"doc_id", lit(7)) === 0, lit("#sec2")).otherwise(lit("")))
        .as("url"))
    urls
      .withColumn("canon",
        regexp_replace( // trailing slash last, after query/fragment strip
          regexp_replace(
            regexp_replace(lower($"url"), "#.*", ""),
            "\\?utm.*", ""),
          "/$", ""))
      .withColumn("canon", regexp_replace($"canon", ":443", ""))
      .withColumn("canon", regexp_replace($"canon", "://www\\.", "://"))
      .groupBy($"canon")
      .agg(count(lit(1)).as("n_aliases"),
        min($"doc_id").as("canonical_doc"),
        countDistinct($"url").as("n_distinct_raw"))
      .orderBy($"canon")
  }

  /** Product-quantization ANN — the memory tier beyond int8
    * (sim_embedding_quantize): 64 float32 dims compress to m=4 byte
    * codes (64× smaller), one codeword per 16-dim subspace from a
    * k=16 codebook. Codebooks are data-sampled (first k vectors'
    * slices — the IVF-centroid convention; engine-specific, so this is
    * a ScalaTest-recall op, no oracle). Search is ADC: the query's dot
    * product against every codeword (m·k = 64 values, broadcast)
    * is summed per vector along its code — candidates never touch
    * float embeddings — then the top-100 candidates re-rank EXACTLY
    * through the compiled graft_dot kernel. Scale shape: encoding is
    * corpus×m rows against a broadcast codebook with a (vec_id, j)-
    * partitioned argmin window; search is a broadcast join on the
    * 64-row ADC table + TakeOrderedAndProject; nothing corpus-sized
    * ships, no driver state.
    */
  def simAnnPq(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = 4; val subDim = 16; val k = 16
    val t = LlmOps.embeddingsWithNorm(spark, sfDir)
    def subs(df: DataFrame): DataFrame =
      df.select($"vec_id", posexplode(array((0 until m).map(j =>
        slice($"embedding", j * subDim + 1, subDim)): _*)).as(Seq("j", "sub")))
    val cb = subs(t.filter($"vec_id" < k))
      .select($"j", $"vec_id".as("cid"), $"sub".as("csub"))
      .withColumn("cn2", LlmOps.dot($"csub", $"csub"))
    // encode: nearest codeword per (vector, subspace) by L2 distance
    val enc = subs(t)
      .join(broadcast(cb), Seq("j"))
      .withColumn("d2",
        $"cn2" - lit(2.0) * LlmOps.dot($"sub", $"csub") +
          LlmOps.dot($"sub", $"sub"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id", $"j").orderBy($"d2", $"cid")))
      .filter($"rn" === 1)
      .select($"vec_id", $"j", $"cid")
    // ADC table: query-subvector · codeword for all m·k codewords
    val probeSubs = subs(t.filter($"vec_id" === 0))
      .select($"j", $"sub".as("qsub"))
    val adc = cb.join(broadcast(probeSubs), Seq("j"))
      .select($"j", $"cid", LlmOps.dot($"qsub", $"csub").as("qdot"), $"cn2")
    val cand = enc.join(broadcast(adc), Seq("j", "cid"))
      .groupBy($"vec_id")
      .agg(sum($"qdot").as("approx_ip"), sqrt(sum($"cn2")).as("recon_nrm"))
      .filter($"vec_id" =!= 0)
      .orderBy(($"approx_ip" / $"recon_nrm").desc, $"vec_id")
      .limit(100)
      .select($"vec_id")
    val probe = t.filter($"vec_id" === 0)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    t.join(broadcast(cand), Seq("vec_id"))
      .crossJoin(broadcast(probe))
      .withColumn("cos", LlmOps.dot($"embedding", $"pe") / ($"nrm" * $"pn"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(10)
      .select($"vec_id", round($"cos", 6).as("cosine"))
  }

  /** Dataset-card profile — the per-source numbers a training-data
    * release documents: volume, token count, language spread and its
    * Shannon entropy, mean document length. Entropy follows the
    * ln-protocol (text_perplexity / text_zipf): H = ln(N) − (Σ n_l ·
    * ln n_l)/N with every ln rounded to 9dp and accumulated in exact
    * DECIMAL, converted to double once — so two engines' libm
    * differences cannot reach the output. Shuffles are (source, lang)-
    * bounded: vocabulary-of-languages scale, not corpus scale.
    */
  def pipelineDatasetCard(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = documents(spark, sfDir)
      .select($"source", $"lang", $"n_chars",
        size(split($"text", " ")).cast(LongType).as("n_tokens"))
    val perSrc = d.groupBy($"source").agg(
      count(lit(1)).as("n_docs"),
      sum($"n_tokens").as("total_tokens"),
      sum($"n_chars").as("total_chars"))
    val entTerms = d.groupBy($"source", $"lang")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"source")
      .agg(countDistinct($"lang").as("n_langs"),
        // cnt as DECIMAL(9,0): a LONG multiplicand needs 20+27+1 = 48
        // digits, over Spark's 38-digit cap, and the overflow silently
        // RESHRINKS the product scale (allowPrecisionLoss) — the two
        // engines would accumulate at different precision. 9+27+1 = 37
        // keeps the product exact at scale 9 on both. The guard makes
        // a count past the 1e9 ceiling FAIL LOUDLY: with ANSI off
        // Spark's overflowing decimal cast yields NULL (silently
        // nulling s_nlnn) while DuckDB's raises — the engines would
        // diverge silently instead of erroring.
        sum(when($"cnt" <= 999999999L, $"cnt")
          .otherwise(raise_error(concat(
            lit("pipeline_dataset_card: per-(source,lang) count "),
            $"cnt".cast(StringType), lit(" overflows DECIMAL(9,0)"))))
          .cast(DecimalType(9, 0)) *
          round(log($"cnt".cast(DoubleType)), 9)
            .cast(DecimalType(27, 9))).as("s_nlnn"))
    // floor-quantization instead of round() for the final digits: with
    // N = 25 docs the pre-round value is an EXACT decimal, so it can sit
    // exactly on the half boundary where Spark's BigDecimal HALF_UP and
    // DuckDB's multiply-based round disagree; floor(x·1e6 + 0.5) is the
    // identical IEEE sequence on both engines
    perSrc.join(entTerms, Seq("source"))
      .select($"source", $"n_docs", $"total_tokens", $"n_langs",
        (floor((
          round(log($"n_docs".cast(DoubleType)), 9).cast(DecimalType(28, 9))
            .cast(DoubleType) -
            $"s_nlnn".cast(DoubleType) / $"n_docs".cast(DoubleType))
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("lang_entropy"),
        (floor($"total_chars".cast(DoubleType) / $"n_docs".cast(DoubleType)
          * lit(1e4) + lit(0.5)) / lit(1e4)).as("avg_chars"))
      .orderBy($"source")
  }

  /** ORDER BY ALL + GROUP BY ALL together — the DuckDB-originated SQL
    * shorthand Spark adopted (grouping keys inferred from the select
    * list, total order over every output column). Same physical plan
    * as the explicit form: two-phase hash aggregate + one range
    * exchange for the output sort.
    */
  def sqlOrderByAll(spark: SparkSession, sfDir: String): DataFrame = {
    lineitem(spark, sfDir).createOrReplaceTempView("r9_lineitem_oba")
    spark.sql("""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM r9_lineitem_oba
      GROUP BY ALL
      ORDER BY ALL
    """)
  }

  /** Inverse-frequency class weights — what a trainer feeds its loss
    * to rebalance skewed labels: w_c = N / (K · n_c). Per-class counts
    * are one partial-aggregated shuffle; the (N, K) totals row rides a
    * broadcast cross join. The weight is one shared double expression
    * floor-quantized at 6dp (the round-9 engine-tie protocol).
    */
  def pipelineLabelBalanceWeights(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = embeddings(spark, sfDir)
    val tot = t.agg(count(lit(1)).as("n_total"),
      countDistinct($"label").as("n_classes"))
    t.groupBy($"label").agg(count(lit(1)).as("n_examples"))
      .crossJoin(broadcast(tot))
      .select($"label", $"n_examples",
        (floor($"n_total".cast(DoubleType) /
          ($"n_classes" * $"n_examples").cast(DoubleType)
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("class_weight"))
      .orderBy($"label")
  }

  /** Feed-freshness audit — the staleness dashboard every ingestion
    * pipeline keeps: per event type, volume, last event time, and the
    * lag behind the freshest feed in EXACT integer microseconds
    * (unix_micros both sides; a fractional-minutes double would
    * reopen the division-rounding can). The global max is a broadcast
    * 1-row cross join over the per-type aggregate — never a second
    * scan, never an unpartitioned window.
    */
  def pipelineFreshnessAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val perType = events(spark, sfDir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_events"), max($"ts").as("last_ts"))
    val freshest = perType.agg(max($"last_ts").as("global_last"))
    perType.crossJoin(broadcast(freshest))
      .select($"event_type", $"n_events", $"last_ts",
        (expr("unix_micros(CAST(global_last AS TIMESTAMP))") -
          expr("unix_micros(CAST(last_ts AS TIMESTAMP))")).as("staleness_us"))
      .orderBy($"event_type")
  }

  /** Population Stability Index between the first and second half of
    * the events stream — the drift monitor that decides when a model
    * needs retraining: PSI = Σ (p_i − q_i)·ln(p_i/q_i) over 10 fixed
    * value buckets (width 50, clamped). Counts are exact integers, so
    * p, q and p/q are identical doubles on both engines; each ln rides
    * the 9dp-round protocol and each TERM is 12dp-quantized into exact
    * DECIMAL before the cross-bucket sum, so accumulation order cannot
    * shift the total. Only buckets populated on both sides contribute
    * (standard PSI practice); the audit reports how many were used.
    */
  def pipelineDriftPsi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val mid = ntz("2024-01-15 00:00:00")
    val bucketed = events(spark, sfDir)
      .select(
        when($"ts" < mid, lit("a")).otherwise(lit("b")).as("half"),
        least(lit(9), floor($"value" / 50).cast(IntegerType)).as("bucket"))
    val counts = bucketed.groupBy($"bucket")
      .agg(count(when($"half" === "a", 1)).as("na"),
        count(when($"half" === "b", 1)).as("nb"))
    val tot = counts.agg(sum($"na").as("ta"), sum($"nb").as("tb"))
    counts.crossJoin(broadcast(tot))
      .filter($"na" > 0 && $"nb" > 0)
      .select(
        (($"na".cast(DoubleType) / $"ta".cast(DoubleType)) -
          ($"nb".cast(DoubleType) / $"tb".cast(DoubleType))).as("pq"),
        round(log(($"na".cast(DoubleType) / $"ta".cast(DoubleType)) /
          ($"nb".cast(DoubleType) / $"tb".cast(DoubleType))), 9)
          .cast(DecimalType(28, 9)).cast(DoubleType).as("lnr"))
      // per-term 12dp quantization uses the same floor(x·1eN + 0.5)
      // IEEE sequence as the final psi — round(x, 12) is the exact
      // pattern the round-9 SCALE.md lesson flags as divergent on
      // exact-decimal half boundaries (Spark BigDecimal HALF_UP vs
      // DuckDB multiply-based rounding). PSI terms are always >= 0
      // (sign(p-q) = sign(ln(p/q))), so floor(x+0.5) IS half-up here.
      .select((floor(($"pq" * $"lnr") * lit(1e12) + lit(0.5)) / lit(1e12))
        .cast(DecimalType(24, 12)).as("term"))
      .agg(count(lit(1)).as("n_buckets_used"),
        (floor(sum($"term").cast(DoubleType) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("psi"))
  }


  /** Runtime bloom-filter join — Spark's InjectRuntimeFilter: the
    * selective (filtered) side's join keys build a bloom filter DURING
    * the query, and the probe side's scan applies might_contain BEFORE
    * the shuffle, so rows that cannot join never ship. This is the
    * shuffle-reduction tier between static pushdown and DPP: at 100 TB
    * it turns "shuffle the whole fact table" into "shuffle the ~2%
    * that can match". The isolated session disables broadcast (the
    * big-big shape bloom exists for) and drops the application-side
    * size threshold (10 GB by default — sized for real clusters, not
    * sf0.01); creation-side limits stay stock. PlanSpec pins the
    * injected filter; the oracle proves result-identity with the plain
    * join.
    */
  def scaleRuntimeBloomJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s2.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s2.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val o = orders(s2, sfDir)
      .filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_custkey")
    val l = lineitem(s2, sfDir)
      .select($"l_orderkey", money($"l_extendedprice").as("price"))
    l.join(o, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_items"),
        sum($"price").cast(DoubleType).as("revenue"))
      .orderBy($"o_custkey")
  }

  /** Existence-flag (mark) join: every customer annotated with whether
    * any order exists — the EXISTS-in-projection shape (DuckDB plans
    * it as a MARK join). Spark's rendering: distinct the probe keys
    * (one partial-aggregated shuffle, so a customer with 1000 orders
    * contributes ONE row — no fan-out), left join, coalesce the flag.
    * Unlike a semi join it keeps non-matching rows; unlike a raw left
    * join it cannot duplicate.
    */
  def joinMarkExistence(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val flags = orders(spark, sfDir)
      .select($"o_custkey").distinct()
      .withColumn("has_orders", lit(true))
    customer(spark, sfDir)
      .join(flags, $"c_custkey" === $"o_custkey", "left")
      .select($"c_custkey", $"c_mktsegment",
        coalesce($"has_orders", lit(false)).as("has_orders"))
      .orderBy($"c_custkey")
  }

}
