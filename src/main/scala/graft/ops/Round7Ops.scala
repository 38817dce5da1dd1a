package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 widening, part 2: the remaining training-data-pipeline and
  * analytics primitives — temperature-weighted source mixture
  * sampling, Gopher-style repetition quality signals, SCD2 history
  * construction (gaps-and-islands), an ordered conversion funnel,
  * dataset snapshot diffing, and the cumulative-distribution window
  * functions.
  */
object Round7Ops {

  /** Temperature-weighted mixture sampling over a skewed corpus: each
    * language is down-sampled at rate min(1, c / sqrt(n_lang)) — the
    * alpha = 0.5 temperature curve that flattens a head-heavy source
    * mix for training-data balance (en is ~3x zh here, so its rate is
    * ~sqrt(3)x lower). The per-row coin is the md5-prefix idiom from
    * sample_stratified, but the threshold is COMPUTED from the data:
    * floor(rate * 65536) rendered as 4 lowercase hex digits and
    * compared against the first 4 md5 hex chars — integer arithmetic
    * on a correctly-rounded IEEE sqrt/divide, so Spark and DuckDB
    * derive bit-identical thresholds. rate >= 1 maps to a sentinel
    * above every hex string (lpad would silently truncate '10000').
    *
    * Scale shape: one groupBy(lang) count (5 rows), broadcast back,
    * one codegen'd filter, one final aggregate — the sample itself
    * never leaves the executors; a 100 TB corpus pays two partial-agg
    * passes and no wide shuffle beyond the 5-key count.
    */
  def pipelineMixtureSample(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rates = documents(spark, sfDir).groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("rate", least(lit(1.0), lit(6.0) / sqrt($"n_docs")))
      .withColumn("threshold",
        when($"rate" >= 1.0, lit("zzzz"))
          .otherwise(lpad(lower(hex(floor($"rate" * 65536).cast(LongType))), 4, "0")))
    documents(spark, sfDir)
      .join(broadcast(rates), Seq("lang"))
      .withColumn("picked",
        substring(md5($"doc_id".cast(StringType)), 1, 4) < $"threshold")
      .groupBy($"lang")
      .agg(first($"n_docs").as("n_docs"),
        round(first($"rate"), 6).as("rate"),
        sum(when($"picked", 1L).otherwise(0L)).as("n_sampled"),
        sum(when($"picked", $"doc_id")).as("id_checksum"))
      .orderBy($"lang")
  }

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1:
    * repetitious documents are low-quality): per document, the
    * fraction of tokens taken by the single most frequent token and
    * the fraction of bigram occurrences that are repeats of an
    * already-seen bigram. Both are computed in the distributed
    * aggregation shape — explode to (doc, term) / (doc, bigram),
    * count, re-aggregate per doc — rather than per-row interpreted
    * HOF loops (the round-3 lesson: interpreted HOFs re-inlined into
    * scan filters cost 5x end-to-end). The keep flag compares the raw
    * exact-rational fractions against constants, so it is engine-tie
    * safe; the reported fractions are rounded for display only.
    */
  def textRepetitionFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("t"))
    val top = toks
      .select($"doc_id", explode($"t").as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_tokens"), max($"c").as("top_token_n"))
    val bigrams = toks
      .filter(size($"t") >= 2)
      .select($"doc_id", explode(expr(
        "transform(sequence(1, size(t) - 1), i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))"
      )).as("bigram"))
      .groupBy($"doc_id", $"bigram").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_bigrams"),
        (sum($"c") - count(lit(1))).as("dup_bigram_n"))
    top.join(bigrams, Seq("doc_id"))
      .withColumn("top_frac", $"top_token_n".cast(DoubleType) / $"n_tokens")
      .withColumn("dup_frac", $"dup_bigram_n".cast(DoubleType) / $"n_bigrams")
      .select($"doc_id", $"n_tokens",
        round($"top_frac", 6).as("top_token_frac"),
        round($"dup_frac", 6).as("dup_bigram_frac"),
        ($"top_frac" < 0.2 && $"dup_frac" < 0.3).as("keep"))
      .orderBy($"doc_id")
  }

  /** SCD2 history construction via gaps-and-islands: each user's event
    * stream is collapsed into runs of consecutive identical
    * event_types, and each run becomes a type-2 validity interval
    * [valid_from, valid_to) with the last run per user open
    * (is_current). Run boundaries come from lag(event_type) and the
    * island id from a running sum of boundary flags — both over the
    * SAME (user_id) partitioning, deliberately NOT the textbook
    * difference-of-row_numbers (whose second row_number partitions by
    * (user, type) and would force a second exchange). Every window
    * orders by (ts, event_id) so ties cannot reorder across engines.
    * This is how a 100 TB dimension history is built from a change
    * log: ONE shuffle on the history key (PlanSpec-pinned), no driver
    * state, no self-join.
    */
  def pipelineScd2(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val runs = events(spark, sfDir)
      .select($"user_id", $"event_type", $"ts", $"event_id")
      .withColumn("boundary",
        when(lag($"event_type", 1).over(byUser).isNull ||
          lag($"event_type", 1).over(byUser) =!= $"event_type", 1L)
          .otherwise(0L))
      .withColumn("island", sum($"boundary").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"event_type", $"island")
      .agg(min($"ts").as("valid_from"), count(lit(1)).as("n_events"))
    val seq = Window.partitionBy($"user_id").orderBy($"valid_from")
    runs
      .withColumn("valid_to", lead($"valid_from", 1).over(seq))
      .select($"user_id", $"event_type".as("status"), $"valid_from",
        $"valid_to", $"valid_to".isNull.as("is_current"), $"n_events")
      .orderBy($"user_id", $"valid_from")
  }

  /** Ordered conversion funnel view -> click -> purchase with a 48 h
    * conversion window per hop: each stage's entry time is the user's
    * first qualifying event STRICTLY AFTER the previous stage's entry
    * and within 48 h of it — the sequential-pattern semantics a flat
    * min-per-type query gets wrong (a purchase before the first view
    * must not count), and the window is what keeps the funnel
    * discriminating (unbounded, every user in a month-long stream
    * trivially converts — the vacuous-result trap). Three per-user
    * aggregates chained by shuffle joins on user_id — each stage is
    * one partial-agg pass over events plus a key-partitioned join, so
    * the funnel depth, not the data volume, bounds the stage count at
    * 100 TB.
    */
  def analyticFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, sfDir).select($"user_id", $"event_type", $"ts")
    val users = e.select($"user_id").distinct()
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("view_ts"))
    val c = e.filter($"event_type" === "click")
      .join(v, Seq("user_id"))
      .filter($"ts" > $"view_ts" &&
        $"ts" <= $"view_ts" + expr("INTERVAL 48 HOURS"))
      .groupBy($"user_id").agg(min($"ts").as("click_ts"))
    val p = e.filter($"event_type" === "purchase")
      .join(c, Seq("user_id"))
      .filter($"ts" > $"click_ts" &&
        $"ts" <= $"click_ts" + expr("INTERVAL 48 HOURS"))
      .groupBy($"user_id").agg(min($"ts").as("purchase_ts"))
    users
      .join(v, Seq("user_id"), "left_outer")
      .join(c, Seq("user_id"), "left_outer")
      .join(p, Seq("user_id"), "left_outer")
      .select($"user_id", $"view_ts", $"click_ts", $"purchase_ts",
        (when($"view_ts".isNotNull, 1).otherwise(0) +
          when($"click_ts".isNotNull, 1).otherwise(0) +
          when($"purchase_ts".isNotNull, 1).otherwise(0)).as("stage"))
      .orderBy($"user_id")
  }

  /** Dataset snapshot diff — the audit step of any incremental 100 TB
    * ingestion: v2 is derived deterministically from orders (keys
    * % 13 == 0 removed, % 7 == 0 repriced at +10%, % 17 == 0 cloned
    * to a shifted new key), then one FULL OUTER join on the key
    * classifies every row as added / removed / changed and emits only
    * the non-identical rows. The +10% reprice is the same IEEE double
    * multiply on both engines, so changed-row detection is an exact
    * comparison, not a tolerance. Unchanged rows (the overwhelming
    * majority at scale) are filtered before the output sort.
    */
  def pipelineDatasetDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val v1 = orders(spark, sfDir).select($"o_orderkey".as("key"),
      $"o_totalprice".as("price"))
    val kept = v1.filter(pmod($"key", lit(13)) =!= 0)
    val v2 = kept
      .withColumn("price",
        when(pmod($"key", lit(7)) === 0, $"price" * 1.1).otherwise($"price"))
      .unionAll(kept.filter(pmod($"key", lit(17)) === 0)
        .select(($"key" + 2000000000L).as("key"), $"price"))
    v1.select($"key", $"price".as("old_price"))
      .join(v2.select($"key", $"price".as("new_price")), Seq("key"), "full_outer")
      .withColumn("change_type",
        when($"old_price".isNull, "added")
          .when($"new_price".isNull, "removed")
          .when($"old_price" =!= $"new_price", "changed")
          .otherwise("unchanged"))
      .filter($"change_type" =!= "unchanged")
      .select($"key", $"change_type", $"old_price", $"new_price")
      .orderBy($"key")
  }

  /** Cumulative-distribution window functions: percent_rank and
    * cume_dist of each order's price within its priority class, plus
    * a decile bucket. The rank window is value-ordered only — ties get
    * identical ranks on both engines by SQL semantics — while ntile,
    * which splits by POSITION and is therefore tie-unstable, gets its
    * own key-tiebroken ordering (the data has a real price tie). Both
    * windows share one partitioning: a single shuffle, two sorts.
    */
  def winCumeDist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice")
    val wTie =
      Window.partitionBy($"o_orderpriority").orderBy($"o_totalprice", $"o_orderkey")
    orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority", $"o_totalprice",
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        ntile(10).over(wTie).as("decile"))
      .orderBy($"o_orderkey")
  }
}
