package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 widening: rate-limited file-ingest restart ledger (the
  * batch mirror of StreamingSpec's real maxFilesPerTrigger +
  * crash-replay run) and further surface growth.
  */
object Round10Ops {

  /** Batch mirror of the rate-limited landing-zone ingest
    * (StreamingSpec runs the real thing: a parquet landing dir, a
    * file-source stream with maxFilesPerTrigger=2 under AvailableNow,
    * an injected crash after the first trigger, restart from the SAME
    * checkpoint, and an idempotent replace-by-epoch sink — asserting
    * every row lands exactly once and the replayed epoch is not
    * duplicated). Here events arrive as 6 deterministic "files"
    * (event_id mod 6) and the 2-file rate limit folds them into 3
    * triggers; each (trigger, event_type) row carries that trigger's
    * arrivals and the cumulative ingested count — the exactly-once
    * ledger a restart must reproduce. Counts are exact integers
    * (no decimal protocol needed); the cumulative pass is a window on
    * the event_type partitioning, incremental state per key at scale.
    */
  def streamFileIngestRestart(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val arrivals = events(spark, sfDir)
      .select($"event_type",
        floor(pmod($"event_id", lit(6)) / lit(2)).cast(LongType).as("trigger"))
      .groupBy($"trigger", $"event_type")
      .agg(count(lit(1)).as("n_arrived"))
    arrivals
      .withColumn("n_total",
        sum($"n_arrived").over(
          Window.partitionBy($"event_type").orderBy($"trigger")))
      .select($"trigger", $"event_type", $"n_arrived", $"n_total")
      .orderBy($"trigger", $"event_type")
  }

  /** Sub-document exact dedup (the C4/RefinedWeb line-level pass):
    * documents are cut into non-overlapping 4-token segments, each
    * segment is hashed, and segments appearing 2+ times across the
    * corpus are reported with a survivorship decision (keep the
    * lowest doc_id). Shape: explode → hash-groupBy — the shuffle
    * carries (hash, doc_id) pairs only, linear in corpus token count,
    * no pairwise work; at 100 TB this is exactly the map-side-hash /
    * reduce-side-census plan the whole-doc dedup_exact_hash runs, one
    * granularity down. md5 hex keeps the hash portable to the oracle.
    */
  def dedupSegmentExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val segWidth = 4
    val seg = documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("toks"))
      .filter(size($"toks") >= segWidth)
      .select($"doc_id", $"toks",
        posexplode(sequence(lit(0),
          (size($"toks") / lit(segWidth)).cast(IntegerType) - 1)))
      .select($"doc_id",
        md5(array_join(
          slice($"toks", $"col" * segWidth + 1, lit(segWidth)), " "))
          .as("seg_hash"))
    seg.groupBy($"seg_hash")
      .agg(count(lit(1)).as("n_copies"),
        countDistinct($"doc_id").as("n_docs"),
        min($"doc_id").as("keep_doc"))
      .filter($"n_copies" >= 2)
      .orderBy($"seg_hash")
  }

  /** Gaps-and-islands: per-user activity runs where consecutive events
    * are ≤ 10 minutes apart — the lag-compare + running-sum idiom (a
    * break flag per row, cumulative-summed into an island id), the
    * classic SQL formulation that session_window expresses natively.
    * Timestamp math rides unix_micros (exact integers, no float
    * rounding to diverge); the window partitions by user_id so state
    * is per-key and the plan stays shuffle-partitioned at any scale.
    */
  def analyticGapsIslands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ord = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 600000000L // 10 minutes
    val lagTs = lag($"ts", 1).over(ord)
    // ts is TIMESTAMP_NTZ; unix_micros wants TIMESTAMP — the session
    // timezone is UTC on both engines, so the cast is value-preserving
    def us(c: org.apache.spark.sql.Column) =
      unix_micros(c.cast(TimestampType))
    events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts",
        when(lagTs.isNull || us($"ts") - us(lagTs) > gapUs, 1)
          .otherwise(0).as("brk"))
      .withColumn("island",
        sum($"brk").over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"island")
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max($"ts").cast(TimestampType)) -
          unix_micros(min($"ts").cast(TimestampType))).as("span_us"))
      .select($"user_id", $"island".cast(LongType).as("island"),
        $"n_events", $"span_us")
      .orderBy($"user_id", $"island")
  }

  /** Robust anomaly summary per event type: median / MAD instead of
    * mean / σ (analytic_zscore_outliers' moment stats move with the
    * outliers they hunt; the median pair does not). Both medians are
    * percentile_disc — ACTUAL values from the distribution, so med,
    * dev = |x − med| and mad are exact 2dp decimals identical on both
    * engines and the score division starts from identical doubles (no
    * interpolation arithmetic to diverge). Cost: two ordered-group
    * aggregates over the (type) partitioning — the same
    * sort-per-group shape as agg_percentile_disc at scale.
    */
  def pipelineAnomalyMad(spark: SparkSession, sfDir: String): DataFrame = {
    events(spark, sfDir).createOrReplaceTempView("g10_events")
    spark.sql("""
      WITH q AS (SELECT event_id, event_type,
                        CAST(value AS DECIMAL(12,2)) AS qv FROM g10_events),
      m AS (SELECT event_type,
                   -- percentile_disc picks an ACTUAL 2dp value but
                   -- Spark computes/returns it as DOUBLE; the cast
                   -- back to DECIMAL(12,2) is lossless and keeps
                   -- dev/mad exact decimals like the oracle's
                   CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY qv)
                        AS DECIMAL(12,2)) AS med
            FROM q GROUP BY event_type),
      d AS (SELECT q.event_id, q.event_type, q.qv, m.med,
                   abs(q.qv - m.med) AS dev
            FROM q JOIN m USING (event_type)),
      md AS (SELECT event_type,
                    CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)
                         AS DECIMAL(12,2)) AS mad
             FROM d GROUP BY event_type),
      s AS (SELECT d.event_type,
                   CAST(d.dev AS DOUBLE) / (1.4826 * CAST(md.mad AS DOUBLE))
                     AS score,
                   d.med, md.mad
            FROM d JOIN md USING (event_type))
      SELECT event_type, count(*) AS n_events,
        CAST(max(med) AS DOUBLE) AS med, CAST(max(mad) AS DOUBLE) AS mad,
        count(CASE WHEN score > 3.0 THEN 1 END) AS n_outliers,
        floor(max(score) * 1e6 + 0.5) / 1e6 AS max_score
      FROM s GROUP BY event_type ORDER BY event_type
    """)
  }

  /** Syllable-heuristic readability (Flesch reading-ease shape) per
    * document — a text-quality signal next to text_quality_score's
    * length/stopword ratios. The corpus has no sentence punctuation,
    * so sentence count is defined as ceil(words/15); syllables are
    * vowel groups (regexp [aeiou]+ match count) — both deterministic
    * integer counts, so the only float math is the final linear
    * formula, floor-quantized at 4dp. Row-wise projection: no
    * shuffle at all beyond the ordering.
    */
  def textReadabilityScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val words = size(split($"text", " ")).cast(DoubleType)
    val syl = size(expr("regexp_extract_all(text, '[aeiou]+', 0)"))
      .cast(DoubleType)
    documents(spark, sfDir)
      .select($"doc_id",
        words.cast(LongType).as("n_words"),
        syl.cast(LongType).as("n_syllables"),
        (floor((lit(206.835)
          - lit(1.015) * (words / ceil(words / lit(15.0)))
          - lit(84.6) * (syl / words))
          * lit(1e4) + lit(0.5)) / lit(1e4)).as("flesch"))
      .orderBy($"doc_id")
  }
}
