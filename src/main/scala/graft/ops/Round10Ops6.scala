package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 widening, part 6: cohort lifetime-value curves, SQL-level
  * gap sessionization, and sparse TF-IDF cosine pairs with rare-term
  * candidate generation (the prefix-filtering move).
  */
object Round10Ops6 {

  /** Cohort LTV curve: customers cohort by their first order month;
    * each cohort's cumulative revenue per member is tracked across
    * month offsets. The running total is a window PARTITIONED by
    * cohort (bounded state per cohort at any scale); cohort sizes ride
    * the same grouped rollup, not a global window. Revenue stays exact
    * DECIMAL through the cumsum; the one division per output row is
    * rounded at 6dp.
    */
  def analyticCohortLtv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, sfDir).select(
      $"o_custkey",
      (year($"o_orderdate") * 12 + month($"o_orderdate")).as("m"),
      money($"o_totalprice").as("rev"))
    val cohort = o.groupBy($"o_custkey").agg(min($"m").as("cm"))
    val sizes = cohort.groupBy($"cm").agg(count(lit(1)).as("n_cust"))
    val curve = o.join(cohort, "o_custkey")
      .groupBy($"cm", ($"m" - $"cm").as("month_offset"))
      .agg(sum($"rev").as("rev"))
      .withColumn("cum_rev", sum($"rev").over(
        Window.partitionBy($"cm").orderBy($"month_offset")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    curve.join(sizes, "cm")
      // integer DIV, not double division + cast: DuckDB's double→int
      // cast rounds while Spark's truncates (documented divergence)
      .selectExpr(
        "CAST((cm - 1) div 12 * 100 + ((cm - 1) % 12 + 1) AS INT) AS cohort_ym",
        "month_offset", "n_cust",
        "round(CAST(cum_rev AS DOUBLE) / CAST(n_cust AS DOUBLE), 6) AS ltv_per_cust")
      .orderBy($"cohort_ym", $"month_offset")
  }

  /** Gap-based sessionization in pure SQL shapes: a 30-minute
    * inactivity gap opens a new session. lag + conditional flag +
    * running sum — all on windows PARTITIONED by user (per-key state,
    * the batch mirror of the streaming session window). Durations
    * subtract epoch seconds (integer truncation, identical on both
    * engines); the session rollup shuffles once on (user, session).
    */
  def analyticSessionizeSql(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val flagged = events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("new_s",
        when($"ts" - lag($"ts", 1).over(w) >
          expr("INTERVAL 30 MINUTES") || lag($"ts", 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum($"new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // NTZ cannot cast to BIGINT; truncate both endpoints to whole
    // seconds first, then timestampdiff — integral endpoints make the
    // boundary-count (DuckDB date_diff) and elapsed-seconds (Spark
    // timestampdiff) definitions coincide exactly
    flagged.groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        expr("timestampdiff(SECOND, date_trunc('second', min(ts)), " +
          "date_trunc('second', max(ts)))").as("duration_s"),
        min(struct($"ts", $"event_id", $"event_type")).as("_first"))
      .select($"user_id", $"session_id", $"n_events", $"duration_s",
        $"_first.event_type".as("first_type"))
      .orderBy($"user_id", $"session_id")
  }

  /** Sparse TF-IDF cosine pairs with RARE-TERM candidate generation —
    * the prefix-filtering idea that makes sparse all-pairs similarity
    * tractable: candidate pairs come only from the inverted index of
    * discriminative terms (2 ≤ df ≤ 5), never from stopword-grade
    * postings, so the pair stream is Σ df² over rare terms instead of
    * the full cross product. The dot product then joins the FULL
    * weight vectors of just the candidates. Weights are tf ×
    * idf-rounded-at-9dp cast DECIMAL(16,9) — products and sums stay
    * exact on both engines (the repo's ln protocol) — and the single
    * double division per pair is rounded at 6dp. Top-20 by (cosine
    * desc, doc_a, doc_b).
    */
  def simSparseTfidfPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("t"))
    val tf = toks
      .select($"doc_id", explode($"t").as("term"))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    // corpus size rides a 1-row broadcast (the oracle's nn CTE shape),
    // not a blocking driver-side count
    val nn = documents(spark, sfDir)
      .agg(count(lit(1)).cast(DoubleType).as("nn"))
    val dfreq = tf.groupBy($"term").agg(count(lit(1)).as("dfq"))
    // round 19: materialized once — w feeds THREE consumers (norms,
    // wa, wb) and its tf⨝dfreq lineage re-planned per consumer;
    // whether the runtime deduped the repeated subtree was left to
    // AQE stage reuse, which is not guaranteed across separate jobs
    val w = tf.join(dfreq, "term").crossJoin(broadcast(nn))
      .withColumn("w",
        ($"tf" * round(log($"nn" / $"dfq".cast(DoubleType)), 9)
          .cast(DecimalType(13, 9))).cast(DecimalType(16, 9)))
      .localCheckpoint(true)
    val norms = w.groupBy($"doc_id")
      .agg(sum($"w" * $"w").as("n2"))
    // candidate generation indexes rare BIGRAMS (df 2..5): this corpus
    // has a small unigram vocabulary where every term is common, so
    // the discriminative shingle is the bigram — the same
    // shingle-indexed candidate idea the minhash pipeline uses
    val bigrams = toks
      .select($"doc_id", explode(expr(TextExprs.bigrams("t"))).as("bg"))
      .distinct()
    val rareBg = bigrams.groupBy($"bg").agg(count(lit(1)).as("bdf"))
      .filter($"bdf" >= 2 && $"bdf" <= 5)
    val rare = bigrams.join(rareBg, "bg").select($"bg", $"doc_id")
    val cand = rare.as("a").join(rare.as("b"),
        $"a.bg" === $"b.bg" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .distinct()
    val wa = w.select($"doc_id".as("doc_a"), $"term", $"w".as("w_a"))
    val wb = w.select($"doc_id".as("doc_b"), $"term", $"w".as("w_b"))
    val dots = cand.join(wa, "doc_a").join(wb, Seq("doc_b", "term"))
      .groupBy($"doc_a", $"doc_b")
      .agg(sum($"w_a" * $"w_b").as("dot"))
    dots
      .join(norms.select($"doc_id".as("doc_a"), $"n2".as("na")), "doc_a")
      .join(norms.select($"doc_id".as("doc_b"), $"n2".as("nb")), "doc_b")
      .select($"doc_a", $"doc_b",
        round($"dot".cast(DoubleType) /
          (sqrt($"na".cast(DoubleType)) * sqrt($"nb".cast(DoubleType))), 6)
          .as("cosine"))
      .orderBy($"cosine".desc, $"doc_a", $"doc_b")
      .limit(20)
  }
}
