package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 27: stylometric source similarity, chained
  * load checksums, and merged-interval coverage.
  */
object Round13Ops27 {

  /** Stylometry: each source's stopword-usage profile (counts of 8
    * high-frequency function words per 1000 tokens) compared pairwise
    * by cosine — the authorship/provenance signal content-level dedup
    * misses. Profiles are exact integer vectors from one explode
    * pass; the pairwise cosine over the source×source grid (20×20)
    * runs on the tiny profile table. Output: each source's nearest
    * stylistic neighbor.
    */
  def textStyleSimilarity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "that")
    val toks = documents(spark, sfDir)
      .select($"source", explode(split($"text", " ")).as("w"))
    val prof = toks.groupBy($"source")
      .agg(count(lit(1)).as("n_tokens"),
        array(stop.map(s =>
          sum(when($"w" === s, 1L).otherwise(0L))): _*).as("v"))
    val dot = expr("aggregate(zip_with(a.v, b.v, (x, y) -> x * y), " +
      "CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    val na = expr("aggregate(a.v, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
    val nb = expr("aggregate(b.v, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
    val pairs = prof.as("a").join(prof.as("b"),
        col("a.source") =!= col("b.source"))
      .select(col("a.source").as("src"), col("b.source").as("neighbor"),
        round(dot.cast(DoubleType) /
          (sqrt(na.cast(DoubleType)) * sqrt(nb.cast(DoubleType))), 6)
          .as("style_cos"))
    val w = Window.partitionBy($"src").orderBy($"style_cos".desc, $"neighbor")
    pairs.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"src".as("source"), $"neighbor", $"style_cos")
      .orderBy($"source")
  }

  /** Chained batch checksums — each load's checksum folds in its
    * predecessor's (a merkle-style lineage), so replaying any batch
    * with different content breaks every later checksum: tamper
    * evidence for a load chain. Batch aggregates are exact integers;
    * the chain is 3 fixed md5 steps over their decimal strings,
    * identical text both engines.
    */
  def pipelineChecksumChain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val agg = events(spark, sfDir)
      .select(pmod($"event_id", lit(3)).cast(IntegerType).as("batch_id"),
        (money($"value") * 100).cast(LongType).as("cents"),
        pmod($"event_id" * 31L + (money($"value") * 100).cast(LongType),
          lit(1000000007L)).as("rh"))
      .groupBy($"batch_id")
      .agg(count(lit(1)).as("n_rows"), sum($"cents").as("sum_cents"),
        sum($"rh").as("row_hash_sum"))
    val b = agg.groupBy()
      .agg(max(when($"batch_id" === 0, struct($"n_rows", $"sum_cents",
          $"row_hash_sum"))).as("b0"),
        max(when($"batch_id" === 1, struct($"n_rows", $"sum_cents",
          $"row_hash_sum"))).as("b1"),
        max(when($"batch_id" === 2, struct($"n_rows", $"sum_cents",
          $"row_hash_sum"))).as("b2"))
      .withColumn("h0", md5(concat_ws(":", lit("genesis"),
        $"b0.n_rows", $"b0.row_hash_sum")))
      .withColumn("h1", md5(concat_ws(":", $"h0",
        $"b1.n_rows", $"b1.row_hash_sum")))
      .withColumn("h2", md5(concat_ws(":", $"h1",
        $"b2.n_rows", $"b2.row_hash_sum")))
    b.select(
      expr("stack(3, 0, b0.n_rows, b0.sum_cents, h0," +
        " 1, b1.n_rows, b1.sum_cents, h1," +
        " 2, b2.n_rows, b2.sum_cents, h2)")
        .as(Seq("batch_id", "n_rows", "sum_cents", "chain_md5")))
      .orderBy($"batch_id")
  }

  /** Merged-interval coverage: each event opens a 10-minute activity
    * window; a user's covered time merges the overlaps —
    * Σ min(gap to next event, 10 min) + 10 min for the last. One
    * user-partitioned lag, exact integer seconds, then the coverage
    * distribution per event-volume decile of users.
    */
  def winIntervalCoverage(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
    val perUser = events(spark, sfDir)
      .select($"user_id", $"event_id",
        unix_micros($"ts".cast(TimestampType)).as("us"))
      .withColumn("nxt", lead($"us", 1).over(w))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        (sum(when($"nxt".isNotNull,
          least($"nxt" - $"us", lit(600000000L))).otherwise(0L)) +
          lit(600000000L)).as("covered_us"))
    // histogram over coverage HOURS (event counts are near-uniform
    // per user in this corpus, so banding by volume degenerates; the
    // merged coverage itself varies with each user's gap structure)
    perUser
      .select($"user_id", $"n_events",
        expr("covered_us div 1000000").as("covered_s"))
      .groupBy(expr("covered_s div 3600").as("coverage_hours"))
      .agg(count(lit(1)).as("n_users"),
        sum($"n_events").as("sum_events"),
        min($"covered_s").as("min_covered_s"),
        max($"covered_s").as("max_covered_s"))
      .orderBy($"coverage_hours")
  }
}
