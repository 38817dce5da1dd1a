package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 12: Brier score, Gini split sweep, bounce
  * rate, term burstiness, feature hashing, multimodal tile grid.
  */
object Round11Ops12 {

  private def u24(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    expr(s"CAST(conv(substring(md5(CAST(${key.toString} AS STRING)), 1, 6), 16, 10) AS BIGINT)")

  /** Brier score of the md5-uniform pseudo-model, computed EXACTLY:
    * p = (k+½)/2²⁴ is dyadic, so (p−y)² = ((2k+1) − y·2²⁵)² / 2⁵⁰ has
    * an exact BIGINT numerator per row. The numerator sum rides
    * DECIMAL(38,0) (room for 1e12 rows × 1.1e15), and the single
    * double division at the end is per-group scalar — no float
    * accumulation anywhere. Completes the scoring-audit row next to
    * ml_log_loss and ml_calibration_bins.
    */
  def mlBrierScore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .withColumn("k", u24($"event_id"))
      .withColumn("y", (money($"value") >= lit(50)).cast(LongType))
      .withColumn("u",
        ($"k" * 2 + 1 - $"y" * lit(33554432L)) *
          ($"k" * 2 + 1 - $"y" * lit(33554432L)))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"y").as("n_pos"),
        sum($"u".cast(DecimalType(38, 0))).as("su"))
      .select($"event_type", $"n", $"n_pos",
        round($"su".cast(DoubleType) /
          ($"n".cast(DoubleType) * lit(1.125899906842624e15)), 6)
          .as("brier"))
      .orderBy($"event_type")
  }

  /** Decision-stump threshold sweep by weighted Gini impurity:
    * feature = hour of day, label = high-value flag. One corpus pass
    * builds the 24-row hour contingency; the 23 candidate splits then
    * evaluate on that BOUNDED table via a triangular join — corpus
    * size never touches the sweep. Impurity is per-row scalar double
    * math over exact counts, rounded at 6 dp.
    */
  def mlGiniSplit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byHour = events(spark, sfDir)
      .withColumn("h", hour($"ts"))
      .withColumn("y", (money($"value") >= lit(50)).cast(LongType))
      .groupBy($"h")
      .agg(count(lit(1)).as("nh"), sum($"y").as("ph"))
    val thresholds = byHour.select($"h".as("t")).filter($"t" >= 1)
    val split = thresholds.crossJoin(byHour)
      .groupBy($"t")
      .agg(sum(when($"h" < $"t", $"nh").otherwise(0L)).as("nl"),
        sum(when($"h" < $"t", $"ph").otherwise(0L)).as("pl"),
        sum(when($"h" >= $"t", $"nh").otherwise(0L)).as("nr"),
        sum(when($"h" >= $"t", $"ph").otherwise(0L)).as("pr"))
    def gini(n: String, p: String) = {
      val nd = col(n).cast(DoubleType); val pd = col(p).cast(DoubleType)
      lit(1.0) - (pd / nd) * (pd / nd) -
        ((nd - pd) / nd) * ((nd - pd) / nd)
    }
    split
      .withColumn("wg",
        ($"nl".cast(DoubleType) * gini("nl", "pl") +
          $"nr".cast(DoubleType) * gini("nr", "pr")) /
        ($"nl" + $"nr").cast(DoubleType))
      .select($"t", $"nl", $"pl", $"nr", $"pr",
        round($"wg", 6).as("weighted_gini"))
      .orderBy($"t")
  }

  /** Session bounce rate: share of 30-minute-gap sessions containing
    * a single event, grouped by the session's FIRST event type.
    * Session assembly is the user-partitioned lag/cumsum pass (the
    * sessionize op's shape — never an unpartitioned sort); the rate
    * is one double division of exact session counts.
    */
  def analyticBounceRate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val sessions = events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("new_s",
        when($"ts" - lag($"ts", 1).over(w) >
          expr("INTERVAL 30 MINUTES") || lag($"ts", 1).over(w).isNull, 1)
          .otherwise(0))
      .withColumn("session_id", sum($"new_s").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min(struct($"ts", $"event_id", $"event_type")).as("_first"))
    sessions
      .groupBy($"_first.event_type".as("first_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when($"n_events" === 1, 1L).otherwise(0L)).as("n_bounce"))
      .withColumn("bounce_rate",
        round($"n_bounce".cast(DoubleType) /
          $"n_sessions".cast(DoubleType), 6))
      .orderBy($"first_type")
  }

  /** Term burstiness (variance-to-mean ratio of per-document counts,
    * zeros included): VMR = (N·Σtf² − (Σtf)²) / (N·Σtf) from three
    * exact integers — terms that cluster in few documents score high,
    * evenly spread stopwords land near their Poisson baseline. The
    * corpus size N rides a 1-row broadcast (never a driver-side
    * count), and the top-20 ordering ties on the rounded value are
    * broken by term.
    */
  def textBurstiness(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tf = documents(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .groupBy($"term", $"doc_id").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("stf"),
        sum(($"tf" * $"tf").cast(DecimalType(38, 0))).as("stf2"))
      .filter($"stf" >= 50)
    val nn = documents(spark, sfDir).agg(count(lit(1)).as("nd"))
    stats.join(broadcast(nn))
      .select($"term", $"df", $"stf".cast(LongType).as("total_tf"),
        round(($"nd".cast(DoubleType) * $"stf2".cast(DoubleType) -
            $"stf".cast(DoubleType) * $"stf".cast(DoubleType)) /
          ($"nd".cast(DoubleType) * $"stf".cast(DoubleType)), 6)
          .as("vmr"))
      .orderBy($"vmr".desc, $"term")
      .limit(20)
  }

  /** Hashing-trick feature buckets: every token hashes (md5, engine-
    * neutral — never a JVM hashCode) into one of 64 buckets, counted
    * per language. The fixed-width result is the input a downstream
    * linear model trains on without a vocabulary broadcast — the
    * standard scale move when the term domain is unbounded. One
    * explode + one hash aggregate; output is |lang|·64 rows.
    */
  def mlFeatureHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .select($"lang", explode(split($"text", " ")).as("term"))
      .withColumn("bucket", pmod(u24($"term"), lit(64)).cast(IntegerType))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct($"term").as("n_terms"))
      .orderBy($"lang", $"bucket")
  }

  /** Multimodal tile-grid manifest: treat each payload as a raster
    * with a 16-byte row stride and cut 4-row (64-byte) tiles — the
    * manifest a distributed image-preprocessing stage shards by. Tile
    * count, byte offsets and per-tile md5 fingerprints are all pure
    * functions of the payload, computed by codegen'd expressions
    * (sequence→explode + substring + md5) — no UDF, no collect; the
    * explode fan-out is bounded by payload_len/64 per row.
    */
  def multimodalTileGrid(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .select($"doc_id", $"text",
        expr("CAST(length(text) DIV 64 AS BIGINT)").as("n_tiles"))
      .filter($"n_tiles" >= 1)
      .select($"doc_id", $"text", $"n_tiles",
        explode(sequence(lit(0L), $"n_tiles" - 1)).as("tile_id"))
      .select($"doc_id", $"n_tiles", $"tile_id",
        ($"tile_id" * 64).as("tile_offset"),
        md5(expr("CAST(substring(text, CAST(tile_id*64+1 AS INT), 64) AS BINARY)"))
          .as("tile_md5"))
      .orderBy($"doc_id", $"tile_id")
  }
}
