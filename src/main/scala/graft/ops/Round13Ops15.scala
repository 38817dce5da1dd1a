package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Round-13 widening, part 15: per-key rate limiting (batch oracle +
  * real flatMapGroupsWithState builder), the lookup-waterfall join,
  * and the bronze→silver→gold medallion rollup.
  */
object Round13Ops15 {

  /** Token-bucket rate limiting, batch formulation: each user may
    * emit 3 events per epoch hour; later arrivals in the hour are
    * throttled. Admission order is (ts, event_id) so replays agree;
    * the rank is a window PARTITIONED by (user, hour) — per-key
    * state, the same keying the streaming path shards on. Output is
    * the per-type throttling report. The true incremental path is
    * [[rateLimitStream]] (flatMapGroupsWithState), pinned in
    * Round13Spec15 against this batch semantics.
    */
  def streamRateLimitTokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"hr").orderBy($"ts", $"event_id")
    events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type",
        date_trunc("hour", $"ts").as("hr"))
      .withColumn("rn", row_number().over(w))
      .withColumn("allowed", $"rn" <= 3)
      .groupBy($"event_type")
      .agg(sum(when($"allowed", 1L).otherwise(0L)).as("n_allowed"),
        sum(when(!$"allowed", 1L).otherwise(0L)).as("n_denied"),
        countDistinct(when(!$"allowed", $"user_id")).as("n_throttled_users"))
      .orderBy($"event_type")
  }

  /** The incremental rate limiter: per-user state holds (hour start,
    * admitted count); each event is admitted iff fewer than 3 were
    * admitted in its hour. Used by Round13Spec15 with MemoryStream
    * micro-batches; state is one tuple per user — bounded, shardable,
    * watermark-free (the hour rolls forward monotonically per user).
    */
  def rateLimitStream(spark: SparkSession,
      events: DataFrame): DataFrame = {
    import spark.implicits._
    val typed = events.select($"user_id".as[Long], $"event_id".as[Long],
      $"ts".cast(TimestampType).as[java.sql.Timestamp])
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Boolean)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) =>
          var (hour, used) = state.getOption.getOrElse((-1L, 0L))
          val out = rows.toSeq.sortBy(r => (r._3.getTime, r._2)).map { r =>
            val h = r._3.getTime / 3600000L
            if (h != hour) { hour = h; used = 0L }
            val ok = used < 3
            if (ok) used += 1
            (user, r._2, ok)
          }
          state.update((hour, used))
          out.iterator
      }
      .toDF("user_id", "event_id", "allowed")
  }

  /** Lookup waterfall: an effective rebate resolves through tiers —
    * priority-specific override, else status-level rate, else the
    * house default — via two BROADCAST left joins and one coalesce
    * (first match wins), never a per-row UDF or a driver lookup.
    * Rebates are integer basis points on cents, so the rollup is
    * exact.
    */
  def joinLookupWaterfall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val byPriority = Seq(("1-URGENT", 250L), ("2-HIGH", 150L))
      .toDF("pri", "bp1")
    val byStatus = Seq(("F", 50L)).toDF("st", "bp2")
    orders(spark, sfDir)
      .select($"o_orderpriority", $"o_orderstatus",
        (money($"o_totalprice") * 100).cast(LongType).as("cents"))
      .join(broadcast(byPriority), $"o_orderpriority" === $"pri", "left")
      .join(broadcast(byStatus), $"o_orderstatus" === $"st", "left")
      .withColumn("bp", coalesce($"bp1", $"bp2", lit(25L)))
      .withColumn("rebate", expr("(cents * bp) div 10000"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), max($"bp").as("bp_max"),
        sum($"rebate").as("sum_rebate_cents"))
      .orderBy($"o_orderpriority")
  }

  /** The medallion rollup: bronze (raw arrivals incl. replayed
    * duplicates), silver (exact-keyed dedup keeping the first
    * arrival), gold (the per-type business aggregate) — each layer's
    * row count and value checksum in one result so a load can assert
    * its conservation laws in a single query. Duplicates are
    * simulated by replaying every 97th event; dedup is the keyed
    * min_by, not a global distinct.
    */
  def pipelineMedallionRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = events(spark, sfDir)
      .select($"event_id", $"event_type",
        (money($"value") * 100).cast(LongType).as("cents"))
    val bronze = base.unionAll(base.filter($"event_id" % 97 === 0))
    val silver = bronze.groupBy($"event_id")
      .agg(min(struct($"event_type", $"cents")).as("m"))
      .select($"event_id", $"m.event_type".as("event_type"),
        $"m.cents".as("cents"))
    val gold = silver.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
    val b = bronze.agg(count(lit(1)).as("n_rows"), sum($"cents").as("checksum"))
      .select(lit("1_bronze").as("layer"), $"n_rows", $"checksum")
    val s = silver.agg(count(lit(1)).as("n_rows"), sum($"cents").as("checksum"))
      .select(lit("2_silver").as("layer"), $"n_rows", $"checksum")
    val g = gold.agg(count(lit(1)).as("n_rows"), sum($"s").as("checksum"))
      .select(lit("3_gold").as("layer"), $"n_rows", $"checksum")
    b.unionAll(s).unionAll(g).orderBy($"layer")
  }
}
