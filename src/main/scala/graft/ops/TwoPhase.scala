package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared two-phase distributed-position helper (round-16 low-card-
  * window sweep). A `Window.partitionBy(event_type)` over the raw
  * events table caps parallelism at the 5 distinct types forever —
  * each task sorts n/5 rows no matter how many executors exist. The
  * scale-safe equivalent used by the rolling/lead/prefix ops:
  *
  *   1. rank rows inside (event_type, calendar-day) slices —
  *      |types| x |days| parallel sort tasks; day = date(ts) is
  *      monotone in ts, so (day, ts, event_id) order IS the
  *      (ts, event_id) total order;
  *   2. the per-(type, day) census (a |types| x |days|-row rollup)
  *      gets running offsets — its window IS partitioned by type
  *      alone, but over a domain-bounded aggregate, which is the
  *      exempt shape in PlanSpec's low-card-window sweep;
  *   3. rn = offset + intra-day rank is the exact global position;
  *      chunk = (rn-1) DIV chunkRows buckets rows into fixed-size
  *      ranges so downstream frame windows can partition by
  *      (event_type, chunk) — n/chunkRows tasks, linear parallelism —
  *      replicating only the frame-width rows across chunk borders.
  */
object TwoPhase {

  /** (event_type, event_id, x, rn, chunk): x is the exact-DECIMAL
    * event value, rn the row's position on the per-type (ts, event_id)
    * total order, chunk = (rn-1) DIV chunkRows.
    */
  private[ops] def eventPositions(spark: SparkSession, sfDir: String,
      chunkRows: Int): DataFrame = {
    import spark.implicits._
    val ev = events(spark, sfDir)
      .select($"event_type", $"ts", $"event_id", money($"value").as("x"),
        to_date($"ts").as("day"))
    val wDay = Window.partitionBy($"event_type", $"day")
      .orderBy($"ts", $"event_id")
    val ranked = ev
      .withColumn("ir", row_number().over(wDay).cast(LongType))
      .drop("ts")
    val census = ranked.groupBy($"event_type".as("c_et"), $"day".as("c_day"))
      .agg(count(lit(1)).as("dn"))
    val wOff = Window.partitionBy($"c_et").orderBy($"c_day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = census
      .withColumn("off", coalesce(sum($"dn").over(wOff), lit(0L)))
      .select($"c_et", $"c_day", $"off")
    ranked.join(broadcast(offsets),
        $"event_type" === $"c_et" && $"day" === $"c_day")
      .withColumn("rn", $"off" + $"ir")
      .withColumn("chunk", (($"rn" - 1) / chunkRows).cast(LongType))
      .select($"event_type", $"event_id", $"x", $"rn", $"chunk")
  }

  /** The chunk-border replication for a ROWS frame of `before`
    * preceding and `after` following rows: the last `before` positions
    * of each chunk are re-emitted into the next chunk and the first
    * `after` positions into the previous one, flagged `is_carry` so
    * the op can drop their own (edge-incorrect) frames after the
    * window pass. Border duplication is (before+after)/chunkRows —
    * under 2% for the 1024-row chunks the callers use.
    */
  private[ops] def withCarries(pos: DataFrame, chunkRows: Int,
      before: Int, after: Int): DataFrame = {
    val native = pos.withColumn("is_carry", lit(false))
    val back = if (before > 0)
      Some(pos.filter(pmod(col("rn") - 1, lit(chunkRows)) >= chunkRows - before)
        .withColumn("chunk", col("chunk") + 1)
        .withColumn("is_carry", lit(true)))
    else None
    val fwd = if (after > 0)
      Some(pos.filter(pmod(col("rn") - 1, lit(chunkRows)) < after &&
          col("chunk") > 0)
        .withColumn("chunk", col("chunk") - 1)
        .withColumn("is_carry", lit(true)))
    else None
    (Seq(native) ++ back ++ fwd).reduce(_ unionByName _)
  }
}
