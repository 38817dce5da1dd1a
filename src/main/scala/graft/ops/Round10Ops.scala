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
}
