package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming operators (SURVEY §2h).
  *
  * Each capability exists twice:
  *  - a batch-equivalent over events.parquet, registered in
  *    SparkEntry.queries so the DuckDB oracle checks the windowing
  *    arithmetic (Structured Streaming runs the same DataFrame program
  *    incrementally, so result semantics are identical); and
  *  - a streaming plan builder ([[tumblingStream]] etc.) applied to a
  *    `readStream` source, exercised with MemoryStream in
  *    StreamingSpec (watermarks, late data, incremental state).
  */
object Streaming {

  // ---- batch equivalents (oracle-checked) ----

  /** 1-hour tumbling windows: count, exact 2dp-decimal value sum,
    * distinct users per (window, type).
    */
  def streamTumblingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(money($"value")).as("_sv"),
        countDistinct($"user_id").as("n_users"))
      .select($"window.start".as("win_start"), $"event_type", $"n",
        $"_sv".cast(DoubleType).as("sum_value"), $"n_users")
      .orderBy($"win_start", $"event_type")
  }

  /** 1-hour windows sliding every 15 min — each event lands in exactly
    * 4 windows (epoch-aligned grid, matching Spark's window()).
    */
  def streamSlidingWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .groupBy(window($"ts", "1 hour", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("win_start"), $"event_type", $"n")
      .orderBy($"win_start", $"event_type")
  }

  /** Per-user sessions with a 30-min inactivity gap. An event exactly
    * at prev_ts + 30min starts a NEW session (session windows are
    * half-open [start, last+gap)).
    */
  def streamSessionWindow(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("last_event"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"session_start", $"last_event", $"n_events")
      .orderBy($"user_id", $"session_start")
  }

  /** Exact dedup on event_id (unique in the batch data — the streaming
    * path injects real duplicates in StreamingSpec), then a stable agg.
    */
  def streamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .dropDuplicates(Seq("event_id"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  /** CHAINED stateful window aggregation (batch equivalent): 15-min
    * tumbling counts rolled up into hourly max/total of those counts —
    * two stateful operators in one plan, the multi-stage streaming
    * topology Spark 4 supports in append mode (the streaming twin is
    * [[chainedWindowsStream]], which re-windows via window_time over
    * the first aggregation's window column). Both window grids are
    * epoch-aligned, so the hourly bucket of a 15-min window start is
    * exact on both engines.
    */
  def streamChainedWindows(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val m = events(spark, sfDir)
      .groupBy(window($"ts", "15 minutes"), $"event_type")
      .agg(count(lit(1)).as("n15"))
    m.groupBy(window($"window.start", "1 hour"), $"event_type")
      .agg(max($"n15").as("max_15m"), sum($"n15").as("total_n"))
      .select($"window.start".as("win_start"), $"event_type",
        $"max_15m", $"total_n")
      .orderBy($"win_start", $"event_type")
  }

  /** Batch-equivalent of watermark lateness: an event is late iff it
    * arrives (event_id = arrival order) after the running max event
    * time has passed it by > 10 min — exactly the events a 10-min
    * watermark would drop from closed windows. The true streaming drop
    * behavior is asserted in StreamingSpec (the engine tracks the
    * watermark as one scalar per trigger — the actual 100 TB path).
    *
    * The running max over arrival order is the classic DISTRIBUTED
    * prefix scan, two narrow passes — never a single-partition window:
    *  1. deterministic range buckets over event_id (min/max broadcast,
    *     P fixed-width buckets), running max WITHIN each bucket via a
    *     partitioned window;
    *  2. per-bucket max rolls up to a P-row summary whose exclusive
    *     prefix-max is a triangular broadcast join (O(P²) comparisons
    *     total, spread across executors; P = shuffle parallelism, not
    *     data size), broadcast back and combined with `greatest`
    *     (null-skipping, so the global first row stays non-late —
    *     bit-identical to the single-window form).
    */
  def streamWatermarkLateData(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nb = spark.sessionState.conf.numShufflePartitions
    val e = events(spark, sfDir).select($"event_id", $"ts", $"event_type")
    val bounds = e.agg(min($"event_id").as("lo"), max($"event_id").as("hi"))
    val bucketed = e.crossJoin(broadcast(bounds))
      .withColumn("pid", least(lit(nb - 1),
        floor((($"event_id" - $"lo") * nb) / ($"hi" - $"lo" + 1))).cast("int"))
      .drop("lo", "hi")
    val wLocal = Window.partitionBy($"pid").orderBy($"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sums = bucketed.groupBy($"pid").agg(max($"ts").as("pmax"))
    val prior = sums.as("a")
      .join(broadcast(sums.select($"pid".as("bpid"), $"pmax".as("bmax"))),
        $"bpid" < $"a.pid", "left")
      .groupBy($"a.pid".as("pid")).agg(max($"bmax").as("prior_max"))
    bucketed
      .withColumn("local_max", max($"ts").over(wLocal))
      .join(broadcast(prior), Seq("pid"))
      .withColumn("is_late",
        $"ts" < greatest($"local_max", $"prior_max") - expr("INTERVAL '10' MINUTE"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_total"),
        count(when($"is_late", 1)).as("n_late"))
      .orderBy($"event_type")
  }

  /** Stream-stream interval join, batch mirror: each click paired with
    * the same user's purchases landing within [click_ts, click_ts+10min)
    * — the classic attribution join. Gap reported in exact microseconds
    * (whole-second datediff truncates differently across engines on
    * sub-second timestamps). The true streaming path is
    * [[intervalJoinStream]]; there the time bound is what lets the
    * engine expire join state, so memory is bounded by the interval ×
    * rate, not by stream length.
    */
  def streamIntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, sfDir)
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"))
    clicks.join(purchases,
        $"user_id" === $"p_user" &&
        $"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" < $"click_ts" + expr("INTERVAL '10' MINUTE"))
      // UTC session: NTZ→TZ cast is instant-preserving, so unix_micros
      // is an exact integer on both engines (DuckDB: epoch_us)
      .select($"user_id", $"click_id", $"purchase_id",
        (expr("unix_micros(CAST(purchase_ts AS TIMESTAMP))") -
          expr("unix_micros(CAST(click_ts AS TIMESTAMP))")).as("gap_us"))
      .orderBy($"user_id", $"click_id", $"purchase_id")
  }

  /** Generic keyed upsert: update rows replace target rows by key;
    * one shuffle FULL OUTER join, per-column coalesce — the same MERGE
    * shape as pipeline_upsert, no broadcast, no driver state. Updates
    * must carry the target's exact schema.
    */
  def upsertByKey(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val cols = target.columns.toSeq
    val u = updates.select(cols.map(c => col(c).as(s"__u_$c")): _*)
    target.join(u, col(key) === col(s"__u_$key"), "full_outer")
      .select(cols.map(c => coalesce(col(s"__u_$c"), col(c)).as(c)): _*)
  }

  /** Sink-side streaming pattern (round-7): foreachBatch-driven
    * idempotent parquet upsert. The update-mode aggregation emits the
    * FULL new per-key state each trigger (not a delta), so replacing
    * by key makes batch re-delivery a no-op — the exactly-once
    * property a foreachBatch sink must supply itself (asserted in
    * StreamingSpec; the third merge below re-applies the last batch
    * inside this op as the batch-mode mirror of that re-delivery).
    *
    * Mirror construction: two micro-batches from events (even
    * event_ids deliver first, then the rest), each carrying cumulative
    * per-user totals for the users it touches — exactly what an
    * update-mode groupBy(user).agg emits per trigger. Final state =
    * full per-user totals, which is the oracle query. Money stays
    * DECIMAL through the merges; DOUBLE only on output.
    *
    * Scale note: each merge is one key-partitioned shuffle join; state
    * lives in the target table, not the driver — at 100 TB this is
    * Delta/Iceberg MERGE fed by foreachBatch, and the parquet
    * overwrite becomes a transactional commit.
    */
  def streamForeachBatchUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, sfDir).select($"event_id", $"user_id", money($"value").as("v"))
    def totals(df: DataFrame): DataFrame =
      df.groupBy($"user_id")
        .agg(count(lit(1)).as("n_events"), sum($"v").as("sum_value"))
    val batch1 = totals(e.filter(pmod($"event_id", lit(2)) === 0))
    // trigger 2 emits cumulative state, only for users seen in batch 2
    val batch2 = totals(e).join(
      e.filter(pmod($"event_id", lit(2)) === 1).select($"user_id").distinct(),
      Seq("user_id"), "left_semi")
    val empty = batch1.filter(lit(false))
    val afterB1 = upsertByKey(empty, batch1, "user_id")
    val afterB2 = upsertByKey(afterB1, batch2, "user_id")
    val redelivered = upsertByKey(afterB2, batch2, "user_id") // idempotent
    redelivered
      .select($"user_id", $"n_events",
        $"sum_value".cast(DoubleType).as("sum_value"))
      .orderBy($"user_id")
  }

  /** The real foreachBatch sink body used with writeStream in
    * StreamingSpec: read-merge-overwrite of a parquet target keyed on
    * user_id. The merged frame is materialized (persist + count)
    * before overwriting the directory it was read from.
    */
  def upsertBatchSink(spark: SparkSession, targetDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val existing =
      try spark.read.parquet(targetDir)
      catch { case _: Throwable => batch.filter(lit(false)) }
    val merged = upsertByKey(existing, batch, "user_id").persist()
    merged.count()
    try merged.write.mode("overwrite").parquet(targetDir)
    finally merged.unpersist()
  }

  // ---- streaming plan builders (MemoryStream / readStream sources) ----

  /** Real stream-stream inner join: watermarks on both sides plus the
    * time-range condition bound the join state the engine must retain.
    */
  def intervalJoinStream(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "10 minutes")
    val p = purchases.withWatermark("purchase_ts", "20 minutes")
    c.join(p,
      c("user_id") === p("p_user") &&
      p("purchase_ts") >= c("click_ts") &&
      p("purchase_ts") < c("click_ts") + expr("INTERVAL '10' MINUTE"))
  }

  /** Left-outer stream-stream interval join: unmatched clicks emit a
    * NULL-purchase row, but only once the watermark proves no purchase
    * can still arrive inside the click's 10-minute window — the
    * outer-ness is watermark-gated, which is exactly what bounds the
    * state (asserted in StreamingSpec).
    */
  def intervalJoinOuterStream(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", "10 minutes")
    val p = purchases.withWatermark("purchase_ts", "20 minutes")
    c.join(p,
      c("user_id") === p("p_user") &&
      p("purchase_ts") >= c("click_ts") &&
      p("purchase_ts") < c("click_ts") + expr("INTERVAL '10' MINUTE"),
      "left_outer")
  }

  /** Append-mode tumbling counts; windows emit once the 10-min
    * watermark passes their end, later events are dropped.
    */
  def tumblingStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count()

  /** Append-mode sliding counts (1 h window, 15 min slide): an event
    * belongs to 4 overlapping windows; each window emits independently
    * once the 10-min watermark passes ITS end, so a late event can be
    * dropped by already-closed windows while still counting toward the
    * later windows that remain open (asserted in StreamingSpec).
    */
  def slidingStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .count()

  /** Streaming exact dedup with bounded state: watermark lets the
    * engine expire seen-keys older than the horizon.
    */
  def dedupStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicates(Seq("event_id"))

  /** Bounded-state streaming dedup: unlike dropDuplicates (whose key
    * state grows forever — the 100 TB streaming killer),
    * dropDuplicatesWithinWatermark evicts each key once the watermark
    * passes its event time, trading "exactly once ever" for "exactly
    * once within the delay bound" — the right contract when upstream
    * redelivery is bounded (Kafka at-least-once). A duplicate arriving
    * after eviction is re-admitted; StreamingSpec pins both sides.
    */
  def dedupWithinWatermarkStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  def sessionStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count()

  /** Two chained stateful aggregations in ONE streaming query (append
    * mode, Spark 4): 15-min tumbling counts, re-windowed through
    * window_time() into hourly maxima. The second operator's event
    * time is the first operator's window — each stage keeps its own
    * watermark-evicted state, the multi-stage topology that previously
    * required two queries and an intermediate sink.
    */
  def chainedWindowsStream(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n15"))
      .groupBy(window(window_time(col("window")), "1 hour"),
        col("event_type"))
      .agg(max(col("n15")).as("max_15m"))

  /** Custom stateful operator via flatMapGroupsWithState: per-user
    * running totals (event count + value sum) emitted on every update.
    * This is the arbitrary-state escape hatch for semantics windowed
    * aggregation can't express; state lives in the per-executor
    * StateStore, partitioned by the group key, so it scales with
    * executors, not with stream length.
    */
  def statefulUserTotals(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    events.select($"user_id".as[Long], $"value".as[Double])
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, rows: Iterator[(Long, Double)],
              state: GroupState[(Long, Double)]) =>
          val (n0, s0) = state.getOption.getOrElse((0L, 0.0))
          var n = n0; var s = s0
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update((n, s))
          Iterator((user, n, s))
      }
      .toDF("user_id", "n_events", "sum_value")
  }

  /** Spark 4's successor arbitrary-state API: the same per-user running
    * totals as [[statefulUserTotals]], expressed through
    * `transformWithState` + a [[UserTotalsProcessor]] with a NAMED
    * ValueState. Functionally identical output (StreamingSpec asserts
    * parity on the same micro-batch sequence); operationally the new
    * API brings named/typed state variables, per-state TTL, and
    * independent timers — and requires the RocksDB state store
    * provider, which is also the provider you'd run at 100 TB
    * (changelog checkpointing, bounded memory via native spill).
    */
  def statefulUserTotalsTws(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import spark.implicits._
    events.select($"user_id".as[Long], $"value".as[Double])
      .groupByKey(_._1)
      .transformWithState(new UserTotalsProcessor,
        TimeMode.None(), OutputMode.Append())
      .toDF("user_id", "n_events", "sum_value")
  }

  /** Stateful sessionization with EventTimeTimeout: per user, events
    * within a 30-min gap extend the open session; a session is emitted
    * (Append mode) when the event-time watermark passes its end + gap
    * — at which point no in-watermark event can extend it — and its
    * state is removed. Multi-session batches are split on the gap and
    * all but the newest run emitted immediately (assumes lateness
    * bounded by the gap, which the 10-min watermark enforces). State
    * per key is one (start, end, n) triple: memory scales with ACTIVE
    * sessions, not stream length — the 100 TB contract for custom
    * state.
    */
  def statefulSessionStream(spark: SparkSession, events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    val gapMs = 30L * 60 * 1000
    events.withWatermark("ts", "10 minutes")
      .select($"user_id".as[Long], $"ts".as[java.sql.Timestamp])
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long),
        (Long, java.sql.Timestamp, java.sql.Timestamp, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user: Long, rows: Iterator[(Long, java.sql.Timestamp)],
              state: GroupState[(Long, Long, Long)]) =>
          def emit(s: (Long, Long, Long)) =
            (user, new java.sql.Timestamp(s._1), new java.sql.Timestamp(s._2), s._3)
          if (state.hasTimedOut) {
            val closed = state.get
            state.remove()
            Iterator.single(emit(closed))
          } else {
            // merge batch events with open state, split into gap-runs
            val times = rows.map(_._2.getTime).toSeq.sorted
            val runs = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Long, Long)]
            state.getOption.foreach(runs += _)
            times.foreach { t =>
              runs.lastOption match {
                case Some((s, e, n)) if t <= e + gapMs =>
                  runs(runs.size - 1) = (math.min(s, t), math.max(e, t), n + 1)
                case _ => runs += ((t, t, 1L))
              }
            }
            val open = runs.last
            state.update(open)
            state.setTimeoutTimestamp(open._2 + gapMs)
            runs.init.iterator.map(emit)
          }
      }
      .toDF("user_id", "session_start", "session_end", "n_events")
  }
}

/** StatefulProcessor behind [[Streaming.statefulUserTotalsTws]]: one
  * named ValueState ("totals") per user holding (n_events, sum_value),
  * updated per micro-batch and emitted on every update — the
  * transformWithState rendering of the flatMapGroupsWithState totals
  * operator. No TTL (running totals are cumulative by definition) and
  * no timers (TimeMode.None): the state contract is one tuple per
  * ACTIVE key in the executor-local store, scaling with keys, never
  * with stream length.
  */
class UserTotalsProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
    Long, (Long, Double), (Long, Long, Double)] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}

  @transient private var totals: ValueState[(Long, Double)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)]("totals",
      org.apache.spark.sql.Encoders.product[(Long, Double)], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[(Long, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
    val (n0, s0) = if (totals.exists()) totals.get() else (0L, 0.0)
    var n = n0; var s = s0
    rows.foreach { case (_, v) => n += 1; s += v }
    totals.update((n, s))
    Iterator.single((user, n, s))
  }
}
