package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Readers for the driver-generated testdata (schemas in FIXTURES.md).
  *
  * All tables are single parquet files per scale-factor directory. Two
  * type quirks are handled centrally here so every operator downstream
  * sees clean, oracle-comparable types:
  *
  *  1. `events.ts` is parquet `TIMESTAMP(NANOS, isAdjustedToUTC=false)`,
  *     which Spark's vectorized reader rejects outright
  *     ([PARQUET_TYPE_ILLEGAL]). We read it via
  *     `spark.sql.legacy.parquet.nanosAsLong=true` (int64 nanoseconds)
  *     and floor-truncate to microseconds, matching DuckDB's native
  *     ns→µs parquet conversion bit-for-bit.
  *  2. `orders.o_orderdate` / `lineitem.l_shipdate` are parquet
  *     MILLIS with isAdjustedToUTC=false → Spark `TimestampNTZType`.
  *     Comparisons must use NTZ literals (see [[Tables.ntz]]).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, sfDir)
      case n        => spark.read.parquet(s"$sfDir/$n.parquet")
    }

  def region(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame      = apply(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame    = apply(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame  = apply(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")

  /** events with `ts` converted to a clean `TIMESTAMP_NTZ` (µs).
    * `ts DIV 1000` floor-truncates ns→µs exactly as DuckDB's parquet
    * reader does, so oracle comparisons are exact.
    *
    * NOTE: setting `nanosAsLong` is session-global by necessity — the
    * flag is read at scan execution, not plan time, so it cannot be
    * scoped per-read. It only affects parquet files with NANOS
    * timestamps (which Spark would otherwise refuse to read at all).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        // NANOS layout (pre-2026-08-13 generator): int64 ns under the
        // legacy flag. Floor division in exact integer math
        // (ts - pmod(ts,1000) is a multiple of 1000): plain DIV
        // truncates toward zero and would be 1µs off DuckDB's floored
        // ns→µs conversion for pre-1970 (negative) nanosecond
        // timestamps. No double round-trip — int64 ns exceeds double's
        // 53-bit mantissa.
        raw.withColumn("ts",
          expr("CAST(timestamp_micros(CAST((ts - pmod(ts, 1000)) DIV 1000 AS BIGINT)) AS TIMESTAMP_NTZ)"))
      case _: TimestampNTZType =>
        // MICROS/adjUTC=false layout (2026-08-13 regeneration): Spark
        // reads TIMESTAMP_NTZ µs natively, bit-identical to DuckDB.
        raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unexpected parquet-read type $other — " +
            "expected int64 ns (legacy) or TIMESTAMP_NTZ µs")
    }
  }

  // ---- determinism-protocol helpers (SURVEY §7d) ----

  /** Money values (DOUBLE ~< 1e6, 2dp) cast exact for associative sums. */
  val D12_2: DecimalType = DecimalType(12, 2)
  /** Rates (discount/tax, 2dp in [0,1)) cast exact. */
  val D4_2: DecimalType = DecimalType(4, 2)

  def money(c: Column): Column = c.cast(D12_2)
  def rate(c: Column): Column  = c.cast(D4_2)

  /** NTZ timestamp literal — safe to compare against MILLIS-NTZ columns. */
  def ntz(s: String): Column = expr(s"TIMESTAMP_NTZ '$s'")

  /** Per-session-unique tmp-path suffix: two concurrent runs (e.g. an
    * sf0.1 bench alongside an sf0.01 verify) must not race on a shared
    * /tmp directory mid-overwrite. Same construction as Sources.tag.
    *
    * Tagged dirs are GC'd two ways (round-13 advisory: per-run tags
    * fixed the cross-run race but leaked a fresh dir set per
    * application): a shutdown hook removes THIS application's dirs,
    * and a once-per-JVM startup sweep removes dirs from crashed runs
    * older than 6 h — old enough that no legitimately concurrent
    * session (minutes apart) can still be writing them.
    */
  def runTag(spark: SparkSession, sfDir: String): String = {
    registerTmpCleanup(spark.sparkContext.applicationId)
    touchHeartbeat(spark.sparkContext.applicationId)
    sfDir.hashCode.toHexString + "_" + spark.sparkContext.applicationId
  }

  private val cleanupRegistered =
    new java.util.concurrent.atomic.AtomicBoolean(false)

  // Per-run-tagged dirs carry the Spark appId ("local-<ts>") in their
  // name; persistent cross-run caches (graft_mat, graft_bucketed,
  // graft_models) do not, and are deliberately excluded.
  private def taggedTmpDirs(): Array[java.io.File] =
    Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_") &&
        f.getName.contains("_local-"))

  // never recurse THROUGH a directory symlink: /tmp is world-writable,
  // and a link planted inside a graft dir must not let the sweep reach
  // outside it (round-13 advisory). The link itself is still removed.
  private def rmTree(f: java.io.File): Unit = {
    if (!java.nio.file.Files.isSymbolicLink(f.toPath))
      Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  private def registerTmpCleanup(appId: String): Unit =
    if (cleanupRegistered.compareAndSet(false, true)) {
      val staleMs = 6L * 3600 * 1000
      val now = System.currentTimeMillis()
      // Staleness keys off an explicit heartbeat file, not the dir's
      // own mtime: a directory mtime is frozen once its entries stop
      // changing, so a >6h session still READING its per-run dirs
      // would have been reaped mid-read by a newly started session
      // (round-13 advisory). Every sweep touches the heartbeat of the
      // dirs belonging to LIVE use (ours, via runTag on every call);
      // dirs whose heartbeat (or, for pre-heartbeat dirs, mtime) is
      // >6h old belong to crashed runs.
      taggedTmpDirs()
        .filter { f =>
          val hb = new java.io.File(f, "_heartbeat")
          val ts = if (hb.exists()) hb.lastModified() else f.lastModified()
          now - ts > staleMs
        }
        .foreach(rmTree)
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        taggedTmpDirs().filter(_.getName.endsWith("_" + appId)).foreach(rmTree)))
    }

  /** Refresh the heartbeat of THIS application's tagged dirs. Called
    * from runTag — i.e. on every tagged-path construction — so any
    * dir the session still uses carries a fresh heartbeat even when
    * its payload files are only being read (reads don't bump mtime).
    */
  private def touchHeartbeat(appId: String): Unit =
    try taggedTmpDirs().filter(_.getName.endsWith("_" + appId)).foreach { f =>
      val hb = new java.io.File(f, "_heartbeat")
      hb.createNewFile()
      hb.setLastModified(System.currentTimeMillis()); ()
    } catch { case _: Throwable => () }
}
