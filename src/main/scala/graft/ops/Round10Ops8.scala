package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-10 widening, part 8: grid-bucketed spatial radius join,
  * cross-engine-safe formatting, try_cast ingestion hygiene, and
  * row-content fingerprinting.
  */
object Round10Ops8 {

  /** Spatial radius join on the (price/100, size) plane via GRID
    * BUCKETING — the classic spatial-join shape: each point lands in
    * one r×r cell, candidate pairs come only from the 3×3 neighbor
    * cells (an equi-join on cell ids, never a cross product), and the
    * exact Euclidean test runs per candidate. r = 0.25 is a power of
    * two, so x/r is an exact double multiply and both engines bucket
    * identically. Output is each part's neighbor count — pair volume
    * is density-bounded per cell at any corpus size.
    *
    * DENSITY-BOUND (round-14 10× probe: 79×): this synthetic plane
    * has FIXED extent, so 10× points is 10× density and the true
    * neighbor count per point — the op's own output — grows 10× with
    * it; candidate work tracks Σ cell² = Θ(n·density), within the
    * constant 9-cell factor of the true pair count, so the PLAN is
    * optimal for the semantics. A real spatial corpus at 100 TB grows
    * its extent (more cells), not its density, and this same plan is
    * then linear.
    */
  def joinSpatialGrid(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val r = 0.25
    val pts = part(spark, sfDir).select(
      $"p_partkey".as("id"),
      ($"p_retailprice" / 100.0).as("x"),
      $"p_size".cast(DoubleType).as("y"))
      .withColumn("cx", floor($"x" / r).cast(LongType))
      .withColumn("cy", floor($"y" / r).cast(LongType))
    val probes = pts
      .withColumn("dxy", explode(expr(
        "transform(sequence(0, 8), i -> named_struct('dx', i div 3 - 1, 'dy', i % 3 - 1))")))
      .select($"id".as("id_a"), $"x".as("xa"), $"y".as("ya"),
        ($"cx" + $"dxy.dx").as("cx"), ($"cy" + $"dxy.dy").as("cy"))
    probes.join(
        pts.select($"id".as("id_b"), $"x".as("xb"), $"y".as("yb"),
          $"cx", $"cy"),
        Seq("cx", "cy"))
      .filter($"id_a" =!= $"id_b")
      .filter(($"xa" - $"xb") * ($"xa" - $"xb") +
        ($"ya" - $"yb") * ($"ya" - $"yb") <= lit(r * r))
      .groupBy($"id_a".as("p_partkey"))
      .agg(count(lit(1)).as("n_neighbors"))
      .orderBy($"p_partkey")
  }

  /** Cross-engine-safe formatting: the subset of string rendering that
    * is bit-identical on Spark and DuckDB — date patterns (yyyy-MM ↔
    * strftime %Y-%m), DECIMAL-to-string (scale-preserving on both;
    * never format a raw DOUBLE, its shortest-repr rules differ), and
    * zero-padding. The op doubles as the protocol's documentation.
    */
  def fnFormatPatterns(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .filter($"o_orderkey" % 100 === 0)
      .select(
        $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM").as("ym_str"),
        date_format($"o_orderdate", "yyyy-MM-dd").as("date_str"),
        money($"o_totalprice").cast(StringType).as("price_str"),
        lpad($"o_orderkey".cast(StringType), 10, "0").as("key_padded"),
        concat($"o_orderstatus", lit("/"), $"o_orderpriority")
          .as("status_tag"))
      .orderBy($"o_orderkey")
  }

  /** try_cast ingestion hygiene: a dirty string column (well-formed
    * ids, '#'-prefixed junk, padded literals) parsed with try_cast —
    * NULL on failure instead of a job abort, the ANSI-safe ingest
    * path. Census of parse outcomes per event type; strings are built
    * from integers only (never render a DOUBLE to string — engine
    * repr rules differ).
    */
  def fnTryCast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select($"event_type", $"event_id",
        when($"event_id" % 3 === 0, $"event_id".cast(StringType))
          .when($"event_id" % 3 === 1,
            concat(lit("#"), $"event_id".cast(StringType)))
          .otherwise(concat(lit("  "), $"event_id".cast(StringType), lit("  ")))
          .as("raw"))
      .withColumn("parsed", expr("try_cast(raw AS BIGINT)"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_rows"),
        count($"parsed").as("n_parsed"),
        count(when($"parsed".isNull, 1)).as("n_rejected"),
        sum($"parsed").as("sum_parsed"))
      .orderBy($"event_type")
  }

  /** 2-D histogram of the part catalog on (price, size) bins — the
    * joint-distribution profile a pricing dashboard heatmaps. One
    * grouped aggregate; bin ids are floor divisions (single exact
    * double op each, identical on both engines); output is bounded by
    * the bin grid, not the table.
    */
  def aggHistogram2d(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    part(spark, sfDir)
      .groupBy(
        floor($"p_retailprice" / 200.0).cast(LongType).as("price_bin"),
        floor($"p_size" / 10.0).cast(LongType).as("size_bin"))
      .agg(count(lit(1)).as("n_parts"),
        sum(money($"p_retailprice")).as("_sv"))
      .select($"price_bin", $"size_bin", $"n_parts",
        $"_sv".cast(DoubleType).as("bin_value"))
      .orderBy($"price_bin", $"size_bin")
  }

  /** Rolling z-score over a 20-row frame per event type: the frame's
    * mean/variance come from exact-DECIMAL rolling Σx and Σx² (window
    * sums over a constant frame — per-row O(1) state at any scale),
    * and the z formula runs once on doubles rounded at 6dp. Only full
    * frames emit, and zero-variance frames are excluded by an exact
    * DECIMAL comparison (a double sqrt(0) division would diverge as
    * inf/NaN across engines).
    *
    * CHUNKED TWO-PHASE ROLLING SUMS (round-16 rewrite): the naive
    * `Window.partitionBy(event_type)` form caps parallelism at the 5
    * distinct event types forever — each task sorts n/5 rows, the one
    * scale ceiling on the board. This form distributes the SAME frame:
    *   1. intra-(type, calendar-day) row_number — |types|×|days| tasks,
    *      each sorting one day's slice (day = date(ts) is monotone in
    *      ts, so (day, ts, event_id) order IS (ts, event_id) order);
    *   2. the per-(type, day) census (a |types|×|days|-row rollup) gets
    *      running offsets, so off + intra_rank is the exact global
    *      position rn within the type — the bucket-offset pattern;
    *   3. rows land in fixed 1024-row chunks by rn; the last 19 rows of
    *      each chunk are REPLICATED into the next chunk (1.9% overlap), so
    *      a chunk-local 20-row frame over rn sees exactly the same 19
    *      predecessors the global frame would — n/1024 independent
    *      window tasks, parallelism grows linearly with the data.
    * Frames short of 20 rows (nf < 20) only occur at the true start of
    * each type (chunk 0), identical to the global form's warm-up.
    */
  def tsRollingZscore(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val chunkRows = 1024
    val pos = TwoPhase.eventPositions(spark, sfDir, chunkRows)
    val wChunk = Window.partitionBy($"event_type", $"chunk").orderBy($"rn")
      .rowsBetween(-19, Window.currentRow)
    TwoPhase.withCarries(pos, chunkRows, before = 19, after = 0)
      .withColumn("nf", count(lit(1)).over(wChunk))
      .withColumn("sx", sum($"x").over(wChunk).cast(DecimalType(18, 2)))
      .withColumn("sxx", sum($"x" * $"x").over(wChunk).cast(DecimalType(28, 4)))
      .filter(!$"is_carry" && $"nf" === 20 && $"sxx" * 20 - $"sx" * $"sx" > 0)
      .selectExpr("event_type", "event_id",
        """round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / 20)
          | / sqrt((20 * CAST(sxx AS DOUBLE)
          |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (20 * 19)), 6)
          |AS zscore""".stripMargin.replace("\n", " "))
      .orderBy($"event_type", $"event_id")
  }

  /** Word-length histogram per language — the morphology profile a
    * corpus card plots (CJK vs alphabetic languages separate sharply).
    * Explode → two bounded rollups; output is (lang × max word
    * length)-bounded.
    */
  def textWordlenProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .select($"lang", explode(split($"text", " ")).as("tok"))
      .groupBy($"lang", length($"tok").as("wlen"))
      .agg(count(lit(1)).as("n_tokens"))
      .orderBy($"lang", $"wlen")
  }

  /** Row-content fingerprinting for change detection: md5 over a
    * '|'-separated canonical rendering of each order row (key columns,
    * scale-2 DECIMAL price string, formatted date — every piece is
    * from the cross-engine-safe formatting subset). The summary proves
    * fingerprints are collision-free over the table; at 100 TB the
    * same expression keys an incremental anti-join (detect
    * changed/new rows without comparing every column).
    */
  def pipelineRowFingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select(md5(concat_ws("|",
        $"o_orderkey".cast(StringType),
        $"o_custkey".cast(StringType),
        $"o_orderstatus",
        money($"o_totalprice").cast(StringType),
        date_format($"o_orderdate", "yyyy-MM-dd"),
        $"o_orderpriority")).as("fp"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct($"fp").as("n_distinct_fp"),
        min($"fp").as("min_fp"), max($"fp").as("max_fp"))
  }
}
