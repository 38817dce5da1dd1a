package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 51: per-tile payload entropy and
  * record-break counting.
  */
object Round13Ops51 {

  /** Tile-level payload entropy: each document's payload (STUB: its
    * text bytes, the repo's multimodal convention) is cut into
    * 64-byte tiles and each full tile gets a byte-histogram entropy —
    * the compressibility screen that flags already-compressed or
    * constant regions before a decode pool wastes time on them.
    * Per-tile entropies are sums of 9dp-frozen terms; the per-doc
    * mean refreezes per-tile values, so no double ever crosses a
    * shuffle. Work is strictly per-doc-bounded (≤ 8 tiles).
    */
  def multimodalTileEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val tiles = documents(spark, sfDir)
      .filter($"doc_id" < 100 && length($"text") >= 64)
      .select($"doc_id", $"text")
      .withColumn("ti", explode(expr(
        "sequence(1, least(8, length(text) div 64))")))
      .select($"doc_id", $"ti",
        substring($"text", ($"ti" - 1) * 64 + 1, lit(64)).as("tile"))
    val chars = tiles
      .select($"doc_id", $"ti", explode(split($"tile", "")).as("ch"))
      .groupBy($"doc_id", $"ti", $"ch").agg(count(lit(1)).as("c"))
    val perTile = chars
      .withColumn("tm", round(-($"c".cast(DoubleType) / 64.0) *
        log2($"c".cast(DoubleType) / 64.0), 9).cast(DecimalType(20, 9)))
      .groupBy($"doc_id", $"ti").agg(sum($"tm").as("h"))
      .select($"doc_id", $"ti",
        round($"h".cast(DoubleType), 9).cast(DecimalType(20, 9)).as("h9"))
    perTile.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_tiles"), sum($"h9").as("sh"),
        max($"h9").as("mx"))
      .select($"doc_id", $"n_tiles",
        round($"sh".cast(DoubleType) / $"n_tiles", 6).as("avg_entropy"),
        round($"mx".cast(DoubleType), 6).as("max_entropy"))
      .orderBy($"doc_id")
  }

  /** Record-break counting on daily revenue: how many days set a new
    * all-time high (or low)? For an iid series the expected count is
    * the harmonic number H_n ≈ ln n — far more record days means
    * trend, far fewer means early saturation. Records are exact-cents
    * comparisons against a running extreme; H_n is a sum of
    * 12dp-frozen reciprocals, so even the expectation is
    * engine-exact.
    */
  def tsRecordBreaks(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // prefix extremes as array folds over the collected calendar
    // series; the harmonic index comes from posexplode — no
    // unpartitioned Windows (plan pin)
    val arr = orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(sum((money($"o_totalprice") * 100).cast(LongType)).as("c"))
      .agg(array_sort(collect_list(struct($"d", $"c"))).as("s"))
      .select(expr("transform(s, x -> x.c)").as("cs"))
      .select($"cs", size($"cs").cast(LongType).as("n"))
    val counts = arr.select($"n", $"cs",
        expr("""CAST(1 + size(filter(
          sequence(2, CAST(size(cs) AS INT)), i ->
            element_at(cs, i) > array_max(slice(cs, 1, i - 1))))
          AS BIGINT)""").as("highs"),
        expr("""CAST(1 + size(filter(
          sequence(2, CAST(size(cs) AS INT)), i ->
            element_at(cs, i) < array_min(slice(cs, 1, i - 1))))
          AS BIGINT)""").as("lows"))
      .select($"n", $"highs", $"lows")
    val harm = arr
      .select(posexplode(expr("sequence(1, CAST(n AS INT))")).as(Seq("p", "i")))
      .select(round(lit(1.0) / $"i", 12).cast(DecimalType(20, 12))
        .as("hk"))
      .agg(sum($"hk").as("hn"))
    counts.crossJoin(broadcast(harm))
      .select($"n".as("n_days"), $"highs".as("record_highs"),
        $"lows".as("record_lows"),
        round($"hn".cast(DoubleType), 6).as("expected_iid"),
        round($"highs".cast(DoubleType) / $"hn".cast(DoubleType), 6)
          .as("high_ratio"),
        round($"lows".cast(DoubleType) / $"hn".cast(DoubleType), 6)
          .as("low_ratio"))
  }
}
