package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 47: SRE multiwindow burn-rate alerting
  * and integer-exact byte humanization.
  */
object Round13Ops47 {

  /** Multiwindow SLO burn-rate paging over the event stream: hourly
    * error share against a 25% error budget, alerting only when BOTH
    * the fast (1 h) and slow (6 h) windows burn above 1× — the
    * standard two-window rule that suppresses blips without missing
    * sustained burns. Counts are exact integers; the two burn ratios
    * are mirrored doubles rounded at 4 dp; the page flag compares the
    * same doubles on both engines. Hour grid is calendar-bounded.
    */
  def pipelineSloBurnAlert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // trailing 6-hour sums as array-slice folds over the collected
    // hour grid (calendar-bounded) — no unpartitioned rolling Window
    val arr = events(spark, sfDir)
      .groupBy(date_trunc("hour", $"ts").as("h"))
      .agg(count(lit(1)).as("n"),
        sum(when($"event_type" === "error", 1L).otherwise(0L)).as("e"))
      .agg(array_sort(collect_list(struct($"h", $"n", $"e"))).as("s"))
      .select($"s", expr("transform(s, x -> x.n)").as("ns"),
        expr("transform(s, x -> x.e)").as("es"))
    arr.select(posexplode($"s").as(Seq("p", "x")), $"ns", $"es")
      .filter($"p" >= 5)
      .select($"x.h".as("h"), $"x.n".as("n"), $"x.e".as("e"),
        expr("aggregate(slice(ns, p - 4, 6), CAST(0 AS BIGINT), (a, v) -> a + v)")
          .as("n6"),
        expr("aggregate(slice(es, p - 4, 6), CAST(0 AS BIGINT), (a, v) -> a + v)")
          .as("e6"))
      .select($"h", $"n", $"e",
        round($"e".cast(DoubleType) * 4.0 / $"n", 4).as("burn_1h"),
        round($"e6".cast(DoubleType) * 4.0 / $"n6", 4).as("burn_6h"),
        ($"e".cast(DoubleType) * 4.0 / $"n" > 1.0 &&
          $"e6".cast(DoubleType) * 4.0 / $"n6" > 1.0)
          .cast(LongType).as("page"))
      .orderBy($"h")
  }

  /** Byte-count humanization in pure integer arithmetic: unit chosen
    * by threshold CASE, one decimal digit via (b·10 div 1024^k) —
    * no float formatting, so the strings match across engines
    * byte-for-byte. Applied to per-type payload estimates.
    */
  def fnHumanizeBytes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = events(spark, sfDir)
      .groupBy($"event_type")
      .agg(sum(length($"props") + 64).cast(LongType).as("b"))
    t.select($"event_type", $"b",
        expr("""CASE WHEN b >= 1073741824 THEN 3
          WHEN b >= 1048576 THEN 2 WHEN b >= 1024 THEN 1
          ELSE 0 END""").as("k"))
      .withColumn("s10", expr(
        "b * 10 div (CASE k WHEN 0 THEN 1 WHEN 1 THEN 1024 " +
          "WHEN 2 THEN 1048576 ELSE 1073741824 END)"))
      .select($"event_type", $"b".as("bytes"),
        concat(expr("s10 div 10").cast(StringType), lit("."),
          pmod($"s10", lit(10)).cast(StringType), lit(" "),
          expr("element_at(array('B','KiB','MiB','GiB'), CAST(k + 1 AS INT))"))
          .as("human"))
      .orderBy($"event_type")
  }
}
