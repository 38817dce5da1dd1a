package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 50: split-conformal prediction intervals
  * and moving-average type-token diversity.
  */
object Round13Ops50 {

  /** Split-conformal interval per priority segment: an md5 coin
    * splits orders into calibration/test, the point model is the
    * exact calibration mean (truncating division), the interval
    * half-width is the TRUE 90th-percentile order statistic of
    * calibration residuals (rank ceil(0.9·n) — no interpolation, no
    * floats), and coverage is validated on the held-out half. The
    * distribution-free uncertainty wrapper every point forecaster
    * should ship with; everything is exact integers except the final
    * coverage ratios.
    */
  def mlConformalInterval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Round 20: materialize the md5-split frame once — means,
    // calibration ranking, and the test pass each re-ran the scan +
    // per-row md5 otherwise (r20 before-dump: exchange read 2× its
    // write, 1.17 s warm)
    val o = orders(spark, sfDir)
      .select(substring($"o_orderpriority", 1, 1).as("segment"),
        $"o_orderkey".as("k"),
        (money($"o_totalprice") * 100).cast(LongType).as("y"),
        (substring(md5($"o_orderkey".cast(StringType)), 1, 1) <= "7")
          .cast(IntegerType).as("cal"))
      .localCheckpoint(true)
    val means = o.filter($"cal" === 1).groupBy($"segment")
      .agg(sum($"y").as("sy"), count(lit(1)).as("n_cal"))
      .select($"segment", $"n_cal", expr("sy div n_cal").as("mean_cents"))
    val withResid = o.join(broadcast(means), "segment")
      .withColumn("r", abs($"y" - $"mean_cents"))
    val calRanked = withResid.filter($"cal" === 1)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"segment").orderBy($"r", $"k")))
      .withColumn("kq", expr("(9 * n_cal + 9) div 10"))
    val q90 = calRanked.filter($"rn" === $"kq")
      .select($"segment", $"r".as("q90_resid"))
    val test = withResid.filter($"cal" === 0)
      .join(broadcast(q90), "segment")
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_test"),
        sum(when($"r" <= $"q90_resid", 1L).otherwise(0L)).as("covered"))
    means.join(q90, "segment").join(test, "segment")
      .select($"segment", $"n_cal", $"n_test", $"mean_cents",
        $"q90_resid",
        round($"covered".cast(DoubleType) / $"n_test", 6).as("coverage"))
      .orderBy($"segment")
  }

  /** MATTR lexical diversity: type-token ratio averaged over every
    * 50-token sliding window of the doc's first 200 tokens — the
    * length-robust diversity metric (plain TTR collapses as docs
    * grow). Window distinct-counts are exact integers folded in one
    * `aggregate`; the per-doc mean is the only double. Per-doc
    * bounded work (≤151 windows × 50 tokens), embarrassingly
    * parallel over the corpus.
    */
  def textMattrDiversity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = documents(spark, sfDir)
      .filter($"doc_id" < 100)
      .select($"doc_id", slice(split($"text", " "), 1, 200).as("tk"))
      .withColumn("n", size($"tk"))
      .filter($"n" >= 50)
    t.withColumn("sd", expr("""
        aggregate(sequence(1, n - 49), CAST(0 AS BIGINT),
          (a, i) -> a + size(array_distinct(slice(tk, i, 50))))"""))
      .select($"doc_id", $"n".cast(LongType).as("n_tokens"),
        ($"n" - 49).cast(LongType).as("n_windows"),
        round($"sd".cast(DoubleType) /
          (($"n" - 49).cast(DoubleType) * 50.0), 6).as("mattr"))
      .orderBy($"doc_id")
  }
}
