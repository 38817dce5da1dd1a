package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 28: randomized-response local differential
  * privacy and IN-list predicate pushdown.
  */
object Round13Ops28 {

  /** Randomized response (the classic ε-LDP mechanism) on a sensitive
    * binary attribute: with probability p=3/4 a customer reports the
    * truth, otherwise a fair coin — then the aggregate DEBIASES the
    * reported rate back to an unbiased population estimate:
    * π̂ = (r − (1−p)/2) / p. The coins are integer hash functions of
    * the key, so the whole mechanism is replayable and oracle-exact
    * while keeping the real shape (per-row perturbation, aggregate
    * debiasing — the estimate is good, each individual row is
    * deniable). The true rate rides along as the audit column a real
    * deployment wouldn't have.
    */
  def pipelineLdpRandomizedResponse(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val truth = ($"c_mktsegment" === "BUILDING")
    val coin1 = pmod($"c_custkey" * 2654435761L, lit(100L)) < 75
    val coin2 = pmod($"c_custkey" * 40503L, lit(100L)) < 50
    val g = customer(spark, sfDir)
      .select(truth.as("t"),
        when(coin1, truth).otherwise(coin2).as("reported"))
      .agg(count(lit(1)).as("n"),
        sum(when($"t", 1L).otherwise(0L)).as("true_count"),
        sum(when($"reported", 1L).otherwise(0L)).as("reported_count"))
    val nD = $"n".cast(DoubleType)
    val r = $"reported_count".cast(DoubleType) / nD
    val est = (r - lit(0.125)) / lit(0.75)
    val truRate = $"true_count".cast(DoubleType) / nD
    g.select($"n", $"true_count", $"reported_count",
      round(r, 6).as("reported_rate"),
      round(est, 6).as("debiased_rate"),
      round(truRate, 6).as("true_rate"),
      round(abs(est - truRate), 6).as("abs_err"))
  }

  /** IN-list pushdown: a 40-key membership predicate must reach the
    * parquet scan as a pushed In filter (dictionary/row-group pruning
    * applies to IN just like to ranges) — Round13Spec28 pins
    * `PushedFilters: [In(o_custkey, ...)]`. The keys are generated
    * arithmetically so the op needs no driver-side literal blob.
    */
  def filterPushdownIn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val keys = (1 to 40).map(i => (i * 37L) % 1500)
    orders(spark, sfDir)
      .filter($"o_custkey".isin(keys: _*))
      .agg(count(lit(1)).as("n"),
        countDistinct($"o_custkey").as("n_keys_hit"),
        sum((money($"o_totalprice") * 100).cast(LongType)).as("sum_cents"))
  }
}
