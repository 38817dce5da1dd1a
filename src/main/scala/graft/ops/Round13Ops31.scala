package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 31: Markov-chain information metrics over
  * per-user event sequences.
  */
object Round13Ops31 {

  private def transitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events(spark, sfDir)
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("nxt", lead($"event_type", 1).over(w))
      .filter($"nxt".isNotNull)
      .groupBy($"event_type".as("a"), $"nxt".as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** Entropy rate of the per-user event-type Markov chain:
    * H = −Σ_ij (c_ij/N)·log2(c_ij/out_i) — how predictable the NEXT
    * action is given the current one, the sequence-compressibility
    * number a behavioral model is graded against. One keyed lag to
    * transition counts (exact integers), per-cell terms frozen at
    * 9 dp as DECIMAL before the global sum, a log2(#states) ceiling
    * for context.
    */
  def tsMarkovEntropyRate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = transitions(spark, sfDir)
    val outs = t.groupBy($"a".as("a2")).agg(sum($"c").as("outc"))
    val tot = t.agg(sum($"c").as("n"), countDistinct($"a").as("k"))
    val term = ($"c".cast(DoubleType) / $"n") *
      log2($"c".cast(DoubleType) / $"outc")
    t.join(broadcast(outs), $"a" === $"a2")
      .crossJoin(broadcast(tot))
      .select($"n", $"k",
        round(-term, 9).cast(DecimalType(28, 9)).as("tm"))
      .groupBy($"n", $"k")
      .agg(sum($"tm").as("st"))
      .select($"n".as("n_transitions"), $"k".as("n_states"),
        round($"st".cast(DoubleType), 6).as("entropy_rate_bits"),
        round(log2($"k".cast(DoubleType)), 6).as("max_entropy_bits"))
  }

  /** The 1-step Markov predictor scored in-sample: predict the most
    * frequent successor of each state (ties to the lexicographically
    * smallest), accuracy = mass of correctly predicted transitions —
    * the baseline every sequence model must beat, computed with one
    * argmax over the transition table and no second data pass.
    */
  def mlMarkovNextEventAcc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = transitions(spark, sfDir)
    // min_by over (−count, successor): the min of −c is the max count,
    // and string ties fall to the lexicographically smallest successor
    val pred = t.groupBy($"a")
      .agg(min_by($"b", struct((-$"c").as("nc"), $"b")).as("predicted"),
        sum($"c").as("out_total"),
        max($"c").as("best_count"))
    pred.select($"a".as("state"), $"predicted", $"out_total",
        $"best_count",
        round($"best_count".cast(DoubleType) / $"out_total", 6)
          .as("in_sample_accuracy"))
      .orderBy($"state")
  }
}
