package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 42: capture–recapture population
  * estimation and candidate-key discovery profiling.
  */
object Round13Ops42 {

  /** Lincoln–Petersen / Chapman capture–recapture over the event log:
    * users "captured" in the first and second half of the window
    * estimate the total active population N̂ = n₁n₂/m — the standard
    * trick for sizing a user base sampled by two independent
    * observation windows. Chapman's bias-corrected variant stays in
    * pure integer division; only the classic estimate and its
    * coverage ratio are doubles.
    */
  def analyticCaptureRecapture(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, sfDir).select($"user_id", $"ts".cast(DateType).as("d"))
    val d0 = e.agg(min($"d").as("d0"))
    val caps = e.crossJoin(broadcast(d0))
      .groupBy($"user_id")
      .agg(max(when($"d" < date_add($"d0", 15), 1L).otherwise(0L)).as("w1"),
        max(when($"d" >= date_add($"d0", 15), 1L).otherwise(0L)).as("w2"))
    val c = caps.agg(sum($"w1").as("n1"), sum($"w2").as("n2"),
      sum($"w1" * $"w2").as("m"), count(lit(1)).as("observed"))
    c.select($"n1", $"n2", $"m".as("recaptured"), $"observed",
      round($"n1".cast(DoubleType) * $"n2" / $"m", 2)
        .as("lincoln_petersen"),
      (expr("(n1 + 1) * (n2 + 1) div (m + 1)") - 1).as("chapman"),
      round($"observed".cast(DoubleType) /
        (($"n1".cast(DoubleType) * $"n2") / $"m"), 6).as("coverage"))
  }

  /** Candidate-key discovery on orders: four key hypotheses profiled
    * in ONE pass (count distinct per candidate), reporting uniqueness
    * and duplication ratio — the profiling step schema inference and
    * CDC key selection both need. At scale each count-distinct is a
    * partial-aggregated shuffle; candidates share the single scan.
    */
  def pipelineCandidateKeyProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, sfDir)
    val c = o.agg(count(lit(1)).as("n"),
      countDistinct($"o_orderkey").as("d1"),
      countDistinct($"o_custkey").as("d2"),
      countDistinct($"o_custkey", $"o_orderdate").as("d3"),
      countDistinct($"o_orderdate", $"o_orderpriority", $"o_orderstatus")
        .as("d4"))
    val named = Seq(("o_orderkey", "d1"), ("o_custkey", "d2"),
      ("o_custkey,o_orderdate", "d3"),
      ("o_orderdate,o_orderpriority,o_orderstatus", "d4"))
    named.map { case (nm, col0) =>
      c.select(lit(nm).as("candidate_key"), $"n",
        col(col0).as("n_distinct"),
        (col(col0) === $"n").cast(LongType).as("is_unique"),
        round(lit(1.0) - col(col0).cast(DoubleType) / $"n", 6)
          .as("dup_ratio"))
    }.reduce(_ union _).orderBy($"candidate_key")
  }
}
