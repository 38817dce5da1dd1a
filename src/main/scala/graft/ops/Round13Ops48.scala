package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 48: one spherical k-means assignment
  * round and two-model uplift estimation.
  */
object Round13Ops48 {

  /** One spherical k-means assignment round with vec_ids 0–4 as
    * seeds: every other vector goes to its max-cosine seed (ties to
    * the smaller seed id via the ranking tiebreak), and each
    * cluster reports size and its cosine-similarity envelope with
    * 9dp-frozen terms so the means are shuffle-order-proof. The
    * assignment pass is the 5-row broadcast × corpus scan shape that
    * any k-means-at-scale iteration reduces to.
    */
  def simSphericalAssignRound(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val t = embeddings(spark, sfDir)
    val seeds = t.filter($"vec_id" <= 4)
      .select($"vec_id".as("seed_id"), $"embedding".as("se"))
    val scored = t.filter($"vec_id" > 4)
      .crossJoin(broadcast(seeds))
      .select($"vec_id", $"seed_id",
        (expr("graft_dot(embedding, se)") /
          (sqrt(expr("graft_dot(embedding, embedding)")) *
            sqrt(expr("graft_dot(se, se)")))).as("cos"))
    val assigned = scored.withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cos".desc, $"seed_id")))
      .filter($"rn" === 1)
    assigned.groupBy($"seed_id")
      .agg(count(lit(1)).as("n_assigned"),
        sum(round($"cos", 9).cast(DecimalType(20, 9))).as("sc"),
        round(min($"cos"), 6).as("min_cos"),
        round(max($"cos"), 6).as("max_cos"))
      .select($"seed_id", $"n_assigned",
        round($"sc".cast(DoubleType) / $"n_assigned", 6).as("avg_cos"),
        $"min_cos", $"max_cos")
      .orderBy($"seed_id")
  }

  /** Two-model uplift per priority segment: "treatment" is a
    * deterministic md5 coin on the customer key (reproducible A/B
    * arms without a stored assignment table), outcome is order
    * fulfillment, uplift = treated rate − control rate. Exact
    * integer cells, one mirrored subtraction — the causal-lift
    * readout a targeting model is validated against.
    */
  def mlUpliftTwoModel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, sfDir)
      .select(substring($"o_orderpriority", 1, 1).as("segment"),
        (substring(md5($"o_custkey".cast(StringType)), 1, 1) <= "7")
          .cast(IntegerType).as("treat"),
        when($"o_orderstatus" === "F", 1L).otherwise(0L).as("y"))
    o.groupBy($"segment")
      .agg(sum(when($"treat" === 1, 1L).otherwise(0L)).as("n_t"),
        sum(when($"treat" === 1, $"y").otherwise(0L)).as("y_t"),
        sum(when($"treat" === 0, 1L).otherwise(0L)).as("n_c"),
        sum(when($"treat" === 0, $"y").otherwise(0L)).as("y_c"))
      .select($"segment", $"n_t", $"y_t", $"n_c", $"y_c",
        round($"y_t".cast(DoubleType) / $"n_t", 6).as("rate_treat"),
        round($"y_c".cast(DoubleType) / $"n_c", 6).as("rate_control"),
        round($"y_t".cast(DoubleType) / $"n_t" -
          $"y_c".cast(DoubleType) / $"n_c", 6).as("uplift"))
      .orderBy($"segment")
  }
}
