package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 49: Lorenz asymmetry and rich-club
  * coefficients.
  */
object Round13Ops49 {

  /** Lorenz asymmetry coefficient S = F(μ) + L(μ): whether revenue
    * inequality comes from a few huge orders (S > 1) or a mass of
    * tiny ones (S < 1) — the shape diagnostic the Gini alone can't
    * give. "Below the mean" is decided by the exact cross-multiplied
    * comparison c·n < T, so no float mean ever classifies a row;
    * both components are ratios of exact integers.
    */
  def analyticLorenzAsymmetry(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = orders(spark, sfDir)
      .select((money($"o_totalprice") * 100).cast(LongType).as("c"))
    val tot = o.agg(count(lit(1)).as("n"), sum($"c").as("t"))
    o.crossJoin(broadcast(tot))
      .agg(max($"n").as("n"), max($"t").as("total_cents"),
        sum(when($"c" * $"n" < $"t", 1L).otherwise(0L)).as("m"),
        sum(when($"c" * $"n" < $"t", $"c").otherwise(0L)).as("sb"))
      .select($"n", $"total_cents", $"m".as("n_below_mean"),
        round($"m".cast(DoubleType) / $"n", 6).as("f_mu"),
        round($"sb".cast(DoubleType) / $"total_cents", 6).as("l_mu"),
        round($"m".cast(DoubleType) / $"n" +
          $"sb".cast(DoubleType) / $"total_cents", 6).as("asymmetry_s"))
  }

  /** Rich-club coefficients φ(k) for k ∈ {2,4,8,16}: among nodes of
    * degree > k, the realized fraction of possible edges — do the
    * hubs of the part–supplier graph preferentially interconnect?
    * Exact integer degree thresholds and edge counts; one degree
    * rollup reused across all four k by a tiny threshold cross join.
    */
  def graphRichClub(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val und = Round10Ops4.thinnedGraph(spark, sfDir)
    val deg = und.select($"u".as("node"))
      .union(und.select($"v".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("dg"))
    val ks = Seq(2L, 4L, 8L, 16L).toDF("k")
    val nodesK = deg.crossJoin(broadcast(ks))
      .filter($"dg" > $"k")
      .groupBy($"k").agg(count(lit(1)).as("n_k"))
    val du = deg.select($"node".as("u2"), $"dg".as("du"))
    val dv = deg.select($"node".as("v2"), $"dg".as("dv"))
    val edgesK = und.join(du, $"u" === $"u2").join(dv, $"v" === $"v2")
      .crossJoin(broadcast(ks.select($"k".as("k2"))))
      .filter($"du" > $"k2" && $"dv" > $"k2")
      .groupBy($"k2".as("k")).agg(count(lit(1)).as("e_k"))
    nodesK.join(edgesK, Seq("k"), "left")
      .select($"k", $"n_k", coalesce($"e_k", lit(0L)).as("e_k"))
      .withColumn("phi", when($"n_k" < 2, lit(0.0))
        .otherwise(round(lit(2.0) * $"e_k" /
          ($"n_k" * ($"n_k" - 1)).cast(DoubleType), 6)))
      .orderBy($"k")
  }
}
