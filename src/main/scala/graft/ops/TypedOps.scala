package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed Dataset surface: a custom `Aggregator` (the type-safe
  * TypedColumn path) computing the quantity-weighted average price
  * with EXACT integer-cent accumulation — commutative/associative, so
  * partition merge order cannot perturb the result (same guarantee as
  * the decimal protocol, expressed in the typed API).
  */
object TypedOps {

  /** buffer = (Σ qty_cents × price_cents  [1e-4 units], Σ qty_cents). */
  object WeightedAvgPrice
      extends Aggregator[(Double, Double), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
      val qc = math.round(in._1 * 100) // 2dp values: exact cents
      val pc = math.round(in._2 * 100)
      (b._1 + qc * pc, b._2 + qc)
    }
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    // (units/1e4) / (cents/1e2): each step correctly rounded once —
    // bit-identical to the oracle's decimal-sum-to-double division
    override def finish(b: (Long, Long)): Double =
      (b._1.toDouble / 10000.0) / (b._2.toDouble / 100.0)
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def aggTypedAggregator(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .select($"l_returnflag".as[String],
        struct($"l_quantity", $"l_extendedprice").as[(Double, Double)])
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(WeightedAvgPrice.toColumn.name("weighted_avg_price"))
      .toDF("l_returnflag", "weighted_avg_price")
      .orderBy($"l_returnflag")
  }

  /** TPC-H Q3 shape: unshipped-revenue top-10 for one market segment —
    * the BASELINE.md q3 anchor (dim filter → two fact joins → group →
    * global top-k via TakeOrderedAndProject).
    */
  def joinQ3Topk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = ntz("1996-03-15 00:00:00")
    val one = lit(1).cast(D4_2)
    customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING")
      .join(orders(spark, sfDir), $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" < cut)
      .join(lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .filter($"l_shipdate" > cut)
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum(money($"l_extendedprice") * (one - rate($"l_discount"))).as("_rev"))
      .select($"l_orderkey", $"o_orderdate", $"_rev".cast(DoubleType).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
}
