package graft.ops

import graft.Tables
import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational core operators (SURVEY §2a–§2f).
  *
  * Every query follows the determinism protocol (SURVEY §7d): exact
  * DECIMAL accumulation for money, total ORDER BY with unique tiebreak,
  * DOUBLE only as a final single-op cast/division.
  */
object Relational {

  /** `agg_hash_groupby` — TPC-H Q1-shaped pricing summary.
    * Partial+final HashAggregate over 2 low-cardinality keys; at 100 TB
    * this is the canonical map-side-combine agg: the shuffle carries
    * only |groups|×|partitions| rows regardless of input size.
    */
  def aggHashGroupby(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li  = lineitem(spark, sfDir)
    val one = lit(1).cast(D4_2)
    li.filter($"l_shipdate" <= ntz("2000-12-01 00:00:00"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(money($"l_quantity")).as("_sum_qty"),
        sum(money($"l_extendedprice")).as("_sum_base"),
        sum(money($"l_extendedprice") * (one - rate($"l_discount"))).as("_sum_disc"),
        sum(money($"l_extendedprice") * (one - rate($"l_discount")) *
          (one + rate($"l_tax"))).as("_sum_charge"),
        sum(rate($"l_discount")).as("_sum_d"),
        count(lit(1)).as("count_order"))
      .select(
        $"l_returnflag", $"l_linestatus",
        $"_sum_qty".cast(DoubleType).as("sum_qty"),
        $"_sum_base".cast(DoubleType).as("sum_base_price"),
        $"_sum_disc".cast(DoubleType).as("sum_disc_price"),
        $"_sum_charge".cast(DoubleType).as("sum_charge"),
        ($"_sum_qty".cast(DoubleType) / $"count_order").as("avg_qty"),
        ($"_sum_base".cast(DoubleType) / $"count_order").as("avg_price"),
        ($"_sum_d".cast(DoubleType) / $"count_order").as("avg_disc"),
        $"count_order")
      .orderBy($"l_returnflag", $"l_linestatus")
  }
}
