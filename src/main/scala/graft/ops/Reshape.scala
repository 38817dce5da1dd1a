package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reshaping operators (round-2 widening of SURVEY §2d/§2g): pivot /
  * unpivot, ordered string aggregation, deterministic mode, and the
  * generator (explode) surface.
  *
  * Scale notes: pivot with an explicit value list is a single two-phase
  * hash aggregation (no second shuffle, no driver-side distinct-value
  * scan); unpivot is a zero-shuffle Expand; mode is a count-shuffle plus
  * a per-group top-1 window over the (small) distinct-value set.
  */
object Reshape {

  /** Pivot order counts + revenue by status into one row per priority.
    * The value list is explicit (F/O/P), so Catalyst skips the eager
    * distinct-value job it would otherwise run on the driver — at 100 TB
    * an implicit pivot would scan the fact table twice.
    */
  def aggPivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)).as("cnt"), sum(money($"o_totalprice")).as("rev"))
      // empty cells: Spark pivot yields NULL where a plain conditional
      // count yields 0 — coalesce so both engines agree on sparse data
      .select($"o_orderpriority",
        coalesce($"F_cnt", lit(0L)).as("f_cnt"), $"F_rev".cast(DoubleType).as("f_rev"),
        coalesce($"O_cnt", lit(0L)).as("o_cnt"), $"O_rev".cast(DoubleType).as("o_rev"),
        coalesce($"P_cnt", lit(0L)).as("p_cnt"), $"P_rev".cast(DoubleType).as("p_rev"))
      .orderBy($"o_orderpriority")
  }

  /** Unpivot (wide → long): per-returnflag metrics to (flag, metric,
    * value) rows via Expand — no shuffle beyond the base aggregation.
    */
  def aggUnpivot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wide = lineitem(spark, sfDir)
      .groupBy($"l_returnflag")
      .agg(
        sum(money($"l_quantity")).cast(DoubleType).as("sum_qty"),
        sum(money($"l_extendedprice")).cast(DoubleType).as("sum_price"),
        count(lit(1)).cast(DoubleType).as("n_rows"))
    wide.unpivot(
        Array($"l_returnflag"),
        Array($"sum_qty", $"sum_price", $"n_rows"),
        "metric", "value")
      .orderBy($"l_returnflag", $"metric")
  }

  /** Ordered string aggregation (listagg): statuses per customer in
    * o_orderkey order. The sort key rides inside the collected struct,
    * so ordering is total and engine-independent.
    */
  def aggStringAgg(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .groupBy($"o_custkey")
      .agg(
        concat_ws(",",
          transform(
            array_sort(collect_list(struct($"o_orderkey", $"o_orderstatus"))),
            s => s.getField("o_orderstatus"))).as("statuses"),
        count(lit(1)).as("n_orders"))
      .orderBy($"o_custkey")
  }

  /** Deterministic mode: most frequent JSON `k` per event type, ties
    * broken toward the smallest k (raw mode() is tie-unstable across
    * engines, so the argmax is spelled out).
    */
  def aggMode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val counts = events(spark, sfDir)
      .select($"event_type",
        get_json_object($"props", "$.k").cast(IntegerType).as("k"))
      // drop NULL k before the argmax: Spark sorts NULLs first on ASC,
      // DuckDB last, so a count tie against a NULL-k group would pick
      // different mode rows per engine (oracle filters identically)
      .filter($"k".isNotNull)
      .groupBy($"event_type", $"k")
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("rn", row_number().over(
        Window.partitionBy($"event_type").orderBy($"n".desc, $"k".asc)))
      .filter($"rn" === 1)
      .select($"event_type", $"k".as("mode_k"), $"n".as("n_occurrences"))
      .orderBy($"event_type")
  }

  /** Generator surface: posexplode over tokenized documents — one
    * (doc_id, pos, tok) row per token, bounded to a doc_id slice so the
    * output stays comparison-sized.
    */
  def fnExplode(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .filter($"doc_id" < 50)
      .select($"doc_id", posexplode(split($"text", " ")))
      .select($"doc_id", $"pos".cast(LongType).as("pos"), $"col".as("tok"))
      .orderBy($"doc_id", $"pos")
  }
}
