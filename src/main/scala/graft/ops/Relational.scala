package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational core operators (SURVEY §2a–§2c).
  *
  * Every query follows the determinism protocol (SURVEY §7d): exact
  * DECIMAL accumulation for money, total ORDER BY (unique tiebreak or
  * all-output-columns), DOUBLE only as a final single-op cast/division.
  *
  * Scale notes are attached per operator: these run at sf0.01/sf0.1
  * locally but are shaped for a 1000-executor cluster — broadcast for
  * dims, partial aggregation before shuffles, single-shuffle window
  * as-of instead of an exploding theta-join.
  */
object Relational {

  private def one = lit(1).cast(D4_2)

  // ---- §2a scans / sources ----

  /** Full scan, all 11 lineitem columns, stable top-1000.
    * TakeOrderedAndProject: per-partition top-k then merge — no full
    * sort/shuffle of the table at scale.
    */
  def scanParquetFull(spark: SparkSession, sfDir: String): DataFrame = {
    val li = lineitem(spark, sfDir)
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    // order by every column for a total order on the multiset.
    li.orderBy(li.columns.map(col): _*).limit(1000)
  }

  /** 2-of-11 column projection — parquet ReadSchema must shrink to the
    * two columns (verified via explain in RelationalSpec).
    */
  def scanProjectionPruning(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Ties on (l_orderkey, l_quantity) are identical output tuples, so
    // ordering by all output columns is a total order for value-compare.
    lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_quantity")
      .orderBy($"l_orderkey", $"l_quantity")
  }

  /** Shipdate range filter — lands in parquet PushedFilters, skipping
    * row groups via min/max stats at scale.
    */
  def scanFilterPushdown(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .filter($"l_shipdate" >= ntz("1997-01-01 00:00:00") &&
        $"l_shipdate" < ntz("1998-01-01 00:00:00"))
      .select($"l_orderkey", $"l_linenumber", $"l_shipdate", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** JSON-string source: typed extraction from events.props. */
  def sourceJsonLines(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select($"event_id", $"event_type",
        get_json_object($"props", "$.k").cast(IntegerType).as("k"))
      .orderBy($"event_id")
  }

  // ---- §2b projections / filters ----

  def projectExpressions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        (money($"l_extendedprice") * (one - rate($"l_discount")))
          .cast(DoubleType).as("net_price"),
        when($"l_quantity" > 25, "bulk").otherwise("small").as("qty_class"),
        concat_ws("-", $"l_returnflag", $"l_linestatus").as("flag_status"))
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  def filterComplexPredicate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .filter($"o_orderstatus".isin("O", "F") &&
        $"o_totalprice".between(10000, 200000) &&
        ($"o_orderpriority".like("1-%") || $"o_orderpriority".like("%HIGH%")) &&
        !($"o_custkey" % 10 === 3))
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_orderkey")
  }

  /** 3-valued logic over synthesized NULLs (testdata has none). */
  def filterNullSemantics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey", nullif($"o_orderstatus", lit("P")).as("st"))
      .select($"o_orderkey", $"st",
        $"st".isNull.as("st_is_null"),
        ($"st" <=> lit("O")).as("st_nse_o"),
        coalesce($"st", lit("?")).as("st_coal"))
      .orderBy($"o_orderkey")
  }

  // ---- §2c joins ----

  /** Small dim side explicitly broadcast: zero shuffle of the fact. */
  def joinBroadcastInner(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .join(broadcast(customer(spark, sfDir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_custkey", $"c_name")
      .agg(count(lit(1)).as("n_orders"), sum(money($"o_totalprice")).as("_st"))
      .select($"c_custkey", $"c_name", $"n_orders",
        $"_st".cast(DoubleType).as("sum_total"))
      .orderBy($"c_custkey")
  }

  /** Big-big join: explicit sort-merge hint (the strategy that scales
    * when neither side broadcasts); partial agg before the group shuffle.
    */
  def joinShuffleInner(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir).hint("merge")
      .join(orders(spark, sfDir).hint("merge"), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum(money($"l_extendedprice") * (one - rate($"l_discount"))).as("_rev"))
      .select($"o_orderstatus", $"n_items", $"_rev".cast(DoubleType).as("revenue"))
      .orderBy($"o_orderstatus")
  }

  /** TPC-H Q5-shaped 6-table star join; dims broadcast, facts shuffle
    * once on their join keys, Catalyst reorders.
    */
  def joinMultiwayStar(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    customer(spark, sfDir)
      .join(orders(spark, sfDir), $"c_custkey" === $"o_custkey")
      .join(lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .join(supplier(spark, sfDir),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation(spark, sfDir)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region(spark, sfDir)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA" &&
        $"o_orderdate" >= ntz("1996-01-01 00:00:00") &&
        $"o_orderdate" < ntz("1997-01-01 00:00:00"))
      .groupBy($"n_name")
      .agg(sum(money($"l_extendedprice") * (one - rate($"l_discount"))).as("_rev"))
      .select($"n_name", $"_rev".cast(DoubleType).as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }

  def joinLeftOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    customer(spark, sfDir)
      .join(orders(spark, sfDir), $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"))
      .orderBy($"c_custkey")
  }

  /** Full outer on deliberately mismatched key sets; every output row
    * carries a unique coalesce(lkey, rkey) for total order.
    */
  def joinFullOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val l = customer(spark, sfDir)
      .filter($"c_custkey" % 2 === 0).select($"c_custkey".as("lkey"))
    val r = orders(spark, sfDir)
      .filter($"o_orderkey" % 3 === 0).select($"o_custkey".as("rkey")).distinct()
    l.join(r, $"lkey" === $"rkey", "full_outer")
      .select($"lkey", $"rkey")
      .orderBy(coalesce($"lkey", $"rkey"))
  }

  /** EXISTS: customers with at least one urgent order (left semi —
    * build side deduped by the join itself, no fact blow-up).
    */
  def joinSemi(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    customer(spark, sfDir)
      .join(orders(spark, sfDir).filter($"o_orderpriority" === "1-URGENT"),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** NOT EXISTS: customers with no orders in 1995. */
  def joinAnti(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    customer(spark, sfDir)
      .join(orders(spark, sfDir)
          .filter($"o_orderdate" >= ntz("1995-01-01 00:00:00") &&
            $"o_orderdate" < ntz("1996-01-01 00:00:00")),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  /** Non-equi range join, bounded: order pairs of the same customer
    * within 30 days. The custkey equi-key keeps it a hash/merge join
    * with a range residual — NOT a nested-loop cross product — so the
    * cost stays |customers| × (orders-per-customer)² at any scale.
    */
  def joinThetaRange(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o1 = orders(spark, sfDir)
      .select($"o_custkey".as("custkey"), $"o_orderkey".as("k1"), $"o_orderdate".as("d1"))
    val o2 = orders(spark, sfDir)
      .select($"o_custkey".as("ck2"), $"o_orderkey".as("k2"), $"o_orderdate".as("d2"))
    o1.join(o2,
        $"custkey" === $"ck2" && $"k1" < $"k2" &&
        $"d2" >= $"d1" && $"d2" <= $"d1" + expr("INTERVAL '30' DAY"))
      .select($"custkey", $"k1", $"k2")
      .orderBy($"k1", $"k2")
  }

  /** Bounded cross product: 5 regions × 25 nations. */
  def joinCrossSmall(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    region(spark, sfDir).crossJoin(nation(spark, sfDir))
      .select($"r_name", $"n_name")
      .orderBy($"r_name", $"n_name")
  }

  /** As-of join: for each purchase, the latest click of the same user
    * at-or-before it ((ts, event_id) lexicographic). Implemented as a
    * single-shuffle window over the unioned stream — the scalable form;
    * a time-conditioned join would explode to |purchases|×|prior clicks|.
    */
  def joinAsofLastEvent(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(spark, sfDir)
      .filter($"event_type".isin("click", "purchase"))
      .withColumn("click_id", when($"event_type" === "click", $"event_id"))
      .withColumn("last_click_id", last($"click_id", ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"last_click_id")
      .orderBy($"purchase_id")
  }

  // ---- §2d agg (first entry; rest in Aggregates.scala) ----

  /** `agg_hash_groupby` — TPC-H Q1-shaped pricing summary.
    * Partial+final HashAggregate over 2 low-cardinality keys; at 100 TB
    * this is the canonical map-side-combine agg: the shuffle carries
    * only |groups|×|partitions| rows regardless of input size.
    */
  def aggHashGroupby(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .filter($"l_shipdate" <= ntz("2000-12-01 00:00:00"))
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
