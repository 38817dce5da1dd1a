package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 11: filling the thin API corners — null
  * ordering semantics, the typed groupByKey/reduceGroups path, struct
  * rewriting with withField/dropFields, and OR-predicate pushdown.
  */
object Round13Ops11 {

  /** Explicit null-ordering semantics: fulfilled orders (status 'F')
    * are nulled out, then ranked with asc_nulls_last against the
    * natural asc (nulls first) on the same key — the part of the sort
    * contract that silently flips between engines and breaks
    * pagination when unstated. Top-40 slice keyed deterministically.
    */
  def sortNullsOrdering(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey",
        nullif($"o_orderstatus", lit("F")).as("status_or_null"),
        (money($"o_totalprice") * 100).cast(LongType).as("cents"))
      .orderBy($"status_or_null".asc_nulls_last, $"cents".desc, $"o_orderkey")
      .limit(40)
      .select($"o_orderkey", $"status_or_null", $"cents")
  }

  /** The typed Dataset path: groupByKey over a case-class view and
    * reduceGroups with a deterministic lexicographic (cents, key) max
    * — object-level reduce the DataFrame API can't express without
    * max_by. The reduce function is associative and commutative, so
    * Spark map-side combines it like any aggregate — the property
    * that keeps typed reduces scale-safe. Global aggregate on top
    * keeps the oracle one row.
    */
  def typedReduceGroups(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ds = orders(spark, sfDir)
      .select($"o_custkey".as("cust"), $"o_orderkey".as("okey"),
        (money($"o_totalprice") * 100).cast(LongType).as("cents"))
      .as[(Long, Long, Long)]
    val top = ds.groupByKey(_._1)
      .reduceGroups((a, b) =>
        if (a._3 > b._3 || (a._3 == b._3 && a._2 >= b._2)) a else b)
      .map(_._2)
    top.toDF("cust", "okey", "cents")
      .agg(count(lit(1)).as("n_customers"),
        sum($"cents").as("sum_top_cents"),
        sum($"okey").as("sum_top_keys"))
  }

  /** Struct surgery with withField/dropFields — the nested-payload
    * rewrite (add a derived field, drop a sensitive one) that at
    * 100 TB must stay a projection, never an explode/rebuild. The
    * result flattens the rewritten struct so the oracle can check the
    * semantics from the flat table.
    */
  def projectStructRewrite(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey", struct(
        $"o_orderpriority".as("priority"),
        (money($"o_totalprice") * 100).cast(LongType).as("cents"),
        $"o_orderstatus".as("status")).as("info"))
      .withColumn("info", $"info"
        .withField("cents_x2", $"info.cents" * 2)
        .withField("urgent", $"info.priority" === "1-URGENT")
        .dropFields("status"))
      .groupBy($"info.priority".as("priority"))
      .agg(count(lit(1)).as("n"),
        sum($"info.cents_x2").as("sum_cents_x2"),
        sum(when($"info.urgent", 1L).otherwise(0L)).as("n_urgent"))
      .orderBy($"priority")
  }

  /** OR-predicate pushdown: a disjunction of a range and an equality
    * must reach the parquet scan as one pushed Or filter (row-group
    * pruning works on disjunctions too) — Round13Spec11 pins
    * `PushedFilters: [... Or(...)]` on the scan node. The aggregate
    * on top keeps the oracle trivial.
    */
  def filterPushdownOr(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .filter($"o_totalprice" > 400000.0 || $"o_orderpriority" === "1-URGENT")
      .agg(count(lit(1)).as("n"),
        sum((money($"o_totalprice") * 100).cast(LongType)).as("sum_cents"))
  }
}
