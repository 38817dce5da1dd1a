package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window functions, sorts, limits, and set operations (SURVEY §2e–§2f).
  *
  * Window orderings always carry a unique tiebreak key so ranking and
  * frame contents are deterministic across engines. Running sums use
  * exact DECIMAL prefix accumulation.
  */
object Analytic {

  // ---- §2e windows ----

  def winRanking(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wFull = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
    val wVal = Window.partitionBy($"o_custkey").orderBy($"o_totalprice".desc)
    orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice",
        row_number().over(wFull).as("rn"),
        rank().over(wVal).as("rnk"),
        dense_rank().over(wVal).as("drnk"))
      .orderBy($"o_custkey", $"rn")
  }

  /** Classic top-k per group: rank inside the partition, filter k —
    * one shuffle on the partition key, no global sort.
    */
  def winTopkPerGroup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
    orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 3)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rn")
      .orderBy($"o_custkey", $"rn")
  }

  /** Running (prefix) aggregation with ROWS frame + a RANGE-frame
    * count over a numeric key neighborhood.
    */
  def winRunningFrame(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wRows = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRange = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      .rangeBetween(-1000L, 0L)
    orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        sum(money($"o_totalprice")).over(wRows).cast(DoubleType).as("running_total"),
        count(lit(1)).over(wRange).as("n_near"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  def winLeadLag(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        lag($"o_orderdate", 1).over(w).as("prev_date"),
        lead($"o_orderdate", 1).over(w).as("next_date"),
        datediff($"o_orderdate", lag($"o_orderdate", 1).over(w))
          .cast(LongType).as("gap_days"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  def winNtileDist(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_orderstatus").orderBy($"o_totalprice", $"o_orderkey")
    orders(spark, sfDir)
      .select($"o_orderstatus", $"o_orderkey", $"o_totalprice",
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy($"o_orderstatus", $"o_totalprice", $"o_orderkey")
  }

  /** first_value / last_value / nth_value over an explicit
    * full-partition frame (the default running frame would make
    * last_value trivially equal the current row).
    */
  def winFirstLast(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wFull = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    orders(spark, sfDir)
      .select($"o_custkey", $"o_orderkey",
        first($"o_orderkey").over(wFull).as("first_order"),
        last($"o_orderkey").over(wFull).as("last_order"),
        nth_value($"o_orderkey", 2).over(wFull).as("second_order"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  /** Per-doc-frequency table with inverse document frequency — the
    * TF-IDF weighting backbone; the corpus size joins in lazily (no
    * driver-side count).
    */
  def textTfidf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val docs = documents(spark, sfDir)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docs.select(explode(array_distinct(split($"text", " "))).as("term"))
      .groupBy($"term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(n))
      .select($"term", $"df", round(log($"n_docs" / $"df"), 6).as("idf"))
      .orderBy($"term")
  }

  /** Histogram binning via floor-division buckets (portable across
    * engines, unlike width_bucket which DuckDB lacks).
    */
  def aggHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .groupBy(floor($"o_totalprice" / 25000).cast(LongType).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(money($"o_totalprice")).as("_s"))
      .select($"bucket", $"n", $"_s".cast(DoubleType).as("sum_price"))
      .orderBy($"bucket")
  }

  def fnBitwise(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey",
        ($"o_orderkey".bitwiseAND(255)).as("band"),
        ($"o_orderkey".bitwiseOR(16)).as("bor"),
        ($"o_orderkey".bitwiseXOR(85)).as("bxor"),
        expr("shiftleft(o_orderkey, 2)").as("shl"),
        expr("shiftright(o_orderkey, 3)").as("shr"),
        bit_count($"o_orderkey").cast(LongType).as("bcnt"))
      .orderBy($"o_orderkey")
  }

  // ---- §2f sorts / limits / set ops ----

  def sortMultiKey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey", nullif($"o_orderstatus", lit("P")).as("st"),
        $"o_orderpriority")
      .orderBy($"st".desc_nulls_last, $"o_orderpriority".asc, $"o_orderkey".desc)
  }

  /** Global top-k: TakeOrderedAndProject (per-partition heap + merge),
    * never a full global sort.
    */
  def limitTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_linenumber",
        (money($"l_extendedprice") * (lit(1).cast(D4_2) - rate($"l_discount")))
          .cast(DoubleType).as("net_price"))
      .orderBy($"net_price".desc, $"l_orderkey", $"l_linenumber")
      .limit(20)
  }

  private def sliceA(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir).filter($"o_totalprice" > 300000)
      .select($"o_orderkey", $"o_totalprice")
  }
  private def sliceB(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir).filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_totalprice")
  }

  def setUnionAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sliceA(spark, sfDir).unionAll(sliceB(spark, sfDir))
      .orderBy($"o_orderkey", $"o_totalprice")
  }

  def setUnionDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    sliceA(spark, sfDir).union(sliceB(spark, sfDir)).distinct()
      .orderBy($"o_orderkey")
  }

  private def multisetA(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir).filter($"l_returnflag" === "A").select($"l_orderkey")
  }
  private def multisetB(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir).filter($"l_linestatus" === "F").select($"l_orderkey")
  }

  /** Multiset semantics: min multiplicities survive. */
  def setIntersectAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    multisetA(spark, sfDir).intersectAll(multisetB(spark, sfDir))
      .orderBy($"l_orderkey")
  }

  /** Multiset difference: multiplicities subtract. */
  def setExceptAll(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    multisetA(spark, sfDir).exceptAll(multisetB(spark, sfDir))
      .orderBy($"l_orderkey")
  }

  def setIntersect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = customer(spark, sfDir).filter($"c_acctbal" > 0).select($"c_custkey")
    val y = orders(spark, sfDir).filter($"o_orderpriority" === "1-URGENT")
      .select($"o_custkey".as("c_custkey"))
    x.intersect(y).orderBy($"c_custkey")
  }

  def setExcept(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val x = customer(spark, sfDir).select($"c_custkey")
    val y = orders(spark, sfDir)
      .filter($"o_orderdate" >= ntz("1995-01-01 00:00:00") &&
        $"o_orderdate" < ntz("1996-01-01 00:00:00"))
      .select($"o_custkey".as("c_custkey"))
    x.except(y).orderBy($"c_custkey")
  }
}
