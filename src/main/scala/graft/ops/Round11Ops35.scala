package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 35: filtered distinct aggregates, initcap,
  * global HAVING, character codes.
  */
object Round11Ops35 {

  /** DISTINCT + FILTER composed in one aggregate: the distinct
    * quantity vocabulary of the discounted vs full-price rows,
    * side by side per flag — each a separate Expand branch in one
    * pass, no second scan.
    */
  def aggDistinctFilter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast(LongType).as("q"),
        (rate($"l_discount") > lit(0)).as("disc"))
      .groupBy($"l_returnflag")
      .agg(countDistinct(when($"disc", $"q")).as("n_q_discounted"),
        countDistinct(when(!$"disc", $"q")).as("n_q_fullprice"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** initcap title-casing — the display-normalization scalar; the
    * oracle rebuilds it per token (upper head + lower tail over the
    * split), so Spark's word-boundary semantics are checked against
    * explicit string algebra.
    */
  def fnInitcap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    part(spark, sfDir)
      .select($"p_partkey", $"p_name",
        initcap($"p_name").as("title"),
        initcap(upper($"p_name")).as("title_from_upper"))
      .orderBy($"p_partkey")
  }

  /** Global HAVING without GROUP BY — the implicit single-group
    * aggregate gate (a data-quality assertion written as SQL: emit
    * the summary row only when the batch is big enough). Both
    * engines treat the bare HAVING as one global group.
    */
  def sqlHavingGlobal(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g11_orders_hg")
    spark.sql("""
      SELECT CAST(count(*) AS BIGINT) n,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS BIGINT) sum_cents
      FROM g11_orders_hg
      HAVING count(*) > 100
    """)
  }

  /** Character-code scalars: ascii() of the name's head, chr()
    * roundtrip, and the printable-code census per leading character —
    * the byte-level primitives encoding audits reach for.
    */
  def fnCharCodes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    part(spark, sfDir)
      .select(ascii(substring($"p_name", 1, 1)).as("head_code"),
        expr("chr(ascii(substring(p_name, 1, 1)))").as("head_rt"))
      .groupBy($"head_code", $"head_rt")
      .agg(count(lit(1)).as("n"))
      .orderBy($"head_code")
  }
}
