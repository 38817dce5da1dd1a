package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 8: SQL physical-layout clauses
  * (DISTRIBUTE/SORT BY), the late-arriving-dimension warehouse
  * pattern, and exact integer rounding-mode semantics.
  */
object Round13Ops8 {

  /** DISTRIBUTE BY + SORT BY — the SQL-surface knobs for explicit
    * shuffle placement (the writer-side clustering a 100 TB pipeline
    * uses to co-locate and pre-sort data before a partitioned write).
    * The inner subquery shuffles on the priority key; the outer
    * aggregate reuses that exchange. Round13Spec8 pins BOTH optimizer
    * facts: the explicit REPARTITION_BY_COL hash exchange survives
    * (DISTRIBUTE BY is honored, no second exchange for the agg), and
    * the partition-local SORT BY is ELIDED (EliminateSorts: a sort
    * feeding an aggregate is redundant — the clause costs nothing
    * here, exactly what you want from a declarative layout hint).
    * Results are layout-invariant, so the oracle is the plain
    * aggregate.
    */
  def sqlDistributeClusterBy(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g13_orders_dcb")
    spark.sql("""
      SELECT o_orderpriority, count(*) AS n,
        CAST(sum(cents) AS BIGINT) AS total_cents
      FROM (
        SELECT o_orderpriority,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM g13_orders_dcb
        DISTRIBUTE BY o_orderpriority SORT BY o_orderpriority, cents
      )
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  }

  /** Late-arriving dimension audit: a tenth of the customer dimension
    * (c_custkey ≡ 0 mod 10) has not landed when the fact stream is
    * joined, so those orders resolve to the UNKNOWN member (-1). The
    * reconciliation view joins the facts against the FULL dimension to
    * report, per true nation, how many orders were served by the
    * unknown member — the backfill debt a warehouse tracks per load.
    * One broadcast of the dim both times; the fact table is scanned
    * once per view, never collected.
    */
  def pipelineLateArrivingDim(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dimFull = customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey".cast(IntegerType).as("nation"),
        (pmod($"c_custkey", lit(10)) === 0).as("late"))
    orders(spark, sfDir)
      .select($"o_custkey", (money($"o_totalprice") * 100)
        .cast(LongType).as("cents"))
      .join(broadcast(dimFull), $"o_custkey" === $"c_custkey")
      .groupBy($"nation")
      .agg(count(lit(1)).as("n_orders"),
        sum(when($"late", 1L).otherwise(0L)).as("n_late"),
        sum(when($"late", $"cents").otherwise(0L)).as("late_cents"))
      .select($"nation", $"n_orders", $"n_late", $"late_cents",
        round($"n_late".cast(DoubleType) / $"n_orders", 6).as("late_share"))
      .orderBy($"nation")
  }

  /** The four rounding modes over order totals in EXACT integer
    * arithmetic on cents (c ≥ 0): HALF_UP ((c+50) div 100), HALF_EVEN
    * (banker's — ties go to the even dollar, Spark's `bround`
    * semantics), FLOOR, CEIL. One scan, one row out; Round13Spec8
    * cross-checks each integer form against the engine's native
    * round/bround/floor/ceil on the decimal column, so the op doubles
    * as the conformance test for the function family.
    */
  def fnRoundingModes(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val c = (money($"o_totalprice") * 100).cast(LongType)
    orders(spark, sfDir)
      .select(c.as("c"))
      .select($"c", expr("c div 100").as("q"), ($"c" % 100L).as("r"))
      .select($"c", $"q", $"r",
        expr("(c + 50) div 100").as("hu"),
        ($"q" + when($"r" > 50 || ($"r" === 50 && $"q" % 2 === 1), 1L)
          .otherwise(0L)).as("he"),
        $"q".as("fl"),
        expr("(c + 99) div 100").as("ce"))
      .agg(count(lit(1)).as("n"),
        sum($"hu").as("sum_half_up"), sum($"he").as("sum_half_even"),
        sum($"fl").as("sum_floor"), sum($"ce").as("sum_ceil"))
  }
}
