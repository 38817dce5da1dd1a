package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 13: latest-row-per-key dedup, symmetric
  * set difference, VWAP, skip-gram pair mining, information gain,
  * day-of-week × hour activity profile.
  */
object Round11Ops13 {

  /** Latest-row-per-key survivorship: each customer's most recent
    * order (orderdate desc, orderkey desc as the total tie-break) —
    * the recency-dedup every CDC ingest needs. The row_number
    * filter compiles to a WindowGroupLimit running top-1 per key
    * (no full sort of each partition's history), and the window is
    * customer-partitioned — parallel across the corpus.
    */
  def dedupLatestByKey(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".desc, $"o_orderkey".desc)
    orders(spark, sfDir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey",
        $"o_orderdate".cast(DateType).as("last_order_date"),
        (money($"o_totalprice") * 100).cast(LongType).as("last_cents"))
      .orderBy($"o_custkey")
  }

  /** Symmetric difference of two derived key sets: customers who
    * ordered in 1995 but not 1996, and vice versa, each tagged with
    * its side. EXCEPT plans as a distinct-aggregate + null-aware
    * anti join pair — no driver-side set materialization; both
    * branches prune to the order-date year at the scan.
    */
  def setSymmetricDiff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    def inYear(y: Int) = orders(spark, sfDir)
      .filter(year($"o_orderdate") === y)
      .select($"o_custkey").distinct()
    val a = inYear(1995); val b = inYear(1996)
    a.except(b).withColumn("side", lit("1995_only"))
      .unionAll(b.except(a).withColumn("side", lit("1996_only")))
      .orderBy($"o_custkey", $"side")
  }

  /** Volume-weighted average price per ship month and return flag.
    * Both moment sums are exact decimals (price×quantity products at
    * scale (25,4), quantities at (38,2)); the VWAP itself is the one
    * double division, rounded at 6 dp — order-free at any cluster
    * size. The standard financial rollup shape: one corpus hash
    * aggregate, no shuffle beyond it.
    */
  def tsVwap(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .groupBy(date_trunc("month", $"l_shipdate").cast(DateType).as("mstart"),
        $"l_returnflag")
      .agg(sum((money($"l_extendedprice") * money($"l_quantity"))
          .cast(DecimalType(38, 4))).as("pv"),
        sum(money($"l_quantity")).cast(DecimalType(38, 2)).as("v"))
      .select($"mstart", $"l_returnflag",
        ($"v" * 100).cast(LongType).as("qty_cents"),
        round($"pv".cast(DoubleType) / $"v".cast(DoubleType), 6)
          .as("vwap"))
      .orderBy($"mstart", $"l_returnflag")
  }

  /** Skip-gram pair mining (window ≤ 2, unordered, i<j): the
    * co-occurrence pair stream word-embedding training consumes.
    * Each center token pairs with its next ≤2 tokens, generated
    * INLINE from the per-document token array (round 16: this
    * replaces a posexplode + doc_id-keyed self-join that sorted two
    * corpus-sized token streams per run — the pair stream never
    * needs a join, the context window is a slice of the same array;
    * byte-identical output). Map-side pair generation + one
    * vocabulary-keyed aggregate: corpus-linear, never quadratic.
    * Top-30 by (count desc, center, context) is a total order.
    */
  def textSkipgramPairs(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = documents(spark, sfDir)
      .select(split($"text", " ").as("tk"))
      .select(explode(expr(
        "flatten(transform(tk, (x, i) -> " +
          "transform(slice(tk, i + 2, 2), y -> " +
            "struct(x AS center, y AS context))))"
      )).as("p"))
      .select($"p.center".as("center"), $"p.context".as("context"))
    pairs.groupBy($"center", $"context")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"center", $"context")
      .limit(30)
  }

  /** Information gain of the hour-of-day feature for the high-value
    * label — the entropy twin of ml_gini_split. Each of the 24
    * conditional-entropy terms is per-row scalar math over exact
    * counts, rounded into the 9-dp DECIMAL lane before the (bounded,
    * 24-row) sum — no order-dependent float accumulation. ln2 is a
    * shared literal so neither engine's log(2) enters the protocol.
    */
  def mlInfoGain(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ln2 = 0.6931471805599453
    def entropyBits(n: org.apache.spark.sql.Column,
        p: org.apache.spark.sql.Column) = {
      val pp = p.cast(DoubleType) / n.cast(DoubleType)
      val qq = (n - p).cast(DoubleType) / n.cast(DoubleType)
      (when(p === 0 || p === n, lit(0.0))
        .otherwise(-(pp * log(pp) + qq * log(qq)))) / ln2
    }
    val base = events(spark, sfDir)
      .withColumn("h", hour($"ts"))
      .withColumn("y", (money($"value") >= lit(50)).cast(LongType))
    val g = base.agg(count(lit(1)).as("n"), sum($"y").as("pos"))
    val byHour = base.groupBy($"h")
      .agg(count(lit(1)).as("nh"), sum($"y").as("ph"))
    val cond = byHour.join(broadcast(g))
      .select(round(($"nh".cast(DoubleType) / $"n".cast(DoubleType)) *
          entropyBits($"nh", $"ph"), 9).cast(DecimalType(28, 9)).as("t"))
      .agg(sum($"t").as("cond9"))
    g.crossJoin(broadcast(cond))
      .select($"n", $"pos",
        round(entropyBits($"n", $"pos"), 6).as("entropy_bits"),
        round($"cond9".cast(DoubleType), 6).as("cond_entropy_bits"),
        round(round(entropyBits($"n", $"pos"), 9) -
          $"cond9".cast(DoubleType), 6).as("info_gain_bits"))
  }

  /** Day-of-week × hour activity profile: event counts and exact
    * revenue cents on the 7×24 grid — the seasonality fingerprint a
    * scheduler samples against. ISO weekday is derived with the same
    * arithmetic on both engines (Spark's dayofweek is Sunday-based);
    * one corpus hash aggregate onto a bounded grid.
    */
  def analyticDowHourProfile(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .withColumn("isodow",
        expr("CAST((dayofweek(ts) + 5) % 7 + 1 AS INTEGER)"))
      .withColumn("h", hour($"ts"))
      .groupBy($"isodow", $"h")
      .agg(count(lit(1)).as("n"),
        (sum(money($"value")) * 100).cast(LongType).as("rev_cents"))
      .orderBy($"isodow", $"h")
  }
}
