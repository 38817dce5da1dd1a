package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 18: fulfillment-lag profile, regional
  * market share, mutual information, low-frequency DFT power, dedup
  * threshold sweep, batched kNN.
  */
object Round11Ops18 {

  private def one = lit(1).cast(D4_2)

  /** Order-to-ship lag profile per order month: exact integer day
    * lags from the lineitem⋈orders equi-join (one orderkey shuffle —
    * both sides corpus-sized, no broadcast), aggregated to per-month
    * min/max plus two single-division doubles (avg lag, ≤30-day
    * share). Day arithmetic stays integer until the final casts, so
    * the output is parallelism-independent.
    */
  def analyticShipLag(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .join(lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .select(date_format($"o_orderdate", "yyyy-MM").as("om"),
        datediff($"l_shipdate".cast(DateType), $"o_orderdate".cast(DateType))
          .cast(LongType).as("lag"))
      .groupBy($"om")
      .agg(count(lit(1)).as("n_items"),
        min($"lag").as("min_lag"), max($"lag").as("max_lag"),
        sum($"lag").as("sl"),
        count(when($"lag" <= 30, 1)).as("fast"))
      .select($"om", $"n_items", $"min_lag", $"max_lag",
        round($"sl".cast(DoubleType) / $"n_items".cast(DoubleType), 6)
          .as("avg_lag"),
        round($"fast".cast(DoubleType) / $"n_items".cast(DoubleType), 6)
          .as("fast_share"))
      .orderBy($"om")
  }

  /** TPC-H Q8-shaped market share: each customer nation's slice of
    * its region's yearly net revenue. Fact-side joins
    * (lineitem⋈orders⋈customer) are key shuffles that AQE may
    * broadcast at small SF but stay shuffle-safe unbounded; nation
    * and region are genuinely fixed-cardinality dims and broadcast
    * explicitly. Revenue accumulates in exact DECIMAL; the share is
    * ONE double division of two exact sums, so the result is
    * identical at any partitioning.
    */
  def analyticMarketShare(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nat = lineitem(spark, sfDir)
      .join(orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(spark, sfDir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(region(spark, sfDir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", year($"o_orderdate").as("yr"), $"n_name")
      .agg(sum(money($"l_extendedprice") * (one - rate($"l_discount"))).as("nat_rev"))
    val tot = nat.groupBy($"r_name".as("r2"), $"yr".as("y2"))
      .agg(sum($"nat_rev").as("reg_rev"))
    nat.join(tot, $"r_name" === $"r2" && $"yr" === $"y2")
      .select($"r_name", $"yr", $"n_name",
        $"nat_rev".cast(DoubleType).as("revenue"),
        round($"nat_rev".cast(DoubleType) / $"reg_rev".cast(DoubleType), 6)
          .as("share"))
      .orderBy($"r_name", $"yr", $"n_name")
  }

  /** Mutual information between order priority and status: the full
    * PMI cell table from exact integer counts (cells, margins, grand
    * total all integer aggregates — margins rejoin on the cell table
    * rather than re-scanning orders; the 1-row total broadcasts).
    * Each cell does ONE log on a ratio of exact counts and one
    * weighted product, both written in the same operation order as
    * the oracle, then rounds — the collocation-PMI determinism
    * protocol applied to column dependence auditing (feature
    * selection / leakage checks).
    */
  def mlMutualInfo(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = orders(spark, sfDir)
      .groupBy($"o_orderpriority".as("x"), $"o_orderstatus".as("y"))
      .agg(count(lit(1)).as("n_xy"))
    val mx = cells.groupBy($"x".as("x1")).agg(sum($"n_xy").as("n_x"))
    val my = cells.groupBy($"y".as("y1")).agg(sum($"n_xy").as("n_y"))
    val tot = cells.agg(sum($"n_xy").as("n"))
    cells
      .join(mx, $"x" === $"x1").join(my, $"y" === $"y1")
      .crossJoin(broadcast(tot))
      .select($"x", $"y", $"n_xy", $"n_x", $"n_y",
        expr("ROUND(LN(CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE) / " +
          "(CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 6)").as("pmi"),
        expr("ROUND(LN(CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE) / " +
          "(CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))) * " +
          "CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE), 6)").as("mi_term"))
      .orderBy($"x", $"y")
  }

  /** Low-frequency spectral energy of the daily event series: DFT
    * real/imaginary parts at k = 1..3 cycles over each event type's
    * day span. Determinism protocol: the trig factor is rounded to
    * 6 dp and FROZEN as DECIMAL before the count-weighted
    * multiplication, so the per-day terms are exact and their sum is
    * order-independent — the one double hazard (libm cos/sin) is
    * confined to a single rounded scalar per (day, k). The day index
    * comes from a groupBy-derived min-date rejoin, not a global
    * window.
    */
  def tsDftPower(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val span = daily.groupBy($"event_type".as("et"))
      .agg(min($"d").as("d0"), count(lit(1)).as("n_days"))
    daily.join(span, $"event_type" === $"et")
      .withColumn("i", datediff($"d", $"d0").cast(LongType))
      .withColumn("k", explode(array(lit(1), lit(2), lit(3))))
      .withColumn("ang",
        lit(2.0 * math.Pi) * $"k" * $"i" / $"n_days".cast(DoubleType))
      .withColumn("cosq", round(cos($"ang"), 6).cast(DecimalType(12, 6)))
      .withColumn("sinq", round(sin($"ang"), 6).cast(DecimalType(12, 6)))
      .groupBy($"event_type", $"k")
      .agg(max($"n_days").as("n_days"),
        sum($"cosq" * $"c").as("req"), sum($"sinq" * $"c").as("imq"))
      .select($"event_type", $"k", $"n_days",
        $"req".cast(DoubleType).as("re"), $"imq".cast(DoubleType).as("im"),
        round($"req".cast(DoubleType) * $"req".cast(DoubleType) +
          $"imq".cast(DoubleType) * $"imq".cast(DoubleType), 4).as("power"))
      .orderBy($"event_type", $"k")
  }

  /** Near-dup pair census across five Jaccard thresholds in one
    * pass: the same-language fragment-replicate pair join (the
    * dedup_near_jaccard shuffle shape — nothing corpus-sized
    * broadcasts) evaluates the compiled intersect kernel ONCE per
    * surviving pair, then five integer-math predicates
    * ((p+q)·i ≥ p·(szA+szB) ⟺ jac ≥ p/q) bucket the pair into each
    * threshold's count. The join-level prune uses the LOOSEST
    * threshold (0.5 ⟹ 2·min ≥ max), so tighter counts are exact
    * subsets. This is the knob-tuning query run before committing a
    * corpus-wide dedup threshold.
    */
  def dedupThresholdSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nBuckets = 32
    val t = LlmOps.tokenHashes(spark, sfDir)
    val b = t.select($"doc_id".as("id_b"), $"lang".as("lang_b"),
      $"th".as("th_b"), $"sz".as("sz_b"),
      pmod($"doc_id", lit(nBuckets)).as("bkt_b"))
    val a = t.withColumn("bkt", explode(array((0 until nBuckets).map(lit): _*)))
      .select($"doc_id".as("id_a"), $"lang", $"th".as("th_a"),
        $"sz".as("sz_a"), $"bkt")
    val thresholds = Seq((1, 2, 50), (3, 5, 60), (7, 10, 70), (4, 5, 80), (9, 10, 90))
    val pairs = a.join(b,
        $"lang" === $"lang_b" && $"bkt" === $"bkt_b" && $"id_a" < $"id_b" &&
        $"sz_a" * 2 >= $"sz_b" && $"sz_b" * 2 >= $"sz_a" &&
        LlmOps.isect($"th_a", $"th_b") * 3 >= ($"sz_a" + $"sz_b"))
      .select(LlmOps.isect($"th_a", $"th_b").as("i"), ($"sz_a" + $"sz_b").as("s"))
    val cs = thresholds.map { case (p, q, pct) =>
      count(when($"i" * (p + q) >= $"s" * p, 1)).as(s"t$pct")
    }
    val counted = pairs.agg(cs.head, cs.tail: _*)
    counted.select(
      explode(array(thresholds.map { case (_, _, pct) =>
        struct(lit(pct).as("threshold_pct"), col(s"t$pct").as("n_pairs"))
      }: _*)).as("r"))
      .select($"r.threshold_pct", $"r.n_pairs")
      .orderBy($"threshold_pct")
  }

  /** Batched kNN: top-10 cosine neighbors for EACH of a fixed 8-probe
    * set in one pass. The probe side is k-bounded BY CONSTRUCTION
    * (vec_id < 8), so broadcasting it is scale-safe — the corpus side
    * streams through once and never shuffles its vectors; the
    * per-probe top-10 is a probe-partitioned rank that Catalyst
    * rewrites to WindowGroupLimit (running top-k map-side, asserted
    * in PlanSpec), so only probes×10 rows survive per partition.
    * Multi-query retrieval without per-query scans.
    */
  def simKnnBatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val e = embeddings(spark, sfDir)
    val probes = e.filter($"vec_id" < 8)
      .select($"vec_id".as("probe_id"), $"embedding".as("pe"))
    val cand = e.select($"vec_id", $"embedding")
    val scored = cand.join(broadcast(probes), $"vec_id" =!= $"probe_id")
      .select($"probe_id", $"vec_id",
        (call_function("graft_dot", $"pe", $"embedding") /
          (sqrt(call_function("graft_dot", $"pe", $"pe")) *
           sqrt(call_function("graft_dot", $"embedding", $"embedding"))))
          .as("cos"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"probe_id").orderBy($"cos".desc, $"vec_id")))
      .filter($"rank" <= 10)
      .select($"probe_id", $"rank", $"vec_id", round($"cos", 6).as("cosine"))
      .orderBy($"probe_id", $"rank")
  }
}
