package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 23: ABC/XYZ inventory matrix, run
  * checksums, hybrid skew join, role-playing dimensions, DISTINCT
  * aggregates, harmonic centrality.
  */
object Round11Ops23 {

  /** ABC×XYZ inventory classification — value class (revenue vs
    * global mean, exact DECIMAL cross-multiplication: rev·n ≥ k·total
    * needs no division) crossed with demand-variability class (weekly
    * quantity CV over integer sums: cv² ≤ t is the integer predicate
    * n·ssq − s² ≤ t²·s², division-free). Two corpus aggregations, a
    * 1-row broadcast of the global totals, and a 9-cell output — the
    * classic planning matrix, exact at any parallelism.
    */
  def analyticAbcXyzMatrix(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, sfDir)
      .select($"l_partkey", $"l_quantity".cast(LongType).as("qty"),
        (money($"l_extendedprice") * (lit(1).cast(DecimalType(4, 2)) -
          rate($"l_discount"))).as("net"),
        (year($"l_shipdate") * 100 + weekofyear($"l_shipdate")).as("wk"))
    val weekly = li.groupBy($"l_partkey", $"wk").agg(sum($"qty").as("wq"))
    val varcls = weekly.groupBy($"l_partkey")
      .agg(count(lit(1)).as("nw"), sum($"wq").as("s"),
        sum($"wq" * $"wq").as("ssq"))
      .select($"l_partkey",
        when(($"nw" * $"ssq" - $"s" * $"s") * 4 <= $"s" * $"s", "X")
          .when($"nw" * $"ssq" <= $"s" * $"s" * 2, "Y")
          .otherwise("Z").as("xyz_class"))
    val rev = li.groupBy($"l_partkey").agg(sum($"net").as("rev"))
    val tot = rev.agg(sum($"rev").as("trev"), count(lit(1)).as("np"))
    val abccls = rev.crossJoin(broadcast(tot))
      .select($"l_partkey", $"rev",
        when($"rev" * $"np" >= $"trev" * 2, "A")
          .when($"rev" * $"np" * 2 >= $"trev", "B")
          .otherwise("C").as("abc_class"))
    abccls.join(varcls, "l_partkey")
      .groupBy($"abc_class", $"xyz_class")
      .agg(count(lit(1)).as("n_parts"),
        sum($"rev").cast(DoubleType).as("revenue"))
      .orderBy($"abc_class", $"xyz_class")
  }

  /** Order-independent run checksum — the dataset fingerprint a
    * pipeline stamps into its run manifest: each row's canonical
    * string hashes to a 60-bit integer and the group checksum is
    * their XOR, which commutes, so any partitioning and any merge
    * order yields the same value. ROLLUP adds the whole-run row.
    * Re-running after any row-level corruption flips the checksum;
    * comparing two runs is O(groups), not O(rows).
    */
  def pipelineRunChecksum(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select($"event_type",
        expr("CAST(conv(substring(md5(concat(CAST(event_id AS STRING), ':', " +
          "CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS STRING))), " +
          "1, 15), 16, 10) AS BIGINT)").as("k"))
      .rollup($"event_type")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(k)").as("checksum"))
      .select(coalesce($"event_type", lit("ALL")).as("scope"),
        $"n_rows", $"checksum")
      .orderBy($"scope")
  }

  /** Hybrid skew join — the manual hot/cold split that beats blanket
    * salting when skew is concentrated: the TOP-16 hottest supplier
    * keys (k-bounded by construction) take the broadcast path with
    * their dimension slice; everything else takes the ordinary
    * shuffle hash join. The union re-aggregates, and the result is
    * byte-identical to a plain join — only the physical routing
    * differs. At 100 TB this caps the hot keys' partition size
    * without inflating the cold path b-fold the way salting does.
    */
  def skewHybridJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val li = lineitem(spark, sfDir)
      .select($"l_suppkey", money($"l_extendedprice").as("m"))
    val hot = li.groupBy($"l_suppkey").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"l_suppkey").limit(16)
      .select($"l_suppkey".as("hk"))
    val dim = supplier(spark, sfDir).select($"s_suppkey", $"s_nationkey")
    val hotRows = li.join(broadcast(hot), $"l_suppkey" === $"hk")
      .join(broadcast(dim.join(broadcast(hot), $"s_suppkey" === $"hk")
        .select($"s_suppkey", $"s_nationkey")), $"l_suppkey" === $"s_suppkey")
    val coldRows = li.join(broadcast(hot), $"l_suppkey" === $"hk", "left_anti")
      .hint("shuffle_hash")
      .join(dim.hint("shuffle_hash"), $"l_suppkey" === $"s_suppkey")
    hotRows.select($"s_nationkey", $"m")
      .unionAll(coldRows.select($"s_nationkey", $"m"))
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum($"m").cast(DoubleType).as("revenue"))
      .orderBy($"s_nationkey")
  }

  /** Role-playing dimension join (the TPC-H Q7 shape): nation joins
    * the SAME query twice under different roles — once as the
    * customer's nation, once as the supplier's — producing
    * cross-border trade volume per (supplier nation, customer nation,
    * year). Both roles broadcast (fixed-cardinality dim); the fact
    * chain is ordinary key shuffles. Exact DECIMAL revenue, cast
    * once.
    */
  def joinRolePlayingDims(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val n1 = nation(spark, sfDir).select($"n_nationkey".as("sk"),
      $"n_name".as("supp_nation"))
    val n2 = nation(spark, sfDir).select($"n_nationkey".as("ck"),
      $"n_name".as("cust_nation"))
    lineitem(spark, sfDir)
      .join(orders(spark, sfDir), $"l_orderkey" === $"o_orderkey")
      .join(customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(supplier(spark, sfDir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(n1), $"s_nationkey" === $"sk")
      .join(broadcast(n2), $"c_nationkey" === $"ck")
      .filter($"supp_nation" =!= $"cust_nation")
      .groupBy($"supp_nation", $"cust_nation", year($"o_orderdate").as("yr"))
      .agg(sum(money($"l_extendedprice") * (lit(1).cast(DecimalType(4, 2)) -
        rate($"l_discount"))).as("vol"))
      .select($"supp_nation", $"cust_nation", $"yr",
        $"vol".cast(DoubleType).as("volume"))
      .orderBy($"supp_nation", $"cust_nation", $"yr")
  }

  /** DISTINCT-qualified aggregates — sum/avg over the distinct VALUE
    * set, not the row set (the dedup-then-aggregate SQL shortcut).
    * Catalyst plans one Expand + two-phase aggregate; the average is
    * the exact distinct-sum over the exact distinct-count, divided
    * once.
    */
  def aggSumAvgDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .select($"l_returnflag", $"l_quantity".cast(LongType).as("q"))
      .groupBy($"l_returnflag")
      .agg(countDistinct($"q").as("n_distinct"),
        sum_distinct($"q").as("sum_distinct"))
      .select($"l_returnflag", $"n_distinct", $"sum_distinct",
        round($"sum_distinct".cast(DoubleType) /
          $"n_distinct".cast(DoubleType), 6).as("avg_distinct"))
      .orderBy($"l_returnflag")
  }

  /** Harmonic centrality (4-hop bound) on the thinned co-supply
    * graph: Σ 1/d over nodes within distance 4, computed EXACTLY as
    * scaled integers (weights 12/6/4/3 = 12/d, one double division
    * at the end). Multi-source BFS as four rounds of
    * frontier⋈adjacency with an anti-join against the reached set —
    * every round's state is (source, node) pairs, bounded by n·d⁴
    * with the degree cap, never all-pairs.
    */
  def graphHarmonicCentrality(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val und = Round10Ops4.thinnedGraph(spark, sfDir)
    val adj = und.select($"u".as("a"), $"v".as("b"))
      .unionAll(und.select($"v".as("a"), $"u".as("b")))
      .localCheckpoint()
    var reached = adj.select($"a".as("s"), $"a".as("node")).distinct()
      .withColumn("d", lit(0))
    var frontier = reached
    for (d <- 1 to 4) {
      val next = frontier.join(adj, $"node" === $"a")
        .select($"s", $"b".as("node")).distinct()
        .join(reached.select($"s".as("s2"), $"node".as("n2")),
          $"s" === $"s2" && $"node" === $"n2", "left_anti")
        .withColumn("d", lit(d))
        .localCheckpoint()
      reached = reached.unionAll(next).localCheckpoint()
      frontier = next
    }
    reached.filter($"d" > 0)
      .withColumn("w", expr("CAST(12 DIV d AS BIGINT)"))
      .groupBy($"s".as("node"))
      .agg(sum($"w").as("harmonic_scaled"))
      .select($"node", $"harmonic_scaled",
        round($"harmonic_scaled".cast(DoubleType) / 12.0, 6).as("harmonic"))
      .orderBy($"node")
  }
}
