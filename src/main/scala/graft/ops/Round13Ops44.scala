package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 44: double-sweep pseudo-diameter and
  * exact rolling percentile bands.
  */
object Round13Ops44 {

  /** Pseudo-diameter by the classic double BFS sweep: BFS from the
    * minimum node, restart from the farthest node found, report the
    * second sweep's eccentricity — the standard 2-pass lower bound
    * that large-graph systems use instead of all-pairs distances.
    * Both sweeps are 4-round Pregel-as-joins frontiers (state
    * strictly (node, dist), shuffles keyed on node id); all ties
    * break on node id so the restart vertex is deterministic.
    */
  def graphPseudoDiameter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val und = Round10Ops4.thinnedGraph(spark, sfDir)
    val adj = und.select($"u".as("src"), $"v".as("dst"))
      .union(und.select($"v".as("src"), $"u".as("dst")))
    def bfs(seed: DataFrame): DataFrame = {
      var dist = seed
      for (_ <- 1 to 4) {
        val next = dist.join(adj, $"node" === $"src")
          .select($"dst".as("node"), ($"dist" + 1).as("dist"))
        // truncate lineage each round: dist appears twice per round,
        // so the unchecked plan doubles per hop and the SECOND sweep
        // (seeded from the first's result) squares it — 18 s on the
        // bench before this, sub-second after
        dist = dist.union(next)
          .groupBy($"node").agg(min($"dist").as("dist"))
          .localCheckpoint(true)
      }
      dist
    }
    val start = und.select($"u".as("node"))
      .union(und.select($"v".as("node")))
      .agg(min($"node").as("node")).withColumn("dist", lit(0))
    val d1 = bfs(start)
    val far = d1.orderBy($"dist".desc, $"node").limit(1)
      .select($"node", $"dist".as("ecc1"))
    val d2 = bfs(far.select($"node", lit(0).as("dist")))
    val end = d2.orderBy($"dist".desc, $"node").limit(1)
      .select($"node".as("end_node"), $"dist".as("pseudo_diameter"))
    val reach = d2.agg(count(lit(1)).as("n_reached"))
    start.select($"node".as("start_node"))
      .crossJoin(broadcast(far.select($"node".as("far_node"), $"ecc1")))
      .crossJoin(broadcast(end))
      .crossJoin(broadcast(reach))
      .select($"start_node", $"far_node", $"ecc1".cast(LongType).as("sweep1_ecc"),
        $"end_node", $"pseudo_diameter".cast(LongType).as("pseudo_diameter"),
        $"n_reached")
  }

  /** Rolling 7-day P10/P50/P90 bands over daily revenue: the window's
    * values are collected, sorted, and indexed — discrete (type-1)
    * percentiles on exact cent sums, so the bands are integers and
    * engine-exact, unlike interpolating percentile_approx. The
    * anomaly-band primitive for ops dashboards; the window is
    * calendar-bounded so the collected lists stay 7 elements at any
    * corpus size.
    */
  def tsRollingPercentileBands(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // trailing 7-day windows as array slices over the collected
    // calendar series — no unpartitioned rolling Window (plan pin)
    val arr = orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(sum((money($"o_totalprice") * 100).cast(LongType)).as("c"))
      .agg(array_sort(collect_list(struct($"d", $"c"))).as("s"))
      .select($"s", expr("transform(s, x -> x.c)").as("cs"))
    arr.select(posexplode($"s").as(Seq("p", "x")), $"cs")
      .filter($"p" >= 6)
      .select($"x.d".as("d"), $"x.c".as("c"),
        sort_array(expr("slice(cs, p - 5, 7)")).as("win"))
      .select($"d", $"c".as("day_cents"),
        // type-1 discrete percentiles of a 7-element window:
        // ceil(0.1*7)=1st, ceil(0.5*7)=4th, ceil(0.9*7)=7th
        element_at($"win", 1).as("p10_cents"),
        element_at($"win", 4).as("p50_cents"),
        element_at($"win", 7).as("p90_cents"),
        ($"c" === element_at($"win", 7) || $"c" === element_at($"win", 1))
          .cast(LongType).as("at_band_edge"))
      .orderBy($"d")
  }
}
