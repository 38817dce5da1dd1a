package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 3: synchronous label propagation
  * (community detection — the graph-family gap next to pagerank /
  * HITS / k-core), and Hilbert-curve clustering (the
  * better-locality sibling of scale_zorder_cluster).
  */
object Round13Ops3 {

  /** Synchronous label propagation, 3 fixed rounds, over the
    * undirected part–supplier bipartite graph (same derivation as
    * [[Graph.graphPagerank]]). Every node starts labeled with its own
    * id; each round it adopts the most frequent label among its
    * neighbors, ties to the SMALLEST label — integer-exact and
    * deterministic, so the op oracles against 3 unrolled DuckDB
    * rounds. Scale shape per round: one key-partitioned join of the
    * label vector with the edge list, a (node, label) hash count, and
    * a node-partitioned top-1 window; `localCheckpoint` cuts lineage
    * per round (Graph.scala pattern) so plan depth stays flat.
    */
  def graphLabelPropagation(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val pairs = lineitem(spark, sfDir)
      .select($"l_partkey".as("p"), ($"l_suppkey" + 10000000L).as("s"))
      .distinct()
    val edges = pairs.select($"p".as("src"), $"s".as("dst"))
      .unionAll(pairs.select($"s".as("src"), $"p".as("dst")))
      .repartition(col("src"))
      .localCheckpoint(true)
    var labels = edges.select($"src".as("node")).distinct()
      .withColumn("lbl", $"node")
    val sc = spark.sparkContext
    var prevCkpt: Option[Int] = None
    for (_ <- 1 to 3) {
      val next = edges
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy($"src".as("node"), $"lbl")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"node").orderBy($"cnt".desc, $"lbl".asc)))
        .filter($"rn" === 1)
        .select($"node", $"lbl")
        .localCheckpoint(true)
      prevCkpt.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      prevCkpt = ScaleTechniques.checkpointRddId(next)
      labels = next
    }
    labels.select($"node", $"lbl".as("community")).orderBy($"node")
  }

  /** One Hilbert-curve refinement stage: given (x, y, d) at scale s,
    * fold in the (rx, ry) quadrant bits and apply the curve's rotation
    * (flip then swap when ry = 0). Pure integer arithmetic so the
    * oracle mirrors it stage for stage.
    */
  private[graft] def hilbertStage(s: Int)(
      x: Column, y: Column, d: Column): (Column, Column, Column) = {
    val rx = when((x.bitwiseAND(lit(s))) > 0, 1).otherwise(0)
    val ry = when((y.bitwiseAND(lit(s))) > 0, 1).otherwise(0)
    val d2 = d + lit(s.toLong * s) * (lit(3) * rx).bitwiseXOR(ry).cast(LongType)
    val xf = when(rx === 1, lit(s - 1) - x).otherwise(x)
    val yf = when(rx === 1, lit(s - 1) - y).otherwise(y)
    val x2 = when(ry === 0, yf).otherwise(x)
    val y2 = when(ry === 0, xf).otherwise(y)
    (x2, y2, d2)
  }

  /** Full xy→d Hilbert index for a 2^order × 2^order grid: the
    * standard iterative conversion unrolled into `order` expression
    * stages (each stage is a handful of integer ops — all inside
    * whole-stage codegen). */
  private[graft] def hilbertIndex(order: Int, x0: Column, y0: Column): Column = {
    var x = x0; var y = y0; var d: Column = lit(0L)
    var s = 1 << (order - 1)
    while (s > 0) {
      val (x2, y2, d2) = hilbertStage(s)(x, y, d)
      x = x2; y = y2; d = d2
      s >>= 1
    }
    d
  }

  /** Hilbert-curve clustering key over the same (customer bucket,
    * day bucket) plane as [[Round7Ops2.scaleZorderCluster]]: the
    * Hilbert index preserves locality strictly better than Morton
    * order (every consecutive pair of curve positions is Manhattan-
    * adjacent — no Z-shape jumps across the plane), which tightens
    * per-file min/max stats under range partitioning and therefore
    * data skipping on BOTH predicate columns. The 8 unrolled stages
    * are plain integer arithmetic, mirrored stage-for-stage in the
    * oracle; Round13Spec3 asserts the defining adjacency property on
    * a complete grid and bijectivity on the data.
    */
  def scaleHilbertCluster(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .withColumn("xb", pmod($"o_custkey", lit(256)).cast(IntegerType))
      .withColumn("yb",
        pmod(datediff($"o_orderdate".cast(DateType),
          to_date(lit("1995-01-01"))), lit(256)).cast(IntegerType))
      .withColumn("hval", hilbertIndex(8, $"xb", $"yb"))
      .select($"o_orderkey", $"xb", $"yb", $"hval")
      .orderBy($"hval", $"o_orderkey")
  }
}
