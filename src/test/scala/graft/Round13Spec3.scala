package graft

import graft.ops.Round13Ops3
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 3: label propagation invariants and the defining
  * Hilbert-curve properties (bijectivity + unit-step adjacency) that
  * the row-wise oracle can't see across rows.
  */
class Round13Spec3 extends AnyFunSuite with SparkFixture {

  test("label propagation: covers every node, labels are node ids, deterministic") {
    import spark.implicits._
    val a = Round13Ops3.graphLabelPropagation(spark, sf)
      .as[(Long, Long)].collect()
    val nodes = a.map(_._1).toSet
    val parts = Tables.lineitem(spark, sf)
      .select($"l_partkey").distinct().count()
    val supps = Tables.lineitem(spark, sf)
      .select($"l_suppkey").distinct().count()
    assert(a.length.toLong === parts + supps, "one label per graph node")
    a.foreach { case (_, lbl) => assert(nodes.contains(lbl),
      s"community label $lbl must itself be a node id") }
    val b = Round13Ops3.graphLabelPropagation(spark, sf)
      .as[(Long, Long)].collect()
    assert(a.toSeq === b.toSeq, "fixed-round LPA must be deterministic")
  }

  test("hilbert index: bijective on the full 16x16 grid, consecutive cells Manhattan-adjacent") {
    import spark.implicits._
    val grid = spark.range(256).toDF("i")
      .select(($"i" % 16).cast("int").as("x"), ($"i" / 16).cast("int").as("y"))
      .withColumn("d", Round13Ops3.hilbertIndex(4, $"x", $"y"))
      .as[(Int, Int, Long)].collect()
    assert(grid.map(_._3).distinct.length === 256, "xy->d must be a bijection")
    assert(grid.map(_._3).min === 0L && grid.map(_._3).max === 255L)
    // the defining Hilbert property: walking the curve in d order
    // moves exactly one step in exactly one coordinate every time
    grid.sortBy(_._3).sliding(2).foreach { case Array(a, b) =>
      val manhattan = math.abs(a._1 - b._1) + math.abs(a._2 - b._2)
      assert(manhattan === 1,
        s"d=${a._3}->${b._3} jumps (${a._1},${a._2})->(${b._1},${b._2})")
    }
  }

  test("hilbert cluster: hval in range and bijective with (xb, yb) on the data") {
    import spark.implicits._
    val rows = Round13Ops3.scaleHilbertCluster(spark, sf)
      .as[(Long, Int, Int, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, xb, yb, h) =>
      assert(xb >= 0 && xb < 256 && yb >= 0 && yb < 256)
      assert(h >= 0 && h < 65536)
    }
    val cells = rows.map(r => (r._2, r._3)).distinct.length
    val hvals = rows.map(_._4).distinct.length
    assert(cells === hvals, "distinct cells and distinct hvals must agree")
  }
}
