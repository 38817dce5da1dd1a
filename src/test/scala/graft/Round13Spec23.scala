package graft

import graft.ops.Round13Ops23
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 23: weighted-PageRank mass conservation, generated
  * range determinism, dow-median envelope.
  */
class Round13Spec23 extends AnyFunSuite with SparkFixture {

  test("weighted pagerank: scaled ranks average ~1, all positive") {
    import spark.implicits._
    val rows = Round13Ops23.graphWeightedPagerank(spark, sf)
      .as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (node, r) => assert(r > 0.0, s"node $node rank $r") }
    val meanScaled = rows.map(_._2).sum / rows.length
    assert(math.abs(meanScaled - 1.0) < 0.01,
      s"scaled ranks should average ~1.0, got $meanScaled")
  }

  test("generate range: buckets partition 100k rows, hash values bounded") {
    import spark.implicits._
    val rows = Round13Ops23.sourceGenerateRange(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 7)
    assert(rows.map(_._2).sum === 100000L)
    rows.foreach { case (_, _, _, lo, hi) =>
      assert(lo >= 0 && hi <= 999)
    }
  }

  test("dow medians: within min/max, 7 weekdays per type") {
    import spark.implicits._
    val rows = Round13Ops23.tsDowMedianProfile(spark, sf)
      .as[(String, Int, Long, Double, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach(g =>
      assert(g.map(_._2).toSet.subsetOf((1 to 7).toSet)))
    rows.foreach { case (et, dw, n, med, lo, hi) =>
      assert(n > 0)
      assert(med >= lo && med <= hi, s"$et dow $dw: median outside envelope")
    }
  }
}
