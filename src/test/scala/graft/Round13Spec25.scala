package graft

import graft.ops.Round13Ops25
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 25: haversine partition/mass checks, trading-day
  * index centering, range-sort plan + partition layout pins.
  */
class Round13Spec25 extends AnyFunSuite with SparkFixture {

  test("haversine: every customer assigned once, distances plausible") {
    import spark.implicits._
    val rows = Round13Ops25.fnHaversineNearestHub(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.map(_._2).sum === Tables.customer(spark, sf).count())
    rows.foreach { case (hub, n, avg, mx) =>
      assert(n > 0)
      assert(avg > 0 && avg <= mx)
      assert(mx <= 20016.0, s"hub $hub: beyond half the circumference")
    }
  }

  test("trading day: index centers near 1, adjusted mass near actual mass") {
    import spark.implicits._
    val rows = Round13Ops25.tsTradingDayAdjust(spark, sf)
      .as[(java.sql.Date, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (m, actual, nd, idx, adj) =>
      assert(nd >= 1 && nd <= 31)
      assert(idx > 0.5 && idx < 1.5, s"$m: index $idx far from 1")
      assert(math.abs(adj * idx - actual) < 1.0, s"$m: adj*idx != actual")
    }
    val meanIdx = rows.map(_._4).sum / rows.length
    assert(math.abs(meanIdx - 1.0) < 0.05)
  }

  test("range sort: range exchange + local sort, partitions ordered and disjoint") {
    import spark.implicits._
    val ds = Round13Ops25.sorted(spark, sf)
    val plan = ds.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(cents"),
      s"expected a range exchange on the sort key:\n$plan")
    assert("Sort \\[cents[^\\]]*\\], false".r.findFirstIn(plan).isDefined,
      s"expected a partition-LOCAL sort:\n$plan")
    // per-partition (min, max, sortedness) — disjoint ordered ranges
    val parts = ds.select($"cents").as[Long].rdd
      .mapPartitionsWithIndex { (i, it) =>
        val v = it.toArray
        if (v.isEmpty) Iterator.empty
        else Iterator((i, v.head, v.last, v.sliding(2)
          .forall(p => p.length < 2 || p(0) <= p(1))))
      }.collect().sortBy(_._1)
    assert(parts.forall(_._4), "each partition must be internally sorted")
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2,
        s"partitions ${a._1}/${b._1} overlap: ${a._3} > ${b._2}")
      case _ =>
    }
    assert(Round13Ops25.scaleRangePartitionSort(spark, sf).count() === 1)
  }
}
