package graft

import graft.ops.Round11Ops29
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 29: forward frames, acceleration, fan-out
  * audit, ECE, semi-join reduction, log histogram. */
class Round11Spec26 extends AnyFunSuite with SparkFixture {

  test("forward frame: next7 sums the following week exactly") {
    import spark.implicits._
    val rows = Round11Ops29.winForwardFrame(spark, sf)
      .as[(String, Date, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_._1)
    byType.foreach { case (_, g) =>
      val m = g.map(r => r._2.toLocalDate -> r._3).toMap
      g.foreach { case (_, d, _, n7) =>
        val expect = (1 to 7).flatMap(k => m.get(d.toLocalDate.plusDays(k))).sum
        // only check when all 7 following days are in the emitted set
        if ((1 to 7).forall(k => m.contains(d.toLocalDate.plusDays(k))))
          assert(n7 === expect)
      }
    }
  }

  test("acceleration: inflections bounded by scored days") {
    import spark.implicits._
    val rows = Round11Ops29.tsAcceleration(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, mv, ma, ni) =>
      assert(n > 0 && mv >= 0 && ma >= 0)
      assert(ni <= n)
    }
  }

  test("fan-out audit: keys reconcile to the customer count") {
    import spark.implicits._
    val rows = Round11Ops29.joinFanoutAudit(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.customer(spark, sf).count())
    assert(rows.map(_._3).sum === Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey", "left_semi").count())
  }

  test("ECE: single global value, equals the weighted gap mean") {
    import spark.implicits._
    val rows = Round11Ops29.mlEceScore(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val ece = rows.head._4
    assert(rows.forall(_._4 === ece))
    val recomputed = rows.map(_._3).sum / rows.map(_._2).sum
    assert(math.abs(ece - recomputed) < 1e-4)
    assert(ece >= 0 && ece <= 1)
  }

  test("semi-join reduction: equals the direct filtered join") {
    import spark.implicits._
    val rows = Round11Ops29.scaleSemijoinReduction(spark, sf)
      .as[(String, Int, Long, Double)].collect().toSeq.sortBy(_._2)
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf)
        .filter($"o_orderpriority" === "1-URGENT" &&
          year($"o_orderdate") === 1997),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority", month($"o_orderdate").as("mon"))
      .agg(count(lit(1)).as("n"),
        sum(Tables.money($"l_extendedprice")).cast("double").as("r"))
      .as[(String, Int, Long, Double)].collect().toSeq.sortBy(_._2)
    assert(rows === direct)
  }

  test("log histogram: buckets cover powers of two, totals reconcile") {
    import spark.implicits._
    val rows = Round11Ops29.aggLogHistogram(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (b, n, lo, hi, _) =>
      assert(n > 0)
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b bounds [$lo,$hi]")
    }
    assert(rows.map(_._2).sum === Tables.orders(spark, sf).count())
  }
}
