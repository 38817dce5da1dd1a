package graft

import graft.ops.Round11Ops11
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 11: winsorize, effect size, Luhn,
  * reciprocity, MoM growth, rolling correlation. */
class Round11Spec8 extends AnyFunSuite with SparkFixture {

  test("winsorize: clip counts within tail bounds, sum <= raw sum cap") {
    import spark.implicits._
    val rows = Round11Ops11.tsWinsorize(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, lo, hi, _) =>
      // discrete P5/P95: at most ~5% clipped on each side
      assert(lo <= n / 10 && hi <= n / 10)
    }
    assert(rows.map(_._2).sum === Tables.events(spark, sf).count())
  }

  test("effect size: 10 pairs, hedges shrinks toward zero") {
    import spark.implicits._
    val rows = Round11Ops11.mlEffectSize(spark, sf)
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(rows.length === 10)
    rows.foreach { case (a, b, n1, n2, d, g) =>
      assert(a < b && n1 > 1 && n2 > 1)
      assert(math.abs(g) <= math.abs(d) + 1e-12)
      assert(!d.isNaN && !g.isNaN)
    }
  }

  test("luhn: ~10% of keys validate, counts partition orders") {
    import spark.implicits._
    val rows = Round11Ops11.fnLuhnCheck(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.orders(spark, sf).count())
    val valid = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(valid > 0.02 && valid < 0.3, s"luhn valid share $valid")
  }

  test("reciprocity: single row, ratio in [0,1]") {
    import spark.implicits._
    val rows = Round11Ops11.graphReciprocity(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.length === 1)
    val (e, r, ratio) = rows.head
    assert(e > 0 && r >= 0 && r <= e)
    assert(ratio >= 0.0 && ratio <= 1.0)
  }

  test("mom growth: null only on each nation's first month") {
    val rows = Round11Ops11.analyticMomGrowth(spark, sf).collect()
    val byNation = rows.groupBy(_.getString(0))
    byNation.foreach { case (_, rs) =>
      val sorted = rs.sortBy(r => r.getDate(1).getTime)
      assert(sorted.head.isNullAt(3), "first month has no growth")
      assert(sorted.tail.forall(!_.isNullAt(3)))
    }
  }

  test("rolling corr: values in [-1,1], one row per full frame") {
    import spark.implicits._
    val rows = Round11Ops11.tsRollingCorr(spark, sf)
      .as[(Date, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, c) => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9) }
  }
}
