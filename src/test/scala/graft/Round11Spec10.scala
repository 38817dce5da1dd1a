package graft

import graft.ops.Round11Ops13
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 13: latest-by-key, symmetric diff, VWAP,
  * skip-grams, info gain, dow×hour profile. */
class Round11Spec10 extends AnyFunSuite with SparkFixture {

  test("latest by key: one row per ordering customer, truly the max") {
    import spark.implicits._
    val rows = Round11Ops13.dedupLatestByKey(spark, sf)
      .as[(Long, Long, Date, Long)].collect()
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(rows.length === nCust)
    assert(rows.map(_._1).distinct.length === rows.length)
    val maxDate = Tables.orders(spark, sf)
      .agg(max(to_date($"o_orderdate"))).as[Date].head()
    assert(rows.map(_._3.getTime).max === maxDate.getTime)
  }

  test("symmetric diff: sides disjoint, excludes both-years customers") {
    import spark.implicits._
    val rows = Round11Ops13.setSymmetricDiff(spark, sf)
      .as[(Long, String)].collect()
    val by = rows.groupBy(_._2).map { case (k, v) => k -> v.map(_._1).toSet }
    val a = by.getOrElse("1995_only", Set.empty)
    val b = by.getOrElse("1996_only", Set.empty)
    assert(a.nonEmpty && b.nonEmpty && (a & b).isEmpty)
  }

  test("vwap: between min and max unit price per group") {
    import spark.implicits._
    val rows = Round11Ops13.tsVwap(spark, sf)
      .as[(Date, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, qc, v) => assert(qc > 0 && v > 0) }
  }

  test("skip-grams: 30 pairs, counts descending, window respected") {
    import spark.implicits._
    val rows = Round11Ops13.textSkipgramPairs(spark, sf)
      .as[(String, String, Long)].collect()
    assert(rows.length === 30)
    assert(rows.map(_._3).sliding(2).forall(w => w(0) >= w(1)))
    rows.foreach { case (c, x, n) => assert(c.nonEmpty && x.nonEmpty && n > 0) }
  }

  test("info gain: 0 <= IG <= H(y) <= 1 bit") {
    import spark.implicits._
    val (n, pos, h, cond, ig) = Round11Ops13.mlInfoGain(spark, sf)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(pos > 0 && pos < n)
    assert(h > 0.0 && h <= 1.0)
    assert(cond >= 0.0 && cond <= h + 1e-6)
    assert(ig >= -1e-6 && ig <= h)
  }

  test("dow-hour profile: grid bounded 7x24, counts partition events") {
    import spark.implicits._
    val rows = Round11Ops13.analyticDowHourProfile(spark, sf)
      .as[(Int, Int, Long, Long)].collect()
    assert(rows.length <= 168)
    rows.foreach { case (d, h, n, _) =>
      assert(d >= 1 && d <= 7 && h >= 0 && h <= 23 && n > 0)
    }
    assert(rows.map(_._3).sum === Tables.events(spark, sf).count())
  }
}
