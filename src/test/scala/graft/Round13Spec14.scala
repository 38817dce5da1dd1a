package graft

import graft.ops.Round13Ops14
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 14: piecewise-trend segment partition, IPv4 octet
  * bounds, RLS visibility algebra.
  */
class Round13Spec14 extends AnyFunSuite with SparkFixture {

  test("piecewise trend: three segments, day counts partition the span") {
    import spark.implicits._
    val rows = Round13Ops14.tsPiecewiseTrend(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length === 3)
    val totalDays = Tables.orders(spark, sf)
      .select("o_orderdate").distinct().count()
    assert(rows.map(_._2).sum === totalDays)
    rows.foreach { case (seg, n, slope, icept) =>
      assert(n > 0 && !slope.isNaN && !icept.isNaN, s"segment $seg")
    }
  }

  test("ipv4: octets bounded, sample ip parses back to the subnet") {
    import spark.implicits._
    val rows = Round13Ops14.fnIpv4Octets(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.length === 20)
    rows.foreach { case (o1, o2, n, nips, ip) =>
      assert(o1 >= 0 && o1 <= 255 && o2 >= 0 && o2 <= 255)
      assert(nips <= n)
      val parts = ip.split("\\.").map(_.toLong)
      assert(parts.length === 4 && parts(0) === o1 && parts(1) === o2)
      assert(parts.forall(p => p >= 0 && p <= 255))
    }
  }

  test("rls: admin sees everyone, analysts partition the nations") {
    import spark.implicits._
    val rows = Round13Ops14.pipelineRowLevelSecurity(spark, sf)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet === Set("analyst_emea", "analyst_apac", "admin_global"))
    val total = Tables.customer(spark, sf).count()
    assert(rows("admin_global")._2 === total)
    assert(rows("analyst_emea")._2 + rows("analyst_apac")._2 < total,
      "analyst ranges cover 20 of 25 nations: strictly fewer rows than admin")
    assert(rows("admin_global")._3 === 25)
  }
}
