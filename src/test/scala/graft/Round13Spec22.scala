package graft

import graft.ops.Round13Ops22
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 22: Viterbi optimality vs the one-state baseline and
  * a driver-side DP, fiscal-calendar partition checks.
  */
class Round13Spec22 extends AnyFunSuite with SparkFixture {

  test("viterbi: beats or matches the one-state baseline, matches a driver DP") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Round13Ops22.mlViterbiScore(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, up, vit, base, gain) =>
      assert(up <= n)
      assert(gain >= 0, s"$et: viterbi $vit below its own baseline $base")
      assert(vit === base + gain)
      assert(vit <= 3 * n, s"$et: score above the perfect-path bound")
    }
    // independent DP for one type
    val daily = Tables.events(spark, sf)
      .filter($"event_type" === rows.head._1)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("c"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.getTime)
    val obs = daily.sliding(2).collect {
      case Array((d1, c1), (d2, c2))
        if d2.toLocalDate == d1.toLocalDate.plusDays(1) =>
        if (c2 > c1) 1L else 0L
    }.toArray
    var (s0, s1) = (0L, 0L)
    obs.foreach { o =>
      val n0 = (if (o == 0) 2L else -1L) + math.max(s0 + 1, s1 - 1)
      val n1 = (if (o == 1) 2L else -1L) + math.max(s1 + 1, s0 - 1)
      s0 = n0; s1 = n1
    }
    assert(rows.head._4 === math.max(s0, s1),
      s"${rows.head._1}: fold disagrees with the driver DP")
  }

  test("fiscal 445: quarters 1-4, periods 1-3, mass equals post-anchor orders") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Round13Ops22.fnFiscal445(spark, sf)
      .as[(Long, Long, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (fy, fq, p, n, _) =>
      assert(fq >= 1 && fq <= 4, s"fy$fy q$fq")
      assert(p >= 1 && p <= 3)
      assert(n > 0)
    }
    val expected = Tables.orders(spark, sf)
      .filter($"o_orderdate".cast("date") >= lit("1995-02-01")).count()
    assert(rows.map(_._4).sum === expected)
  }
}
