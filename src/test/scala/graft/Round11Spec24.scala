package graft

import graft.ops.Round11Ops27
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 27: dim variance, PII masking, mix shift,
  * revenue bridge, null bypass, compound growth. */
class Round11Spec24 extends AnyFunSuite with SparkFixture {

  test("dim variance: 64 dims, non-negative variance") {
    import spark.implicits._
    val rows = Round11Ops27.simDimVarianceAudit(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(rows.length === 64)
    val n = Tables.embeddings(spark, sf).count()
    rows.foreach { case (_, cnt, _, v) =>
      assert(cnt === n)
      assert(v >= -1e-6)
    }
  }

  test("mask: shape preserved, letters and digits substituted") {
    import spark.implicits._
    val rows = Round11Ops27.fnMaskPii(spark, sf)
      .as[(Long, String, String, String)].collect()
    rows.foreach { case (_, name, m, mc) =>
      assert(m.length === name.length && mc.length === name.length)
      assert(!m.exists(_.isDigit), "digits masked")
      name.zip(m).foreach { case (o, x) =>
        if (o.isUpper) assert(x === 'X')
        else if (o.isLower) assert(x === 'x')
        else if (o.isDigit) assert(x === 'n')
        else assert(x === o)
      }
    }
  }

  test("mix shift: effects telescope to the revenue delta") {
    import spark.implicits._
    val rows = Round11Ops27.analyticMixShift(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, delta, ve, re) =>
      assert(math.abs((ve + re) - delta) < 1.0,
        s"volume $ve + rate $re vs delta $delta")
    }
  }

  test("revenue bridge: start + new - churn + expand - contract = end") {
    import spark.implicits._
    val r = Round11Ops27.analyticRevenueBridge(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    val (start, nw, churn, exp2, contr, end) = r
    assert(start + nw - churn + exp2 - contr === end)
    assert(start > 0 && end > 0)
  }

  test("null bypass: identical to the inner join, nulls counted") {
    import spark.implicits._
    val rows = Round11Ops27.scaleNullSkewBypass(spark, sf)
      .as[(Int, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    val expectedBypassed = Tables.lineitem(spark, sf)
      .filter(pmod($"l_suppkey", lit(97)) === 0).count()
    rows.foreach { case (_, n, _, nb) =>
      assert(nb === expectedBypassed)
      assert(n > 0)
    }
    val joinedTotal = rows.map(_._2).sum
    assert(joinedTotal + expectedBypassed ===
      Tables.lineitem(spark, sf).count())
  }

  test("compound growth: index is the chained product of day ratios") {
    import spark.implicits._
    val rows = Round11Ops27.winCompoundGrowth(spark, sf)
      .as[(String, Date, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, g) => assert(g > 0) }
    // spot-check one series end-to-end: index_last ~ cents_last/cents_first
    val daily = Tables.events(spark, sf)
      .filter($"event_type" === "view")
      .groupBy(to_date($"ts").as("d"))
      .agg(sum((Tables.money($"value") * 100).cast("long")).as("c"))
      .orderBy($"d").as[(Date, Long)].collect()
    val expected = daily.last._2.toDouble / daily.head._2
    val got = rows.filter(_._1 == "view").maxBy(_._2.toLocalDate.toEpochDay)._3
    assert(math.abs(got - expected) / expected < 1e-3)
  }
}
