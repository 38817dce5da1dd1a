package graft

import graft.ops.Round11Ops16
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 16: exact NB, learning curve, YTD,
  * rolling min/max, positional index, CR4. */
class Round11Spec13 extends AnyFunSuite with SparkFixture {

  test("nb exact: covers the holdout, beats chance clearly") {
    import spark.implicits._
    val rows = Round11Ops16.mlNbSqlExact(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    val total = rows.map(_._2).sum
    assert(total > 0)
    val acc = rows.map(_._3).sum.toDouble / total
    // the synthetic corpus shares one vocabulary across langs, so NB
    // separates them only weakly (0.318 measured at sf0.001); assert
    // above the 0.2 chance floor
    assert(acc > 0.24, s"NB accuracy $acc")
  }

  test("learning curve: fractions nested, train sizes increasing") {
    import spark.implicits._
    val rows = Round11Ops16.mlLearningCurve(spark, sf)
      .as[(Int, Long, Int, Long, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq(10, 20, 40, 80))
    assert(rows.map(_._2).sliding(2).forall(w => w(0) < w(1)))
    rows.foreach { case (_, _, lbl, nTest, acc) =>
      assert(lbl == 0 || lbl == 1)
      assert(nTest > 0 && acc >= 0.0 && acc <= 1.0)
    }
  }

  test("ytd: resets each January, accumulates within year") {
    val rows = Round11Ops16.tsYtdCumulative(spark, sf).collect()
    val by = rows.groupBy(r => (r.getString(0), r.getInt(1)))
    by.foreach { case (_, rs) =>
      val s = rs.sortBy(_.getInt(2))
      var run = 0L
      s.foreach { r =>
        run += r.getLong(3)
        assert(r.getLong(4) === run)
      }
    }
  }

  test("rolling minmax: envelope brackets the current value") {
    import spark.implicits._
    val rows = Round11Ops16.winRollingMinmax(spark, sf)
      .as[(String, Date, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, c, mn, mx) =>
      assert(mn <= c && c <= mx)
    }
  }

  test("positional index: tf equals position count, positions sorted") {
    import spark.implicits._
    val rows = Round11Ops16.textPositionalIndex(spark, sf)
      .as[(String, Long, Long, Long, String)].collect()
    assert(rows.map(_._1).distinct.length === 10)
    rows.foreach { case (_, df, _, tf, pos) =>
      val ps = pos.split(",").map(_.toLong)
      assert(ps.length === tf)
      assert(ps.sorted.toSeq === ps.toSeq)
      assert(df >= 1)
    }
  }

  test("cr4: in (0,1], monotone with supplier concentration") {
    import spark.implicits._
    val rows = Round11Ops16.analyticCr4(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.length === 5)
    rows.foreach { case (_, ns, cr) =>
      assert(ns > 0)
      assert(cr > 0.0 && cr <= 1.0)
      if (ns <= 4) assert(math.abs(cr - 1.0) < 1e-9)
    }
  }
}
