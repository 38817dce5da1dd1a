package graft

import graft.ops.Round11Ops7
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 7: attribution, threshold sweep, Heaps'
  * fit, IQR audit, centroid matrix, seasonal strength. */
class Round11Spec4 extends AnyFunSuite with SparkFixture {

  test("attribution: purchases and revenue are fully attributed") {
    import spark.implicits._
    val rows = Round11Ops7.analyticAttribution(spark, sf)
      .as[(String, Long, Double)].collect()
    val purch = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .agg(count(lit(1)), sum(Tables.money($"value")).cast("double"))
      .as[(Long, Double)].head()
    assert(rows.map(_._2).sum === purch._1)
    assert(math.abs(rows.map(_._3).sum - purch._2) < 1e-6)
    // channels are non-purchase types (or direct)
    rows.foreach { case (c, _, _) => assert(c != "purchase") }
  }

  test("threshold sweep: recall monotone up, decile-10 recall = 1, f1 consistent") {
    import spark.implicits._
    val rows = Round11Ops7.mlThresholdSweep(spark, sf)
      .as[(Int, Long, Long, Long, Double, Double, Double)].collect()
      .sortBy(_._1)
    assert(rows.map(_._1).sameElements(1 to 10))
    val recalls = rows.map(_._6)
    assert(recalls.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-9))
    assert(math.abs(recalls.last - 1.0) < 1e-6)
    rows.foreach { case (_, tp, fp, fn, p, r, f1) =>
      val expect = 2.0 * tp / (2 * tp + fp + fn)
      assert(math.abs(f1 - expect) < 1e-5)
      assert(p >= 0 && p <= 1 && r >= 0 && r <= 1)
    }
  }

  test("heaps fit: beta in (0,1) for natural-ish text, 20 sources") {
    import spark.implicits._
    val Array((n, beta, lnk)) = Round11Ops7.textHeapsFit(spark, sf)
      .as[(Long, Double, Double)].collect()
    assert(n === 20)
    assert(beta > 0.0 && beta < 1.0)
    assert(!lnk.isNaN && !lnk.isInfinite)
  }

  test("iqr audit: fences ordered, outliers a minority, all types present") {
    import spark.implicits._
    val rows = Round11Ops7.pipelineAnomalyIqr(spark, sf)
      .as[(String, Double, Double, Long, Long, Long)].collect()
    assert(rows.length === 5)
    rows.foreach { case (_, q1, q3, n, lo, hi) =>
      assert(q1 <= q3)
      assert(lo + hi < n / 2)
    }
  }

  test("centroid matrix: diagonal = 1, symmetric pairs bounded, |cos| <= 1") {
    import spark.implicits._
    val rows = Round11Ops7.simLangCentroidMatrix(spark, sf)
      .as[(String, String, Double)].collect()
    assert(rows.length === 15) // 5 langs: C(5,2) + 5 diagonal
    rows.foreach { case (a, b, c) =>
      assert(a <= b)
      if (a == b) assert(math.abs(c - 1.0) < 1e-5)
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("seasonal strength: F in [0,1] up to rounding, five event types") {
    import spark.implicits._
    val rows = Round11Ops7.tsSeasonalStrength(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.length === 5)
    rows.foreach { case (_, nDays, f) =>
      assert(nDays > 0)
      // SS_between <= SS_total; tiny negative slack from the 9-dp lane
      assert(f >= -1e-6 && f <= 1.0 + 1e-6)
    }
  }
}
