package graft

import graft.ops.Round13Ops6
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 6: Ljung-Box positivity/df, spectral-entropy range,
  * PACF lag-1 identity vs the ACF table.
  */
class Round13Spec6 extends AnyFunSuite with SparkFixture {

  test("ljung-box: q positive, df=7, n_days matches the daily span") {
    import spark.implicits._
    val rows = Round13Ops6.tsLjungBox(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, df, q) =>
      assert(df === 7, s"$et: df $df")
      assert(n > 14, s"$et: series too short for lag 7")
      assert(q >= 0.0 && !q.isNaN, s"$et: q $q")
    }
  }

  test("spectral entropy: in (0,1], white-ish daily noise lands high") {
    import spark.implicits._
    val rows = Round13Ops6.tsSpectralEntropy(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, _, h) =>
      assert(h > 0.0 && h <= 1.0 + 1e-9, s"$et: entropy $h out of range")
    }
  }

  test("pacf: lag-1 equals acf lag-1, all finite and within (-1,1)") {
    import spark.implicits._
    val rows = Round13Ops6.tsPacf(spark, sf)
      .as[(String, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // pacf1 IS the lag-1 autocorrelation by construction; cross-check
    // against the independently-registered ts_acf_table op
    val acf1 = graft.ops.Round11Ops28.tsAcfTable(spark, sf)
      .filter("k = 1").select("event_type", "acf")
      .as[(String, Double)].collect().toMap
    rows.foreach { case (et, p1, p2, p3) =>
      assert(p1 === acf1(et), s"$et: pacf1 $p1 != acf1 ${acf1(et)}")
      Seq(p1, p2, p3).foreach(p =>
        assert(!p.isNaN && math.abs(p) < 1.0, s"$et: pacf $p"))
    }
  }
}
