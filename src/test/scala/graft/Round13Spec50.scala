package graft

import graft.ops.Round13Ops50
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 50: conformal coverage guarantee, MATTR bounds. */
class Round13Spec50 extends AnyFunSuite with SparkFixture {

  test("conformal: held-out coverage near nominal for every segment") {
    import spark.implicits._
    val rows = Round13Ops50.mlConformalInterval(spark, sf)
      .as[(String, Long, Long, Long, Long, Double)].collect()
    assert(rows.length === 5)
    rows.foreach { case (seg, ncal, ntest, _, q90, cov) =>
      assert(ncal > 0 && ntest > 0)
      assert(q90 > 0, s"$seg: zero interval width")
      // conformal guarantee: coverage concentrates near 0.9; allow
      // generous finite-sample slack on the small fixture
      assert(cov > 0.7 && cov <= 1.0, s"$seg coverage $cov far from 0.9")
    }
  }

  test("mattr: in (0,1], window diversity below global distinct ratio cap") {
    import spark.implicits._
    val rows = Round13Ops50.textMattrDiversity(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, w, m) =>
      assert(w === n - 49)
      assert(m > 0.0 && m <= 1.0)
      // a 50-token window has at most 50 types: mattr <= 1 tight, and
      // with natural text repetition it should dip below 1 somewhere
    }
    assert(rows.exists(_._4 < 1.0), "some repetition must exist")
  }
}
