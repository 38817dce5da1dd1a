package graft

import graft.ops.Round13Ops40
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 40: Croston state-machine invariants, Wilcoxon rank
  * identities.
  */
class Round13Spec40 extends AnyFunSuite with SparkFixture {

  test("croston: intermittent demand smoothed within observed envelope") {
    import spark.implicits._
    val (nd, ndd, z, p, rate) =
      Round13Ops40.tsCrostonIntermittent(spark, sf)
        .as[(Long, Long, Long, Long, Double)].head()
    assert(nd > 0 && ndd >= 2, "part 1 must ship on at least two days")
    assert(ndd < nd, "demand must be intermittent (zeros exist)")
    assert(z > 0 && p > 0)
    // smoothed interval cannot exceed the whole horizon, nor be < 1 day
    assert(p >= 1000000L && p <= nd * 1000000L)
    assert(math.abs(rate - z.toDouble / p) < 1e-6)
  }

  test("wilcoxon: doubled ranks sum to m(m+1), z finite") {
    import spark.implicits._
    val (m, wp2, wm2, zScore) =
      Round13Ops40.analyticWilcoxonSignedRank(spark, sf)
        .as[(Long, Long, Long, Double)].head()
    assert(m > 0)
    // sum of all average ranks = m(m+1)/2, so doubled: m(m+1)
    assert(wp2 + wm2 === m * (m + 1),
      s"rank mass ${wp2 + wm2} != ${m * (m + 1)}")
    assert(!zScore.isNaN && !zScore.isInfinite)
    val w = wp2 / 2.0
    val zExp = (w - m * (m + 1) / 4.0) /
      math.sqrt(m * (m + 1) * (2 * m + 1) / 24.0)
    assert(math.abs(zScore - zExp) < 1e-5)
  }
}
