package graft

import graft.ops.Round13Ops45
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 45: FFD packing feasibility + bound, concentration
  * monotonicity.
  */
class Round13Spec45 extends AnyFunSuite with SparkFixture {

  test("ffd: bins feasible, count within FFD's guarantee of the LP bound") {
    import spark.implicits._
    val (ni, tot, nb, mx, lb, fill) =
      Round13Ops45.pipelineFfdBinPacking(spark, sf)
        .as[(Long, Long, Long, Long, Long, Double)].head()
    assert(ni > 0 && nb > 0)
    assert(mx <= 262144L, s"a bin overflows capacity: $mx")
    assert(nb >= lb, "cannot beat the LP lower bound")
    assert(nb <= (11L * lb) / 9 + 2, s"FFD guarantee violated: $nb vs lb $lb")
    assert(fill > 0.0 && fill <= 1.0)
    assert(math.abs(fill - tot.toDouble / (nb * 262144.0)) < 1e-6)
  }

  test("top-share: nested prefixes give monotone shares") {
    import spark.implicits._
    val (n, t, s1, s5, s10) =
      Round13Ops45.analyticTopShareConcentration(spark, sf)
        .as[(Long, Long, Double, Double, Double)].head()
    assert(n > 0 && t > 0)
    assert(s1 <= s5 && s5 <= s10 && s10 <= 1.0)
    assert(s1 > 0.0)
    // top 1% of orders must out-earn a uniform 1% of revenue
    assert(s1 >= 0.01 - 1e-6 || n < 100)
  }
}
