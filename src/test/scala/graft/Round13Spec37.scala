package graft

import graft.ops.Round13Ops37
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 37: McNemar cell algebra, Kendall pair-count
  * identities.
  */
class Round13Spec37 extends AnyFunSuite with SparkFixture {

  test("mcnemar: discordant cells drive chi2, cc variant smaller") {
    import spark.implicits._
    val (n, b, c, chi2, cc) = Round13Ops37.mlMcnemarTest(spark, sf)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(n > 0 && b >= 0 && c >= 0 && b + c > 0)
    assert(b + c <= n)
    val expected = math.pow((b - c).toDouble, 2) / (b + c)
    assert(math.abs(chi2 - expected) < 1e-6)
    assert(cc <= chi2 + 1e-9, "continuity correction cannot increase chi2")
    assert(cc >= 0.0)
  }

  test("kendall tau-b: pair counts partition, tau within [-1,1]") {
    import spark.implicits._
    val (n0, cc, dd, tx, ty, tau) =
      Round13Ops37.analyticKendallTau(spark, sf)
        .as[(Long, Long, Long, Long, Long, Double)].head()
    // the 300-key slice has <=300 rows so n0 = n(n-1)/2 for the rows present
    assert(n0 > 0 && cc + dd <= n0)
    // every pair is concordant, discordant, or tied in x or y (ties
    // overlap, so cc+dd+ties >= n0)
    assert(cc + dd + tx + ty >= n0)
    assert(tau >= -1.0 && tau <= 1.0)
    val denom = math.sqrt((n0 - tx).toDouble * (n0 - ty))
    assert(math.abs(tau - (cc - dd) / denom) < 1e-5)
  }
}
