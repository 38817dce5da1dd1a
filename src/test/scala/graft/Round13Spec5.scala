package graft

import graft.ops.Round13Ops5
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 5: rank-sum identities for Kruskal-Wallis, runs-test
  * bounds, Cramér's V range + driver-side chi² cross-check.
  */
class Round13Spec5 extends AnyFunSuite with SparkFixture {

  test("kruskal-wallis: rank sums partition N(N+1), H positive, ties shrink it") {
    import spark.implicits._
    val rows = Round13Ops5.analyticKruskalWallis(spark, sf)
      .as[(String, Long, Long, Double, Long, Double, Double)].collect()
    assert(rows.length === 3) // three return flags
    val n = rows.head._5
    assert(rows.forall(_._5 == n))
    // sum over groups of 2*R_g telescopes to 2 * N(N+1)/2
    assert(rows.map(_._3).sum === n * (n + 1),
      "rank sums must partition the total rank mass exactly")
    // H > 0 on real data; the tie correction divides by (1 - x) < 1
    assert(rows.head._6 > 0.0)
    assert(rows.head._7 >= rows.head._6,
      "tie-corrected H must be >= uncorrected H")
    // mean ranks are within [1, N]
    rows.foreach { r => assert(r._4 >= 1.0 && r._4 <= n.toDouble) }
  }

  test("runs test: counts bounded by sign counts, z finite") {
    import spark.implicits._
    val rows = Round13Ops5.analyticRunsTest(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, np, nn, r, e, z) =>
      assert(r >= 1 && r <= np + nn, s"$et: runs $r out of [1, ${np + nn}]")
      // at least one run boundary requires both signs present
      if (np > 0 && nn > 0) assert(r >= 2 || np + nn == 1)
      assert(e > 0.0 && !z.isNaN && !z.isInfinite, s"$et: degenerate stats")
    }
  }

  test("cramers v: in [0,1], dims match, chi2 matches a driver-side recompute") {
    import spark.implicits._
    val (n, r, c, chi2, v) = Round13Ops5.analyticCramersV(spark, sf)
      .as[(Long, Long, Long, Double, Double)].head()
    assert(n === Tables.customer(spark, sf).count())
    assert(r === 5 && c === 25)
    assert(v >= 0.0 && v <= 1.0)
    // driver-side recompute with the same 6-dp freeze
    val cells = Tables.customer(spark, sf)
      .groupBy($"c_mktsegment", $"c_nationkey").count()
      .as[(String, Long, Long)].collect()
    val rowN = cells.groupBy(_._1).map { case (k, v2) => k -> v2.map(_._3).sum }
    val colN = cells.groupBy(_._2).map { case (k, v2) => k -> v2.map(_._3).sum }
    val ref = cells.map { case (s, nk, obs) =>
      val e = rowN(s).toDouble * colN(nk) / n
      BigDecimal((obs - e) * (obs - e) / e)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(chi2 - ref) < 1e-6, s"chi2 $chi2 != reference $ref")
  }
}
