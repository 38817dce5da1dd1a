package graft

import graft.ops.Round13Ops49
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 49: Lorenz asymmetry bounds, rich-club structure. */
class Round13Spec49 extends AnyFunSuite with SparkFixture {

  test("lorenz asymmetry: components bounded, below-mean majority for right-skew") {
    import spark.implicits._
    val (n, t, m, f, l, s) =
      Round13Ops49.analyticLorenzAsymmetry(spark, sf)
        .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(n > 0 && t > 0 && m > 0 && m < n)
    assert(f > 0.0 && f < 1.0 && l > 0.0 && l < 1.0)
    assert(l < f, "below-mean mass holds less than its population share")
    assert(math.abs(s - (f + l)) < 1e-5)
    assert(s > 0.0 && s < 2.0)
  }

  test("rich club: monotone membership, density within [0,1]") {
    import spark.implicits._
    val rows = Round13Ops49.graphRichClub(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)
    // raising k can only shrink the club
    assert(rows.map(_._2).sliding(2).forall(p =>
      p.length < 2 || p(0) >= p(1)))
    rows.foreach { case (_, nk, ek, phi) =>
      assert(nk > 0 && ek >= 0)
      assert(ek <= nk * (nk - 1) / 2, "edges bounded by pairs")
      assert(phi >= 0.0 && phi <= 1.0)
    }
  }
}
