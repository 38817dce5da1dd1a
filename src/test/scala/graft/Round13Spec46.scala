package graft

import graft.ops.Round13Ops46
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 46: seasonal MK structure, similarity-metric
  * axioms.
  */
class Round13Spec46 extends AnyFunSuite with SparkFixture {

  test("seasonal mk: seven strands, statistic bounded by pair count") {
    import spark.implicits._
    val (ns, s, v18, z) = Round13Ops46.tsSeasonalMannKendall(spark, sf)
      .as[(Long, Long, Long, Double)].head()
    assert(ns === 7L)
    assert(v18 > 0)
    assert(!z.isNaN && !z.isInfinite)
    // |S| can never exceed the total number of pairs: sum over
    // seasons of n(n-1)/2 <= var18 (since n(n-1)(2n+5)/18 > n(n-1)/2
    // for n >= 7)
    assert(math.abs(s) <= v18)
  }

  test("name similarity: metric axioms hold pairwise") {
    import spark.implicits._
    val rows = Round13Ops46.fnNameSimilarityProfile(spark, sf)
      .as[(Long, String, String, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, a, b, lev, jac, lcp) =>
      assert(lev >= math.abs(a.length - b.length),
        "levenshtein lower bound")
      assert(lev <= math.max(a.length, b.length))
      assert(jac > 0.0 && jac <= 1.0, "names share letters")
      assert(lcp >= 0 && lcp <= math.min(a.length, b.length))
      // recompute lcp locally
      val ref = a.zip(b).takeWhile { case (x, y) => x == y }.length
      assert(lcp === ref.toLong)
      if (a == b) assert(lev == 0 && jac == 1.0)
    }
  }
}
