package graft

import graft.ops.Round13Ops36
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 36: ordinal-pattern feasibility, ANOVA identity
  * checks, Borda fusion score algebra.
  */
class Round13Spec36 extends AnyFunSuite with SparkFixture {

  test("permutation entropy: only consistent codes, entropy in [0, log2 6]") {
    import spark.implicits._
    val rows = Round13Ops36.tsPermutationEntropy(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    // codes 1 (a>=b,b>=c but a<c) and 6 (a<b,b<c but a>=c) are
    // transitivity-impossible
    assert(rows.map(_._1).forall(c => c != 1L && c != 6L),
      s"impossible ordinal code present: ${rows.map(_._1).toSeq}")
    assert(rows.nonEmpty && rows.length <= 6)
    val h = rows.head._4
    assert(h >= 0.0 && h <= math.log(6.0) / math.log(2.0) + 1e-9)
    assert(math.abs(rows.head._5 - h / (math.log(6.0) / math.log(2.0)))
      < 1e-5)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3,
      "pattern frequencies must sum to ~1")
  }

  test("anova: F and eta-sq consistent with a local recomputation") {
    import spark.implicits._
    val (k, n, f, eta) = Round13Ops36.analyticAnovaF(spark, sf)
      .as[(Long, Long, Double, Double)].head()
    assert(k === 5L, "five priority classes")
    assert(n > 0 && f > 0.0 && !f.isInfinite)
    assert(eta > 0.0 && eta < 1.0)
    // identity: f = (eta/(k-1)) / ((1-eta)/(n-k))
    val fFromEta = (eta / (k - 1)) / ((1 - eta) / (n - k))
    assert(math.abs(f - fFromEta) / f < 1e-3,
      s"F $f inconsistent with eta-derived $fFromEta")
  }

  test("borda fusion: scores bounded, list consistent with components") {
    import spark.implicits._
    val rows = Round13Ops36.simBordaFusion(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length === 10)
    rows.foreach { case (id, s, pc, pe) =>
      assert(id != 0L, "probe must not retrieve itself")
      assert(s === pc + pe)
      assert(pc >= 0 && pc <= 20 && pe >= 0 && pe <= 20)
      assert(s > 0, "a fused top-10 item must appear in some list")
    }
    // descending by score with id tiebreak
    assert(rows.sliding(2).forall(p =>
      p(0)._2 > p(1)._2 || (p(0)._2 == p(1)._2 && p(0)._1 < p(1)._1)))
  }
}
