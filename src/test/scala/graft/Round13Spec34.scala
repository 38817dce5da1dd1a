package graft

import graft.ops.Round13Ops34
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 34: AdaBoost invariants — nondegenerate rounds,
  * weight-update algebra, ensemble-vs-stump behavior.
  */
class Round13Spec34 extends AnyFunSuite with SparkFixture {

  test("adaboost rounds: errors nondegenerate, rates consistent") {
    import spark.implicits._
    val rows = Round13Ops34.mlAdaboostStumps(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.length === 3)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    rows.foreach { case (_, stump, p, q, rate, lof) =>
      assert(stump >= 1 && stump <= 4)
      assert(p > 0 && p < q,
        s"degenerate round: err mass $p of $q (stumps must be imperfect)")
      assert(math.abs(rate - p.toDouble / q) < 1e-6)
      assert(math.abs(lof - math.log((q - p).toDouble / p)) < 1e-5)
    }
    // the first round must pick a stump with error <= 0.5 available
    // only if one exists; at minimum the chosen one is the argmin, so
    // its rate cannot exceed any later-round base rate by definition
    // of least() — sanity: rate strictly between 0 and 1
    rows.foreach { case (_, _, _, _, rate, _) =>
      assert(rate > 0.0 && rate < 1.0)
    }
  }

  test("adaboost vote: accuracy beats the best single stump iff boosting helped") {
    import spark.implicits._
    val (n, correct, acc) = Round13Ops34.mlAdaboostVoteAcc(spark, sf)
      .as[(Long, Long, Double)].head()
    assert(n > 0 && correct >= 0 && correct <= n)
    assert(math.abs(acc - correct.toDouble / n) < 1e-6)
    // the ensemble can never be worse than coin flip on the side the
    // first (lowest-error) stump chose: its round-1 error rate e1
    // bounds the single-stump baseline 1-e1; assert the ensemble is
    // at least as good as predicting with the round-1 stump inverted
    val r1 = Round13Ops34.mlAdaboostStumps(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect().head
    val stumpAcc = 1.0 - r1._5
    assert(acc >= math.min(stumpAcc, 1.0 - stumpAcc) - 1e-9,
      s"ensemble acc $acc below both stump sides of $stumpAcc")
  }
}
