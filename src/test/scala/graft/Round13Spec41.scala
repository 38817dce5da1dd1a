package graft

import graft.ops.Round13Ops41
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 41: GBM round-trace invariants, monotone SSE. */
class Round13Spec41 extends AnyFunSuite with SparkFixture {

  test("gbm rounds: valid cuts, nondegenerate leaves, positive scores") {
    import spark.implicits._
    val rows = Round13Ops41.mlGbmStumpRounds(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq(1L, 2L, 3L))
    rows.foreach { case (_, cut, nl, pl, pr, sc) =>
      assert(cut >= 1 && cut <= 6)
      assert(nl > 0, "degenerate left leaf")
      assert(sc > 0.0, "chosen split must reduce variance")
      assert(pl != pr, "leaves predicting the same value explain nothing")
    }
  }

  test("gbm mse: boosting strictly reduces SSE, ratio in (0,1)") {
    import spark.implicits._
    val (n, r0, r3, ratio) = Round13Ops41.mlGbmResidualMse(spark, sf)
      .as[(Long, Double, Double, Double)].head()
    assert(n > 0)
    assert(r0 > 0 && r3 > 0)
    assert(r3 < r0, s"rmse did not improve: $r0 -> $r3")
    assert(ratio > 0.0 && ratio < 1.0)
    assert(math.abs(ratio - (r3 * r3) / (r0 * r0)) < 0.01,
      "ratio consistent with rmse pair")
  }
}
