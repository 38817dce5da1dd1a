package graft

import graft.ops.Round13Ops48
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 48: assignment completeness, uplift cell algebra. */
class Round13Spec48 extends AnyFunSuite with SparkFixture {

  test("spherical assign: partition of the corpus, envelopes ordered") {
    import spark.implicits._
    val rows = Round13Ops48.simSphericalAssignRound(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val total = Tables.embeddings(spark, sf).count() - 5
    assert(rows.map(_._2).sum === total,
      "every non-seed vector lands in exactly one cluster")
    rows.foreach { case (sid, n, avg, mn, mx) =>
      assert(sid >= 0 && sid <= 4 && n > 0)
      assert(mn <= avg + 1e-6 && avg <= mx + 1e-6)
      assert(mx <= 1.0 + 1e-9)
    }
  }

  test("uplift: arm cells partition each segment") {
    import spark.implicits._
    val rows = Round13Ops48.mlUpliftTwoModel(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect()
    assert(rows.length === 5)
    val totalOrders = Tables.orders(spark, sf).count()
    assert(rows.map(r => r._2 + r._4).sum === totalOrders)
    rows.foreach { case (_, nt, yt, nc, yc, rt, rc, up) =>
      assert(nt > 0 && nc > 0, "md5 coin must populate both arms")
      assert(yt <= nt && yc <= nc)
      assert(math.abs(up - (rt - rc)) < 2e-6)
      assert(math.abs(up) <= 1.0)
    }
  }
}
