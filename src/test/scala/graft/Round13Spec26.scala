package graft

import graft.ops.Round13Ops26
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 26: CUPED variance-only guarantee, Theil
  * decomposition identity vs the registered global index.
  */
class Round13Spec26 extends AnyFunSuite with SparkFixture {

  test("cuped: pooled variance never grows; per-arm ratios stay near 1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Round13Ops26.analyticCupedAdjustment(spark, sf)
      .as[(Int, Long, Double, Double, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSet === Set(0, 1))
    rows.foreach { case (arm, n, my, mc, vy, vc, ratio) =>
      assert(n > 0)
      // θ is fit on the POOLED population: per-arm variance may tick
      // up by sampling noise, but never materially (the corpus has
      // nearly independent pre/post counts, so ratios sit near 1)
      assert(ratio > 0.7 && ratio < 1.15, s"arm $arm: ratio $ratio")
      assert(math.abs(mc - my) < my, "adjustment should not explode the mean")
    }
    // the guarantee CUPED actually makes: pooled var(Y-θX) <= var(Y)
    val ev = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts".cast("timestamp")).as("us"))
      .as[(Long, Long)].collect()
    val mid = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val per = ev.groupBy(_._1).values.map { g =>
      (g.count(_._2 < mid).toDouble, g.count(_._2 >= mid).toDouble) }.toArray
    val n = per.length.toDouble
    val mx = per.map(_._1).sum / n; val myAll = per.map(_._2).sum / n
    val cov = per.map(p => (p._1 - mx) * (p._2 - myAll)).sum / n
    val vx = per.map(p => (p._1 - mx) * (p._1 - mx)).sum / n
    val vy = per.map(p => (p._2 - myAll) * (p._2 - myAll)).sum / n
    val theta = cov / vx
    val vAdj = per.map(p => {
      val a = (p._2 - myAll) - theta * (p._1 - mx); a * a }).sum / n
    assert(vAdj <= vy + 1e-9, s"pooled CUPED variance grew: $vAdj > $vy")
  }

  test("theil: within+between reproduces the plain per-year theil's scale") {
    import spark.implicits._
    val rows = Round13Ops26.analyticTheilDecomposition(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.length === 5)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-3,
      "income shares must sum to 1")
    // between terms can be negative individually but sum >= 0
    assert(rows.map(_._5).sum >= -1e-6)
    rows.foreach { case (seg, n, tw, share, _) =>
      assert(n > 0 && share > 0)
      assert(tw >= 0.0, s"$seg: within-Theil negative")
    }
    // global T = sum share_k * T_k + T_between >= max component
    val total = rows.map(r => r._4 * r._3).sum + rows.map(_._5).sum
    assert(total > 0.0)
  }
}
