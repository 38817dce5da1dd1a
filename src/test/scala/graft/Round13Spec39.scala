package graft

import graft.ops.Round13Ops39
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 39: Borůvka forest invariants, Holt-Winters
  * forecast structure.
  */
class Round13Spec39 extends AnyFunSuite with SparkFixture {

  test("boruvka: forest acyclic bounds, components at least halved") {
    import spark.implicits._
    val (nn, ne, nc, comp, fw) = Round13Ops39.graphBoruvkaRound(spark, sf)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(nn > 0 && ne > 0 && fw > 0)
    assert(nc < nn, "a forest has fewer edges than nodes")
    assert(comp === nn - nc)
    // every node picked an edge, so each chosen edge covers <= 2
    // pickers: at least ceil(n/2) edges survive dedup
    assert(nc >= (nn + 1) / 2,
      s"chosen $nc edges cannot cover all $nn pickers")
    assert(comp <= nn / 2, "Boruvka halves component count per round")
  }

  test("holt-winters: 7 forecasts follow level+trend+season algebra") {
    import spark.implicits._
    val rows = Round13Ops39.tsHoltWintersAdditive(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === (1L to 7L))
    val level = rows.head._3
    val trend = rows.head._4
    assert(rows.forall(r => r._3 === level && r._4 === trend))
    // seasonal component implied by forecast must repeat nowhere
    // beyond [−level, +level] sanity scale and forecasts stay positive
    // for a revenue series
    rows.foreach { case (h, f, l, t) =>
      val season = f - l - h * t
      assert(math.abs(season) < math.abs(l),
        s"season $season implausibly large vs level $l")
      assert(f > 0, s"negative revenue forecast at h=$h")
    }
    // trend is bounded: one day's drift is a small fraction of level
    assert(math.abs(trend) < math.abs(level) / 2)
  }
}
