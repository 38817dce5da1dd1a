package graft

import graft.ops.Round13Ops44
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 44: double-sweep monotonicity, percentile band
  * ordering.
  */
class Round13Spec44 extends AnyFunSuite with SparkFixture {

  test("pseudo diameter: second sweep at least as long as the first") {
    import spark.implicits._
    val (s, f, e1, end, pd, nr) =
      Round13Ops44.graphPseudoDiameter(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(e1 >= 0 && pd >= e1,
      s"restarting from the periphery cannot shrink eccentricity: $e1 -> $pd")
    assert(pd <= 4, "bounded sweep cannot exceed the hop budget")
    assert(nr > 1, "second sweep must reach beyond its seed")
    assert(f != s || e1 == 0)
    assert(end >= 0)
  }

  test("percentile bands: ordered, window covers current day") {
    import spark.implicits._
    val rows = Round13Ops44.tsRollingPercentileBands(spark, sf)
      .as[(java.sql.Date, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, c, p10, p50, p90, edge) =>
      assert(p10 <= p50 && p50 <= p90)
      assert(c >= p10 && c <= p90,
        "current day is inside its own trailing window")
      assert(edge == 0L || edge == 1L)
      if (c == p90 || c == p10) assert(edge == 1L)
    }
    // at least one local extreme exists in any nondegenerate series
    assert(rows.exists(_._6 == 1L))
  }
}
