package graft

import graft.ops.Round13Ops52
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 52: Gini accounting identity, Tukey ordering. */
class Round13Spec52 extends AnyFunSuite with SparkFixture {

  test("gini decomposition: parts nonnegative and sum to the total") {
    import spark.implicits._
    val (g, b, w, r) = Round13Ops52.analyticGiniDecomposition(spark, sf)
      .as[(Double, Double, Double, Double)].head()
    assert(g > 0.0 && g < 1.0)
    assert(b >= 0.0 && w >= 0.0)
    assert(b <= g + 1e-6 && w <= g + 1e-6)
    assert(math.abs(g - b - w - r) < 1e-5, "accounting identity")
    assert(r >= -1e-6, "overlap residual cannot be negative")
  }

  test("tukey: quartiles ordered, derived stats consistent") {
    import spark.implicits._
    val (n, q1, q2, q3, mh2, tm4, iqr, hi) =
      Round13Ops52.aggTukeySummary(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(n > 0)
    assert(q1 <= q2 && q2 <= q3)
    assert(mh2 === q1 + q3)
    assert(tm4 === q1 + 2 * q2 + q3)
    assert(iqr === q3 - q1)
    assert(hi >= 0 && hi < n / 4, "fence cannot flag a quartile's worth")
  }
}
