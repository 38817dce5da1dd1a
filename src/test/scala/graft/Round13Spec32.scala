package graft

import graft.ops.Round13Ops32
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 32: SAX alphabet balance, trend-test algebra,
  * turning-point bounds.
  */
class Round13Spec32 extends AnyFunSuite with SparkFixture {

  test("sax: equi-depth alphabet is balanced, segments contiguous") {
    import spark.implicits._
    val rows = Round13Ops32.tsSaxSymbols(spark, sf)
      .as[(Long, Long, Double, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === rows.indices.map(_.toLong),
      "segments are 0..n-1 in order")
    // every segment except possibly the last covers exactly 7 days
    rows.init.foreach { case (_, nd, _, _) => assert(nd === 7L) }
    val bySym = rows.groupBy(_._4).view.mapValues(_.length).toMap
    assert(bySym.keySet.subsetOf(Set("a", "b", "c", "d")))
    assert(bySym.values.max - bySym.values.min <= 1,
      s"ntile alphabet must be balanced: $bySym")
    // symbols are ordered by PAA value: max paa of class 'a' <= min of 'd'
    val aMax = rows.filter(_._4 == "a").map(_._3).max
    val dMin = rows.filter(_._4 == "d").map(_._3).min
    assert(aMax <= dMin)
  }

  test("cochran-armitage: totals consistent, z finite") {
    import spark.implicits._
    val (n, r, swn, swr, pr, z) =
      Round13Ops32.analyticCochranArmitage(spark, sf)
        .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(n > 0 && r > 0 && r < n)
    assert(swr <= swn && swn <= 5 * n, "weights are 1..5")
    assert(math.abs(pr - r.toDouble / n) < 1e-6)
    assert(!z.isNaN && !z.isInfinite)
  }

  test("turning points: count within bounds, z matches closed form") {
    import spark.implicits._
    val (n, t, e, z) = Round13Ops32.tsTurningPoints(spark, sf)
      .as[(Long, Long, Double, Double)].head()
    assert(n > 2 && t >= 0 && t <= n - 2)
    assert(math.abs(e - 2.0 * (n - 2) / 3.0) < 1e-5)
    val zExp = (t - 2.0 * (n - 2) / 3.0) /
      math.sqrt((16.0 * n - 29.0) / 90.0)
    assert(math.abs(z - zExp) < 1e-5)
  }
}
