package graft

import graft.ops.Round13Ops35
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 35: Hurst bounds and R/S scaling, Burrows-Delta
  * metric properties.
  */
class Round13Spec35 extends AnyFunSuite with SparkFixture {

  test("hurst: four dyadic sizes, rs positive and increasing in m, H in (0,1.2)") {
    import spark.implicits._
    val rows = Round13Ops35.tsHurstExponent(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).toSeq === Seq(64L, 128L, 256L, 512L))
    rows.foreach { case (m, nb, rs, _) =>
      assert(nb >= 1, s"block size $m has no complete blocks")
      assert(rs > 0.0)
    }
    // R/S grows with block size for any nondegenerate series
    assert(rows.map(_._3).sliding(2).forall(p => p(1) > p(0)),
      s"avg R/S not increasing: ${rows.map(_._3).toSeq}")
    val h = rows.head._4
    assert(rows.forall(_._4 === h), "hurst constant across rows")
    assert(h > 0.0 && h < 1.2, s"implausible Hurst $h")
  }

  test("burrows delta: symmetric-complete pair grid, nonnegative, self-consistent") {
    import spark.implicits._
    val rows = Round13Ops35.textBurrowsDelta(spark, sf)
      .as[(String, String, Long, Double)].collect()
    val sources = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted
    val k = sources.length
    assert(rows.length === k * (k - 1) / 2,
      s"expected all ${k * (k - 1) / 2} unordered pairs, got ${rows.length}")
    rows.foreach { case (a, b, nt, d) =>
      assert(a < b)
      assert(nt === 20L, "delta must average exactly the top-20 tokens")
      assert(d >= 0.0 && !d.isNaN && !d.isInfinite)
    }
    // deltas must not all collapse to one value (distinct styles exist)
    assert(rows.map(_._4).distinct.length > 1)
  }
}
