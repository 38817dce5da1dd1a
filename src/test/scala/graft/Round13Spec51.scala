package graft

import graft.ops.Round13Ops51
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 51: tile-entropy bounds, record-break expectation. */
class Round13Spec51 extends AnyFunSuite with SparkFixture {

  test("tile entropy: bounded by log2(64), avg <= max") {
    import spark.implicits._
    val rows = Round13Ops51.multimodalTileEntropy(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nt, avg, mx) =>
      assert(nt >= 1 && nt <= 8)
      assert(avg > 0.0 && avg <= mx + 1e-6)
      assert(mx <= 6.0 + 1e-9, "64 symbols cap entropy at log2(64)=6")
    }
  }

  test("record breaks: first day is both records, counts near harmonic") {
    import spark.implicits._
    val (n, hi, lo, exp, hr, lr) = Round13Ops51.tsRecordBreaks(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].head()
    assert(n > 100)
    assert(hi >= 1 && lo >= 1, "day one sets both records")
    assert(hi <= n && lo <= n)
    // harmonic number sanity: ln(n) < H_n < ln(n)+1
    assert(exp > math.log(n.toDouble) && exp < math.log(n.toDouble) + 1)
    assert(math.abs(hr - hi / exp) < 1e-4)
    assert(math.abs(lr - lo / exp) < 1e-4)
  }
}
