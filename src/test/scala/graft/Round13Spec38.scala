package graft

import graft.ops.Round13Ops38
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 38: bootstrap CI ordering/coverage sanity,
  * information-gain inequalities.
  */
class Round13Spec38 extends AnyFunSuite with SparkFixture {

  test("bootstrap: 50 replicates, CI ordered around the mean of means") {
    import spark.implicits._
    val (n, mm, lo, hi) = Round13Ops38.mlBootstrapCiHash(spark, sf)
      .as[(Long, Double, Double, Double)].head()
    assert(n === 50L)
    assert(lo <= mm && mm <= hi, s"CI [$lo,$hi] must bracket mean $mm")
    assert(lo < hi, "degenerate CI")
    // resampled means hover near the slice's true mean
    val truth = Tables.orders(spark, sf)
      .filter($"o_orderkey" < 5000)
      .agg(org.apache.spark.sql.functions.avg(
        Tables.money($"o_totalprice") * 100))
      .as[java.math.BigDecimal].head().doubleValue()
    assert(lo < truth && truth < hi,
      s"true mean $truth outside bootstrap CI [$lo, $hi]")
  }

  test("interaction gain: monotone in conditioning, gains bounded by H") {
    import spark.implicits._
    val (h, iga, igb, igab, syn) =
      Round13Ops38.mlInteractionInfoGain(spark, sf)
        .as[(Double, Double, Double, Double, Double)].head()
    assert(h > 0.0 && h <= math.log(3.0) / math.log(2.0) + 1e-9,
      "3-class label entropy bounded by log2(3)")
    assert(iga >= -1e-9 && igb >= -1e-9, "information gains nonnegative")
    // conditioning on both features cannot lose information vs either
    assert(igab >= iga - 1e-9 && igab >= igb - 1e-9)
    assert(igab <= h + 1e-9)
    assert(math.abs(syn - (igab - iga - igb)) < 1e-5)
  }
}
