package graft

import graft.ops.Round13Ops53
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 53: ordinal grammar, CV positivity. */
class Round13Spec53 extends AnyFunSuite with SparkFixture {

  test("ordinal suffixes follow English rules incl teens") {
    import spark.implicits._
    val m = Round13Ops53.fnOrdinalSuffix(spark, sf)
      .as[(Long, String)].collect().toMap
    assert(m(1L) === "1st" && m(2L) === "2nd" && m(3L) === "3rd")
    assert(m(4L) === "4th" && m(11L) === "11th" && m(12L) === "12th")
    assert(m(13L) === "13th" && m(21L) === "21st" && m(22L) === "22nd")
    assert(m(23L) === "23rd" && m(33L) === "33rd" && m(40L) === "40th")
  }

  test("cv: positive for all five types, mean positive") {
    import spark.implicits._
    val rows = Round13Ops53.analyticCvByType(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length === 5)
    rows.foreach { case (_, n, mean, cv) =>
      assert(n > 0 && mean > 0)
      assert(cv > 0.0 && cv < 10.0 && !cv.isNaN)
    }
  }
}
