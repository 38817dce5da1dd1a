package graft

import graft.ops.Round11Ops33
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 33: harmonic mean, string builders,
  * normalized keys, weekend uplift. */
class Round11Spec30 extends AnyFunSuite with SparkFixture {

  test("harmonic mean: below the arithmetic mean, positive") {
    import spark.implicits._
    val rows = Round11Ops33.aggHarmonicMean(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val am = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").agg(avg($"l_extendedprice"))
      .as[(String, Double)].collect().toMap
    rows.foreach { case (rf, n, h) =>
      assert(n > 0 && h > 0)
      assert(h <= am(rf) + 1e-6, "harmonic <= arithmetic")
    }
  }

  test("string builders: splice/repeat/pad/reverse shapes hold") {
    import spark.implicits._
    val rows = Round11Ops33.fnStringBuilders(spark, sf)
      .limit(100).as[(Long, String, String, String, String, String)].collect()
    rows.foreach { case (k, name, sp, rep, pad, rev) =>
      assert(sp === name.substring(0, 2) + "###" + name.substring(5))
      assert(rep === name.substring(0, 2) * 3)
      assert(pad.length === 10 && pad.endsWith(k.toString))
      assert(rev === name.reverse)
    }
  }

  test("normalized keys: normalization recovers all mangled refs") {
    import spark.implicits._
    val r = Round11Ops33.joinNormalizedKeys(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    val (n, raw, norm, rec) = r
    assert(n === Tables.supplier(spark, sf).count())
    assert(norm === n, "every reference matches after normalization")
    assert(raw < n, "mangled references fail the raw join")
    assert(rec === norm - raw)
  }

  test("weekend uplift: positive ratio, day counts reconcile") {
    import spark.implicits._
    val rows = Round11Ops33.analyticWeekendUplift(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, we, wd, u) =>
      assert(we > 0 && wd > 0 && u > 0)
    }
  }
}
