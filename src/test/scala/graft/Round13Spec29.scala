package graft

import graft.ops.Round13Ops29
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 29: multi-mode tie semantics, SRM design check,
  * rolling-slope sanity vs a driver refit.
  */
class Round13Spec29 extends AnyFunSuite with SparkFixture {

  test("multi mode: every listed mode has the max count, array sorted") {
    import spark.implicits._
    val rows = Round13Ops29.aggMultiMode(spark, sf)
      .as[(String, Long, String, Long)].collect()
    assert(rows.length === 5)
    rows.foreach { case (p, mc, modesStr, nm) =>
      val modes = modesStr.split(",").map(_.toInt).toSeq
      assert(modes.nonEmpty && modes.length === nm)
      assert(modes.sorted == modes, s"$p: modes not sorted")
      assert(mc > 0)
    }
  }

  test("srm: arms partition distinct users, chi2 consistent with terms") {
    import spark.implicits._
    val rows = Round13Ops29.analyticSrmCheck(spark, sf)
      .as[(Int, Long, Double, Double, Double, Boolean)].collect()
    assert(rows.length === 2)
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_._2).sum === users)
    val chi2 = rows.head._5
    assert(math.abs(rows.map(_._4).sum - chi2) < 1e-5)
    assert(rows.forall(_._6 == (chi2 > 3.841)))
  }

  test("rolling slope: matches a driver-side least-squares refit on one frame") {
    import spark.implicits._
    val rows = Round13Ops29.winRollingSlope(spark, sf)
      .as[(String, java.sql.Date, Long, Double)].collect()
    assert(rows.nonEmpty)
    val et = rows.head._1
    val daily = Tables.events(spark, sf).filter($"event_type" === et)
      .groupBy(to_date($"ts").as("d")).agg(count(lit(1)).as("c"))
      .as[(java.sql.Date, Long)].collect().sortBy(_._1.getTime)
    val probe = rows.filter(_._1 == et).last
    val idx = daily.indexWhere(_._1 == probe._2)
    val frame = daily.slice(idx - 13, idx + 1)
    assert(frame.length === 14)
    val xs = frame.map(r => (r._1.toLocalDate.toEpochDay -
      java.time.LocalDate.parse("1995-01-01").toEpochDay).toDouble)
    val ys = frame.map(_._2.toDouble)
    val n = 14.0
    val slope = (xs.zip(ys).map(p => p._1 * p._2).sum -
      xs.sum * ys.sum / n) / (xs.map(x => x * x).sum - xs.sum * xs.sum / n)
    assert(math.abs(probe._4 - slope) < 1e-4,
      s"$et ${probe._2}: ${probe._4} vs $slope")
  }
}
