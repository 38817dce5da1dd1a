package graft

import graft.ops.Round13Ops18
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 18: WMA bounds vs the window min/max, power-analysis
  * monotonicity, coverage-curve monotonicity.
  */
class Round13Spec18 extends AnyFunSuite with SparkFixture {

  test("wma: stays within the 7-day min/max envelope") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wma = Round13Ops18.tsWmaTriangular(spark, sf)
      .as[(String, java.sql.Date, Double)].collect()
    assert(wma.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.map(r => r._2.toLocalDate -> r._3).toMap }
    wma.foreach { case (t, d, v) =>
      val m = daily(t)
      val win = (0 to 6).flatMap(k => m.get(d.toLocalDate.minusDays(k)))
      assert(win.size === 7)
      assert(v >= win.min - 1e-6 && v <= win.max + 1e-6,
        s"$t $d: wma $v outside [${win.min}, ${win.max}]")
    }
  }

  test("power analysis: smaller variance-to-mean means fewer samples") {
    import spark.implicits._
    val rows = Round13Ops18.analyticSampleSizePower(spark, sf)
      .as[(String, Long, Double, Double, Long)].collect()
    assert(rows.length === 5)
    rows.foreach { case (seg, n, mean, sd, req) =>
      assert(mean > 0 && sd > 0 && req > 0, s"$seg degenerate")
      // closed form: req ≈ 2 * 2.801585² * (sd/(0.01·mean))²
      val cv = sd / (0.01 * mean)
      val expect = 2.0 * 2.801585 * 2.801585 * cv * cv
      assert(math.abs(req - math.ceil(expect)) <= 1,
        s"$seg: $req vs ${math.ceil(expect)}")
    }
  }

  test("vocab coverage: monotone in K, bounded by 1, covered <= total") {
    import spark.implicits._
    val rows = Round13Ops18.textVocabCoverage(spark, sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(100L, 1000L, 4000L))
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "coverage must grow with vocabulary size")
    rows.foreach(r => assert(r._4 > 0.0 && r._4 <= 1.0))
  }
}
