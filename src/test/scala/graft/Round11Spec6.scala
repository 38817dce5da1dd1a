package graft

import graft.ops.Round11Ops9
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 9: SMA crossover, new/returning split,
  * Hampel filter, average precision, basket sizes, subsample CI. */
class Round11Spec6 extends AnyFunSuite with SparkFixture {

  test("sma crossover: directions alternate per event type") {
    import spark.implicits._
    val rows = Round11Ops9.tsSmaCrossover(spark, sf)
      .as[(String, Date, String)].collect()
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val dirs = xs.sortBy(_._2.getTime).map(_._3)
      // consecutive crossings of the same pair must flip direction
      assert(dirs.sliding(2).forall(w => w.length < 2 || w(0) != w(1)))
      dirs.foreach(d => assert(d == "golden" || d == "death"))
    }
  }

  test("new/returning: day-1 all new, total classifications = active pairs") {
    import spark.implicits._
    val rows = Round11Ops9.analyticNewReturning(spark, sf)
      .as[(Date, Long, Long)].collect().sortBy(_._1.getTime)
    assert(rows.head._3 === 0, "first day can have no returning users")
    val activePairs = Tables.events(spark, sf)
      .select($"user_id", to_date($"ts")).distinct().count()
    assert(rows.map(r => r._2 + r._3).sum === activePairs)
    // every user becomes new exactly once
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.map(_._2).sum === users)
  }

  test("hampel: flags a minority, counts partition the events table") {
    import spark.implicits._
    val rows = Round11Ops9.tsHampelFilter(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.events(spark, sf).count())
    rows.foreach { case (_, n, fl) => assert(fl >= 0 && fl < n / 2) }
  }

  test("average precision: in (0,1], >= random baseline sanity for uniform scores") {
    import spark.implicits._
    val rows = Round11Ops9.mlAveragePrecision(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.length === 5)
    rows.foreach { case (_, nPos, ap) =>
      assert(nPos > 0)
      assert(ap > 0.0 && ap <= 1.0)
    }
  }

  test("basket sizes: shares sum to ~1, cumulative monotone to 1") {
    import spark.implicits._
    val rows = Round11Ops9.analyticBasketSizeDist(spark, sf)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    val cums = rows.map(_._4)
    assert(cums.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-9))
    assert(math.abs(cums.last - 1.0) < 1e-6)
    assert(rows.map(_._2).sum === Tables.lineitem(spark, sf)
      .select($"l_orderkey").distinct().count())
  }

  test("subsample ci: 32 replicas, band ordered around the mean of means") {
    import spark.implicits._
    val rows = Round11Ops9.mlSubsampleCi(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.length === 5)
    rows.foreach { case (_, b, mom, lo, hi) =>
      assert(b === 32)
      assert(lo <= hi + 1e-9)
      assert(mom >= lo - 1e-6 && mom <= hi + 1e-6,
        s"mean of means $mom outside band [$lo,$hi]")
    }
  }
}
