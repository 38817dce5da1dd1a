package graft

import graft.ops.Round11Ops6
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 6: agreement statistics, gain/lift,
  * A/B z-test, assortativity, Jensen-Shannon divergence, Theil-Sen.
  * Invariant tests; exact values pinned by the DuckDB oracle.
  */
class Round11Spec3 extends AnyFunSuite with SparkFixture {

  test("kappa/mcc: both in [-1,1], cells partition each event type") {
    import spark.implicits._
    val rows = Round11Ops6.mlKappaMcc(spark, sf)
      .as[(String, Long, Long, Long, Long, Double, Double)].collect()
    assert(rows.length === 5)
    val total = rows.map(r => r._2 + r._3 + r._4 + r._5).sum
    assert(total === Tables.events(spark, sf).count())
    rows.foreach { case (_, _, _, _, _, kappa, mcc) =>
      assert(kappa >= -1.0 - 1e-9 && kappa <= 1.0 + 1e-9)
      assert(mcc >= -1.0 - 1e-9 && mcc <= 1.0 + 1e-9)
    }
  }

  test("gain/lift: 10 deciles, gain monotone to 1.0, lift decile-1 >= decile-10") {
    import spark.implicits._
    val rows = Round11Ops6.mlGainLift(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).sameElements(1 to 10))
    val gains = rows.map(_._4)
    assert(gains.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-9))
    assert(math.abs(gains.last - 1.0) < 1e-6)
    // final decile's lift is exactly 1 (whole population)
    assert(math.abs(rows.last._5 - 1.0) < 1e-6)
  }

  test("abtest z-test: cohorts partition users, z finite, p in [0,1]") {
    import spark.implicits._
    val Array((na, nb, ca, cb, pa, pb, z)) = Round11Ops6
      .analyticAbtestZtest(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    assert(na + nb === Tables.events(spark, sf)
      .select($"user_id").distinct().count())
    assert(ca <= na && cb <= nb)
    assert(pa >= 0 && pa <= 1 && pb >= 0 && pb <= 1)
    assert(!z.isNaN && !z.isInfinite)
    // z sign agrees with the rate difference
    assert(math.signum(z) === math.signum(pa - pb) || pa == pb)
  }

  test("assortativity: in [-1,1], edge count doubled from undirected graph") {
    import spark.implicits._
    val Array((m, r)) = Round11Ops6.graphAssortativity(spark, sf)
      .as[(Long, Double)].collect()
    // directed list = each undirected edge both ways (thinnedGraph is
    // package-private; the doubling invariant shows as even parity)
    assert(m > 0 && m % 2 === 0)
    assert(r >= -1.0 - 1e-9 && r <= 1.0 + 1e-9)
  }

  test("js divergence: in [0,1] bits, shared <= total terms") {
    import spark.implicits._
    val Array((nTerms, nShared, jsd)) = Round11Ops6
      .textJsDivergence(spark, sf).as[(Long, Long, Double)].collect()
    assert(nShared <= nTerms && nTerms > 0)
    assert(jsd >= -1e-9 && jsd <= 1.0 + 1e-9)
  }

  test("theil-sen: pair counts are C(n,2) of the daily series, slopes finite") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Round11Ops6.tsTheilSen(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.length === 5)
    val days = Tables.events(spark, sf)
      .groupBy($"event_type", date_trunc("day", $"ts")).count()
      .groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (t, np, slope) =>
      val n = days(t)
      assert(np === n * (n - 1) / 2)
      assert(!slope.isNaN && !slope.isInfinite)
    }
  }
}
