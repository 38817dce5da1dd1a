package graft

import graft.ops.Round11Ops18
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 18: ship-lag profile, market share,
  * mutual information, DFT power, dedup threshold sweep, batch kNN. */
class Round11Spec15 extends AnyFunSuite with SparkFixture {

  test("ship lag: bounds ordered, shares in [0,1], counts reconcile") {
    import spark.implicits._
    val rows = Round11Ops18.analyticShipLag(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, lo, hi, avg, fs) =>
      assert(n > 0 && lo <= hi)
      assert(avg >= lo && avg <= hi)
      assert(fs >= 0.0 && fs <= 1.0)
    }
    assert(rows.map(_._2).sum === Tables.lineitem(spark, sf).count())
  }

  test("market share: shares sum to 1 within each region-year") {
    import spark.implicits._
    val rows = Round11Ops18.analyticMarketShare(spark, sf)
      .as[(String, Int, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, g) =>
      val s = g.map(_._5).sum
      assert(math.abs(s - 1.0) < 1e-4, s"shares sum to $s")
    }
  }

  test("mutual information: cells reconcile to margins, MI >= 0") {
    import spark.implicits._
    val rows = Round11Ops18.mlMutualInfo(spark, sf)
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val n = Tables.orders(spark, sf).count()
    assert(rows.map(_._3).sum === n)
    // per-x margins: sum of that x's cells equals the reported n_x
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._3).sum === g.head._4)
    }
    // total MI (sum of terms) is non-negative up to rounding slack
    assert(rows.map(_._7).sum >= -1e-4)
  }

  test("DFT power: power equals re^2+im^2, k=1..3 per event type") {
    import spark.implicits._
    val rows = Round11Ops18.tsDftPower(spark, sf)
      .as[(String, Int, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted === Seq(1, 2, 3))
    }
    rows.foreach { case (_, _, nd, re, im, p) =>
      assert(nd > 0)
      assert(math.abs(p - (re * re + im * im)) <= 1e-4 + 1e-9 * math.abs(p))
    }
  }

  test("threshold sweep: counts monotone non-increasing in threshold") {
    import spark.implicits._
    val rows = Round11Ops18.dedupThresholdSweep(spark, sf)
      .as[(Int, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(50, 60, 70, 80, 90))
    val counts = rows.sortBy(_._1).map(_._2)
    counts.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1))
    }
    assert(counts.head > 0, "some pairs at jaccard >= 0.5")
    // the 80% count matches dedup_near_jaccard's pair count
    val nj = graft.ops.LlmOps.dedupNearJaccard(spark, sf).count()
    assert(counts(3) === nj)
  }

  test("batch kNN: 10 ranked neighbors per probe, descending cosine") {
    import spark.implicits._
    val rows = Round11Ops18.simKnnBatch(spark, sf)
      .as[(Long, Int, Long, Double)].collect()
    val probes = rows.map(_._1).distinct.sorted
    assert(probes.toSeq === (0L until 8L))
    rows.groupBy(_._1).foreach { case (pid, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to 10))
      sorted.map(_._4).sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) >= w(1) - 1e-9)
      }
      assert(!sorted.exists(_._3 == pid), "probe must not match itself")
    }
  }
}
