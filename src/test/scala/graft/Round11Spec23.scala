package graft

import graft.ops.Round11Ops26
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 26: split-part idioms, session variables,
  * diff-in-diff, trimmed mean, TVF inline, pinball loss. */
class Round11Spec23 extends AnyFunSuite with SparkFixture {

  test("split part: idioms agree on the first token") {
    import spark.implicits._
    val rows = Round11Ops26.fnSplitPart(spark, sf)
      .as[(Long, String, String, String, String, String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, name, head, tail, first, last, firstTwo) =>
      assert(head === first)
      assert(name.startsWith(firstTwo))
      assert(name.endsWith(last))
      if (tail != null) assert(name === s"$head $tail")
    }
  }

  test("session variables: filter matches the literal query") {
    import spark.implicits._
    val rows = Round11Ops26.sqlSessionVariables(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_._1 == "BUILDING"))
    val expected = Tables.customer(spark, sf)
      .filter($"c_acctbal" >= 1000.0 && $"c_mktsegment" =!= "BUILDING").count()
    assert(rows.map(_._2).sum === expected)
  }

  test("diff-in-diff: four cells, DiD consistent with the cell means") {
    import spark.implicits._
    val rows = Round11Ops26.analyticDiffInDiff(spark, sf)
      .as[(String, String, Long, Double, Double)].collect()
    assert(rows.length === 4)
    val m = rows.map(r => (r._1, r._2) -> r._4).toMap
    val did = (m(("treated", "after")) - m(("treated", "before"))) -
      (m(("control", "after")) - m(("control", "before")))
    rows.foreach { case (_, _, n, _, d) =>
      assert(n > 0)
      assert(math.abs(d - did) < 1e-3)
    }
  }

  test("trimmed mean: lies within the untrimmed range, drops 2 deciles") {
    import spark.implicits._
    val rows = Round11Ops26.aggTrimmedMean(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val counts = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (rf, kept, tm) =>
      val n = counts(rf)
      assert(kept === n - 2 * (n / 10))
      assert(tm > 0)
    }
  }

  test("tvf inline: bands partition all orders") {
    import spark.implicits._
    val rows = Round11Ops26.sqlTvfInline(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._1).toSet.subsetOf(Set("low", "mid", "high")))
    assert(rows.map(_._2).sum === Tables.orders(spark, sf).count())
  }

  test("pinball loss: q=0.5 is half the MAE, both non-negative") {
    import spark.implicits._
    val rows = Round11Ops26.mlPinballLoss(spark, sf)
      .as[(String, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, q, n, l) =>
      assert(Set(0.5, 0.9).contains(q))
      assert(n > 0 && l >= 0)
    }
    // pinball at the median weight equals MAE/2 by construction
    val mae = graft.ops.Round11Ops20.tsSeasonalNaiveError(spark, sf)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    rows.filter(_._2 == 0.5).foreach { case (et, _, _, l) =>
      assert(math.abs(l - mae(et) / 2) < 1e-3)
    }
  }
}
