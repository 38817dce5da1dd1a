package graft

import graft.ops.Round11Ops5
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 5: rank statistics (Spearman / KS),
  * Benford first-digit audit, max drawdown, Herfindahl concentration,
  * Yule's K. Each test asserts a mathematical invariant of the
  * statistic, not a golden value — the exact numbers are pinned by
  * the DuckDB oracle.
  */
class Round11Spec2 extends AnyFunSuite with SparkFixture {

  test("spearman rho: in [-1,1] per flag, group sizes partition lineitem") {
    import spark.implicits._
    val rows = Round11Ops5.mlSpearmanRho(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(Array("A", "N", "R")))
    rows.foreach { case (_, n, rho) =>
      assert(n > 0 && rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9)
    }
    assert(rows.map(_._2).sum === Tables.lineitem(spark, sf).count())
  }

  test("ks test: D in [0,1], counts partition the two event types, argmax in range") {
    import spark.implicits._
    val Array((na, nb, at, d)) = Round11Ops5.mlKsTest(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    val counts = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase"))
      .groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    assert(na === counts("click") && nb === counts("purchase"))
    assert(d > 0.0 && d <= 1.0 && at >= 0.0)
  }

  test("benford: 9 digits, observed and expected shares each sum to ~1") {
    import spark.implicits._
    val rows = Round11Ops5.analyticBenfordDigits(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.map(_._1).sameElements(1 to 9))
    // Σ log10(1+1/d) telescopes to log10(10) = 1 exactly (pre-round)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-5)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-5)
    rows.foreach { case (_, _, s, e, dev) =>
      assert(math.abs(dev - math.abs(s - e)) < 1e-9)
    }
  }

  test("max drawdown: non-negative, bounded by total debits, non-degenerate") {
    import spark.implicits._
    val rows = Round11Ops5.tsMaxDrawdown(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, _, dd) => assert(n > 0 && dd >= 0.0) }
    // signed purchase/error mix ⇒ at least one user with a real trough
    assert(rows.exists(_._4 > 0.0))
    val debits = Tables.events(spark, sf)
      .filter($"event_type" === "error")
      .agg(sum(Tables.money($"value")).cast("double")).as[Double].head()
    assert(rows.map(_._4).max <= debits + 1e-6)
  }

  test("herfindahl: 1/n <= hhi <= 1, cr1 <= 1, cr1^2 <= hhi") {
    import spark.implicits._
    val rows = Round11Ops5.analyticHerfindahl(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    // only nations that HAVE suppliers appear (10 at sf0.001)
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { case (_, n, tot, hhi, cr1) =>
      assert(tot > 0 && n > 0)
      assert(hhi >= 1.0 / n - 1e-6 && hhi <= 1.0 + 1e-6)
      assert(cr1 >= 1.0 / n - 1e-6 && cr1 <= 1.0 + 1e-6)
      // the top supplier alone contributes cr1² to the share-square sum
      assert(hhi >= cr1 * cr1 - 1e-6)
    }
  }

  test("yule k: positive (repeated vocab), consistent with hapax-style counts") {
    import spark.implicits._
    val rows = Round11Ops5.textYuleK(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted.sameElements(Array("de", "en", "es", "fr", "zh")))
    rows.foreach { case (_, types, toks, k) =>
      assert(types <= toks)
      // Σf² ≥ N with equality iff every type is a hapax
      assert(k >= 0.0)
      // Σf² ≤ N² ⇒ K ≤ 10⁴·(N²−N)/N² < 10⁴
      assert(k < 10000.0)
    }
  }
}
