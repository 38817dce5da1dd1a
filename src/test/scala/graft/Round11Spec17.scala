package graft

import graft.ops.Round11Ops20
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 20: Holt smoothing, cross-source overlap,
  * embedding stats, pair alignment, partition-path read, seasonal
  * naive backtest. */
class Round11Spec17 extends AnyFunSuite with SparkFixture {

  test("holt linear: level near series scale, forecast = level + 7*trend") {
    import spark.implicits._
    val rows = Round11Ops20.tsHoltLinear(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, nd, l, b, f) =>
      assert(nd > 10)
      assert(l > 0, s"$et level positive for a count series")
      assert(math.abs(f - (l + 7.0 * b)) < 1e-4)
    }
  }

  test("cross-source overlap: symmetric-free pairs, jaccard in [0,1]") {
    import spark.implicits._
    val rows = Round11Ops20.pipelineCrossSourceOverlap(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    val nSrc = Tables.documents(spark, sf).select($"source").distinct().count()
    assert(rows.length === nSrc * (nSrc - 1) / 2, "every unordered pair")
    rows.foreach { case (a, b, sh, na, nb, j) =>
      assert(a < b)
      assert(sh <= math.min(na, nb))
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("embedding stats: counts reconcile, min <= avg <= max") {
    import spark.implicits._
    val rows = Round11Ops20.simEmbeddingStats(spark, sf)
      .as[(Int, Long, Long, Double, Double, Double)].collect()
    assert(rows.map(_._2).sum === Tables.embeddings(spark, sf).count())
    rows.foreach { case (_, n, nz, lo, hi, avg) =>
      assert(nz >= 0 && nz <= n)
      assert(lo <= avg + 1e-6 && avg <= hi + 1e-6)
    }
  }

  test("pair align: coverage matches the 1-in-7 thinning") {
    import spark.implicits._
    val rows = Round11Ops20.multimodalPairAlign(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_._2).sum
    val totalAligned = rows.map(_._3).sum
    assert(totalDocs === Tables.documents(spark, sf).count())
    val expected = Tables.embeddings(spark, sf)
      .filter(pmod($"vec_id", lit(7)) =!= 0).count()
    assert(totalAligned === expected)
    rows.foreach { case (_, nd, na, cov, nrm) =>
      assert(na <= nd && cov <= 1.0 && nrm > 0)
    }
  }

  test("path glob: only the purchase partition subtree is read") {
    import spark.implicits._
    val rows = Round11Ops20.sourcePathGlob(spark, sf)
      .as[(String, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._1 === "purchase"))
    val expected = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(rows.map(_._3).sum === expected)
  }

  test("seasonal naive: non-negative errors, scored rows = days - 7") {
    import spark.implicits._
    val rows = Round11Ops20.tsSeasonalNaiveError(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val dayCounts = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts")).count()
      .groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    rows.foreach { case (et, n, mae, mape) =>
      assert(mae >= 0 && mape >= 0)
      // every lagged row scores unless prev7 was 0 (counts are >= 1)
      assert(n === dayCounts(et) - 7)
    }
  }
}
