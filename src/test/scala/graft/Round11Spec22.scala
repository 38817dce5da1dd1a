package graft

import graft.ops.Round11Ops25
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 25: mix entropy, rare-category collapse,
  * additive decomposition, multiline JSON, CTAS/INSERT, conversion
  * lag. */
class Round11Spec22 extends AnyFunSuite with SparkFixture {

  test("mix entropy: bounded by ln(k), non-negative") {
    import spark.implicits._
    val rows = Round11Ops25.tsMixEntropy(spark, sf)
      .as[(Date, Long, Double)].collect()
    assert(rows.nonEmpty)
    val k = Tables.events(spark, sf)
      .select($"event_type").distinct().count()
    rows.foreach { case (_, n, h) =>
      assert(n > 0)
      assert(h >= -1e-6 && h <= math.log(k.toDouble) + 1e-6)
    }
  }

  test("rare collapse: every part encoded, OTHER holds the tail") {
    import spark.implicits._
    val rows = Round11Ops25.mlRareCategoryCollapse(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.part(spark, sf).count())
    rows.filterNot(_._1 == "OTHER").foreach { case (_, _, nb) =>
      assert(nb === 1, "kept categories map one-to-one")
    }
    val other = rows.filter(_._1 == "OTHER")
    assert(other.length === 1 && other.head._3 > 1,
      "below-mean tail actually collapses")
  }

  test("decomposition: trend+seasonal+residual reassembles the series") {
    import spark.implicits._
    val rows = Round11Ops25.tsDecomposeAdditive(spark, sf)
      .as[(Date, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, c, tr, se, re) =>
      assert(math.abs(c.toDouble - (tr + se + re)) < 1e-3)
    }
    // seasonal component is mean-centered up to rounding
    val seasonalMean = rows.map(_._4).sum / rows.length
    assert(math.abs(seasonalMean) < 1.0)
  }

  test("multiline json: slice content round-trips through one document") {
    import spark.implicits._
    val rows = Round11Ops25.sourceJsonMultiline(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val expected = Tables.events(spark, sf)
      .filter(pmod($"event_id", lit(100)) === 0).count()
    assert(rows.map(_._2).sum === expected)
  }

  test("ctas+insert: both halves land in the managed table") {
    import spark.implicits._
    val rows = Round11Ops25.sqlCtasInsert(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.orders(spark, sf).count())
    rows.foreach { case (_, n, s) => assert(n > 0 && s > 0) }
  }

  test("conversion lag: bands partition converters, all non-negative") {
    import spark.implicits._
    val rows = Round11Ops25.analyticConversionLag(spark, sf)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val bands = Set(0L, 1L, 2L, 4L, 8L, 16L, 32L)
    rows.foreach { case (b, n) =>
      assert(bands.contains(b) && n > 0)
    }
  }
}
