package graft

import graft.ops.Aggregates
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error bounds for the sketch aggregates (the oracle-less §2d ops). */
class AggregatesSpec extends AnyFunSuite with SparkFixture {

  test("HLL distinct estimate is within 20% of exact per event_type") {
    import spark.implicits._
    val rows = Aggregates.aggApproxCountDistinct(spark, sf)
      .select($"event_type", $"approx_users", $"exact_users")
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, approx, exact) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.2,
        s"$t: approx $approx vs exact $exact")
    }
  }

  test("approx quantiles land within 2% of the exact percentiles") {
    import spark.implicits._
    val approx = Aggregates.aggApproxQuantiles(spark, sf)
      .select($"o_orderstatus", $"approx_p50", $"approx_p90")
      .as[(String, Double, Double)].collect()
      .map { case (st, a50, a90) => st -> Seq(a50, a90) }.toMap
    val exact = Aggregates.aggPercentiles(spark, sf)
      .select($"o_orderstatus", $"median_price", $"p90_price")
      .as[(String, Double, Double)].collect()
    exact.foreach { case (st, p50, p90) =>
      val Seq(a50, a90) = approx(st).toList
      assert(math.abs(a50 - p50) / p50 <= 0.02, s"$st p50: $a50 vs $p50")
      assert(math.abs(a90 - p90) / p90 <= 0.02, s"$st p90: $a90 vs $p90")
    }
  }

  test("HLL sketch estimates (per-type + merged union) within 20% of exact") {
    import spark.implicits._
    val est = graft.ops.Round3Ops.aggHllSketch(spark, sf)
      .as[(String, Long)].collect().toMap
    val exactPerType = graft.Tables.events(spark, sf)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val exactAll = graft.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    (exactPerType + ("ALL" -> exactAll)).foreach { case (t, exact) =>
      val approx = est(t)
      assert(math.abs(approx - exact).toDouble / exact <= 0.2,
        s"$t: sketch $approx vs exact $exact")
    }
  }

  test("count-min sketch estimates within eps*N of exact type frequencies") {
    import spark.implicits._
    val est = graft.ops.Round3Ops.aggCountMinSketch(spark, sf)
      .as[(String, Long)].collect().toMap
    val exact = graft.Tables.events(spark, sf)
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    val n = exact.values.sum
    exact.foreach { case (t, ex) =>
      val ap = est(t)
      // CMS overestimates by at most eps*N with prob >= confidence
      assert(ap >= ex && ap <= ex + math.max(1, (0.001 * n).toLong * 10),
        s"$t: cms $ap vs exact $ex (N=$n)")
    }
  }
}
