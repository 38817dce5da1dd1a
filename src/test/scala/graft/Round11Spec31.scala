package graft

import graft.ops.Round11Ops34
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 34: nested roundtrip, price waterfall,
  * partition file stats, width_bucket, bbox IoU. */
class Round11Spec31 extends AnyFunSuite with SparkFixture {

  test("nested roundtrip: exploded children equal the flat join") {
    import spark.implicits._
    val rows = Round11Ops34.sourceNestedRoundtrip(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        $"l_orderkey" === $"o_orderkey", "left_semi").count())
  }

  test("price waterfall: charged = gross - discount + tax exactly") {
    import spark.implicits._
    val rows = Round11Ops34.analyticPriceWaterfall(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, g, d, t, c) =>
      assert(c === g - d + t)
      assert(g > 0 && d >= 0 && t >= 0)
    }
  }

  test("partition file stats: one file per partition directory") {
    import spark.implicits._
    val rows = Round11Ops34.pipelinePartitionFileStats(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nf, _) => assert(nf === 1) }
    assert(rows.map(_._3).sum === Tables.events(spark, sf).count())
  }

  test("width_bucket: under/overflow buckets clamp, counts reconcile") {
    import spark.implicits._
    val rows = Round11Ops34.fnWidthBucket(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.orders(spark, sf).count())
    rows.foreach { case (b, _, lo, hi) =>
      assert(b >= 0 && b <= 7)
      assert(lo <= hi)
      if (b >= 1 && b <= 6) {
        assert(lo >= 5000000L + (b - 1) * 5000000L)
        assert(hi < 5000000L + b.toLong * 5000000L)
      }
    }
  }

  test("bbox IoU: bands partition all same-frame pairs") {
    import spark.implicits._
    val rows = Round11Ops34.multimodalBboxIou(spark, sf)
      .as[(String, Long)].collect()
    assert(rows.nonEmpty)
    // round 14: the frame (blocking key) is (day, user) — per-DAY
    // populations grow with the corpus and made the census quadratic
    val perFrame = Tables.events(spark, sf)
      .filter($"event_type" === "error")
      .groupBy(to_date($"ts"), $"user_id").count()
      .select($"count").as[Long].collect()
    val expectedPairs = perFrame.map(n => n * (n - 1) / 2).sum
    assert(rows.map(_._2).sum === expectedPairs)
    assert(rows.map(_._1).toSet.subsetOf(
      Set("disjoint", "overlap_30plus", "touch_under_30")))
  }
}
