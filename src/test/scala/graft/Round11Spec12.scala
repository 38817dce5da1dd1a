package graft

import graft.ops.Round11Ops15
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 15: HITS, key gaps, XPath, WoW aligned,
  * window energy, repeat purchases. */
class Round11Spec12 extends AnyFunSuite with SparkFixture {

  test("hits: 20 hubs + 20 authorities, scores positive digit strings") {
    import spark.implicits._
    val rows = Round11Ops15.graphHitsScores(spark, sf)
      .as[(Long, String, String)].collect()
    val byRole = rows.groupBy(_._2)
    assert(byRole("hub").length === 20)
    assert(byRole("authority").length === 20)
    rows.foreach { case (_, _, s) =>
      assert(s.matches("[0-9]+") && BigInt(s) > 0)
    }
  }

  test("key gap audit: per-bucket missing counts reconcile with the span") {
    import spark.implicits._
    val rows = Round11Ops15.pipelineKeyGapAudit(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, exp, miss) =>
      assert(miss === exp - n && miss >= 0 && n >= 1)
    }
    // when every bucket in the span is nonempty, missing totals close
    val keys = Tables.orders(spark, sf).select($"o_orderkey")
      .as[Long].collect().sorted
    val span = keys.last - keys.head + 1
    val buckets = keys.map(_ / 4096).distinct.length
    if (buckets == (keys.last / 4096 - keys.head / 4096 + 1)) {
      assert(rows.map(_._4).sum === span - keys.length)
    }
  }

  test("xpath: roundtrip aggregation matches direct computation") {
    import spark.implicits._
    val rows = Round11Ops15.fnXpath(spark, sf)
      .as[(String, Long, Long)].collect()
    // fnXpath processes the deterministic 1-in-4 orderkey slice
    // (pmod(o_orderkey,4)=0, mirrored in the oracle) — sum against it
    import org.apache.spark.sql.functions.pmod
    val sliced = Tables.orders(spark, sf)
      .filter(pmod($"o_orderkey", lit(4)) === 0).count()
    assert(rows.map(_._2).sum === sliced)
    assert(rows.length === 5)
  }

  test("wow aligned: join is exactly 7 days, pct consistent") {
    import spark.implicits._
    val rows = Round11Ops15.tsWowAligned(spark, sf)
      .as[(String, Date, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, cur, prev, pct) =>
      assert(prev > 0)
      assert(math.abs(pct - (cur - prev).toDouble / prev) < 1e-5)
    }
  }

  test("window energy: ASCII payload bounds energy per 128-byte window") {
    import spark.implicits._
    val rows = Round11Ops15.multimodalWindowEnergy(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nw, wid, e) =>
      assert(wid >= 0 && wid < nw)
      // 128 bytes of printable ASCII: between 128*32 and 128*127
      assert(e >= 128L * 32 && e <= 128L * 127)
    }
  }

  test("repeat purchase: quartiles ordered, users bounded by purchasers") {
    import spark.implicits._
    val (n, p25, p50, p75, mx) = Round11Ops15.analyticRepeatPurchase(spark, sf)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(n > 0)
    assert(p25 <= p50 && p50 <= p75 && p75 <= mx)
    val purchasers = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id").distinct().count()
    assert(n <= purchasers)
  }
}
