package graft

import graft.ops.Round11Ops10
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 10: Bollinger bands, stickiness,
  * elasticity, WOE/IV, AES roundtrip, inter-arrival stats. */
class Round11Spec7 extends AnyFunSuite with SparkFixture {

  test("bollinger: breakouts bounded by full-frame day count") {
    import spark.implicits._
    val rows = Round11Ops10.tsBollingerBands(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, up, dn) =>
      assert(n > 0 && up >= 0 && dn >= 0 && up + dn <= n)
    }
  }

  test("stickiness: in (0,1], full weeks have 7 days") {
    import spark.implicits._
    val rows = Round11Ops10.analyticStickiness(spark, sf)
      .select($"event_type", $"n_days", $"wau", $"stickiness")
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nd, wau, st) =>
      assert(nd >= 1 && nd <= 7 && wau >= 1)
      assert(st > 0.0 && st <= 1.0)
    }
  }

  test("elasticity: one row per part type, slope finite") {
    import spark.implicits._
    val rows = Round11Ops10.analyticPriceElasticity(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.length === 6)
    rows.foreach { case (_, n, e) =>
      assert(n > 0); assert(!e.isNaN && !e.isInfinite)
    }
  }

  test("woe/iv: counts partition orders, woe signs net out") {
    import spark.implicits._
    val rows = Round11Ops10.mlWoeIv(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.length === 5)
    val total = rows.map(r => r._2 + r._3).sum
    assert(total === Tables.orders(spark, sf).count())
    // iv terms are non-negative by construction (gap and woe share sign)
    rows.foreach { case (_, _, _, _, iv) => assert(iv >= -1e-9) }
  }

  test("aes roundtrip: decrypt(encrypt(x)) == x, padded length") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", length($"text").as("len"))
      .as[(Long, String, Int)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val rows = Round11Ops10.fnAesRoundtrip(spark, sf)
      .as[(Long, String, Long)].collect()
    assert(rows.length === docs.size)
    rows.foreach { case (id, rt, cb) =>
      val (orig, len) = docs(id)
      assert(rt === orig)
      assert(cb === 16L * (len / 16 + 1))
    }
  }

  test("interarrival: gaps positive-or-zero, percentiles ordered") {
    import spark.implicits._
    val rows = Round11Ops10.tsInterarrival(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).toSet.subsetOf(
      Set("signup", "click", "error", "view", "purchase")))
    rows.foreach { case (_, n, mn, mx, mean, p50, p90) =>
      assert(n > 0 && mn >= 0 && mn <= p50 && p50 <= p90 && p90 <= mx)
      assert(mean >= mn && mean <= mx)
    }
  }
}
