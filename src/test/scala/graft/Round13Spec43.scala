package graft

import graft.ops.Round13Ops43
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 43: SPRT walk monotonic accumulation, decay-score
  * ordering.
  */
class Round13Spec43 extends AnyFunSuite with SparkFixture {

  test("sprt: walk accumulates day terms, decisions match boundaries") {
    import spark.implicits._
    val rows = Round13Ops43.analyticSprtConversion(spark, sf)
      .as[(java.sql.Date, Long, Long, Double, String)].collect()
    assert(rows.nonEmpty)
    val a = math.log(19.0)
    rows.foreach { case (_, n, x, llr, dec) =>
      assert(x <= n)
      val expected = if (llr >= a) "accept_h1"
        else if (llr <= -a) "accept_h0" else "continue"
      assert(dec === expected, s"decision $dec vs llr $llr")
    }
    // purchase share ~0.20 sits between hypotheses: the walk should
    // not explode to absurd magnitudes in 30 days
    assert(rows.map(_._4).forall(v => math.abs(v) < 1e6))
  }

  test("decay score: descending ranks, bounded by undecayed spend") {
    import spark.implicits._
    val rows = Round13Ops43.analyticRecencyDecayScore(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.length === math.min(20L, nUsers).toInt)
    assert(rows.map(_._1).toSeq === (1L to rows.length))
    assert(rows.sliding(2).forall(p => p(0)._4 >= p(1)._4),
      "scores must be non-increasing down the ranking")
    // a user's decayed score can never exceed their raw cents total
    val totals = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.sum(
        (Tables.money($"value") * 100)
          .cast(org.apache.spark.sql.types.LongType)).as("tot"))
      .as[(Long, Long)].collect().toMap
    rows.foreach { case (_, uid, _, sc) =>
      assert(sc <= totals(uid) + 1e-6, s"user $uid decayed $sc > raw")
    }
  }
}
