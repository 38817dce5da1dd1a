package graft

import graft.ops.Round10Ops7
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 7: AQE coalescing, char entropy, basket lift,
  * k-anonymity, rolling median, isotonic regression.
  */
class Round10Spec7 extends AnyFunSuite with SparkFixture {

  test("aqe coalesce: result matches a direct aggregate; selective filter keeps rows") {
    import spark.implicits._
    val got = Round10Ops7.scaleAqeCoalesce(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.nonEmpty)
    val direct = Tables.orders(spark, sf)
      .filter($"o_totalprice" > 490000.0).count()
    assert(got.map(_._2).sum === direct)
    // the filter really is selective (the point of the coalesce demo)
    assert(direct.toDouble / Tables.orders(spark, sf).count() < 0.1)
  }

  test("char entropy: bounded by log of alphabet, uniform-ish docs score high") {
    import spark.implicits._
    val rows = Round10Ops7.textCharEntropy(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { case (_, n, h) =>
      assert(h >= 0 && n > 0)
      assert(h <= math.log(n.toDouble) + 1e-6,
        "entropy cannot exceed ln(n)")
    }
    // natural text over a ~27-char alphabet: entropy well above 1 nat
    assert(rows.map(_._3).min > 1.0)
  }

  test("basket lift: lift formula reproduces from raw counts") {
    import spark.implicits._
    val rows = Round10Ops7.analyticBasketLift(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val n = Tables.orders(spark, sf).select($"o_orderkey").distinct().count()
    val b = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey", $"p_brand").distinct()
    val singles = b.groupBy($"p_brand").count()
      .as[(String, Long)].collect().toMap
    rows.take(5).foreach { case (a, bb, cab, lift) =>
      val expected = n.toDouble * cab / (singles(a).toDouble * singles(bb))
      assert(math.abs(lift - math.rint(expected * 1e6) / 1e6) < 1e-9)
      assert(cab >= 10)
    }
    assert(rows.map(_._4).sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
  }

  test("k-anonymity: class sizes partition the customer table") {
    import spark.implicits._
    val rows = Round10Ops7.pipelineKanonymity(spark, sf)
      .as[(Int, String, Long, Boolean, Double)].collect()
    assert(rows.map(_._3).sum === Tables.customer(spark, sf).count())
    rows.foreach { case (_, _, sz, k5, risk) =>
      assert(k5 === (sz >= 5))
      assert(math.abs(risk - math.rint(1.0 / sz * 1e6) / 1e6) < 1e-9)
    }
  }

  test("rolling median: first row of each type equals its own value") {
    import spark.implicits._
    val med = Round10Ops7.winRollingMedian(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(med.length === Tables.events(spark, sf).count())
    // per type, the first event's 1-element frame median = its value
    val firsts = Tables.events(spark, sf)
      .select($"event_type", $"ts", $"event_id",
        Tables.money($"value").cast("double").as("v"))
      .as[(String, java.time.LocalDateTime, Long, Double)].collect()
      .groupBy(_._1).map { case (t, evs) =>
        val f = evs.minBy(e => (e._2, e._3))
        (t, f._3) -> f._4
      }
    val medMap = med.map { case (t, id, m) => (t, id) -> m }.toMap
    firsts.foreach { case (k, v) =>
      assert(math.abs(medMap(k) - math.rint(v * 1e6) / 1e6) < 1e-9,
        s"first event of ${k._1}")
    }
  }

  test("isotonic: deterministic and monotone in the feature") {
    import spark.implicits._
    val a = Round10Ops7.mlIsotonicRegression(spark, sf)
      .as[(Long, Double, Double)].collect()
    assert(a.nonEmpty)
    val byX = a.sortBy(_._2)
    byX.map(_._3).sliding(2).foreach { w =>
      if (w.length == 2)
        assert(w(0) <= w(1) + 1e-9, "predictions must be non-decreasing in x")
    }
    val b = Round10Ops7.mlIsotonicRegression(spark, sf)
      .as[(Long, Double, Double)].collect()
    assert(a.toSeq === b.toSeq)
  }
}
