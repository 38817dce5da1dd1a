package graft

import graft.ops.Round11Ops8
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Round-11 widening, part 8: alert windows (+ streaming twin),
  * cache reuse, neighborhood Jaccard, one-hot / target encoding,
  * outer explode. */
class Round11Spec5 extends AnyFunSuite with SparkFixture {

  test("alert windows: only value >= 400 events counted, max within threshold") {
    import spark.implicits._
    val rows = Round11Ops8.streamAlertWindows(spark, sf)
      .as[(Timestamp, String, Long, Double)].collect()
    val expected = Tables.events(spark, sf)
      .filter(Tables.money($"value") >= 400).count()
    assert(rows.map(_._3).sum === expected)
    rows.foreach { case (_, _, n, mx) => assert(n > 0 && mx >= 400.0) }
  }

  test("alert windows stream twin: watermarked append emits closed windows only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val ms = MemoryStream[Ev]
    val q = Round11Ops8.alertWindowsStream(ms.toDF())
      .select($"window.start".as("ws"), $"event_type", $"n_alerts")
      .writeStream.format("memory").queryName("alerts")
      .outputMode("append").start()
    try {
      ms.addData(
        Ev(1, ts("2024-01-01 00:05:00"), 1, "error", 450.0),
        Ev(2, ts("2024-01-01 00:07:00"), 2, "error", 410.0),
        Ev(3, ts("2024-01-01 00:08:00"), 1, "error", 10.0)) // below threshold
      q.processAllAvailable()
      // advance watermark past window [00:00,00:15) + 10 min
      ms.addData(Ev(4, ts("2024-01-01 00:40:00"), 1, "error", 500.0))
      q.processAllAvailable()
      val got = spark.table("alerts").as[(Timestamp, String, Long)].collect()
      assert(got.toSet === Set((ts("2024-01-01 00:00:00"), "error", 2L)),
        s"closed 15-min window must hold the 2 above-threshold alerts, got ${got.toSet}")
    } finally q.stop()
  }

  test("cache reuse: 3 top + 3 bottom bands, disjoint, top >= bottom") {
    import spark.implicits._
    val rows = Round11Ops8.scaleCacheReuse(spark, sf)
      .as[(String, String, Double)].collect()
    val (top, bottom) = rows.partition(_._1 == "top")
    assert(top.length === 3 && bottom.length === 3)
    assert(top.map(_._2).toSet.intersect(bottom.map(_._2).toSet).isEmpty)
    assert(top.map(_._3).min >= bottom.map(_._3).max)
  }

  test("jaccard neighbors: in [0,1], common <= union, covers every edge") {
    import spark.implicits._
    val rows = Round11Ops8.graphJaccardNeighbors(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (u, v, cn, un, j) =>
      assert(u < v && cn >= 0 && cn <= un + cn)
      assert(j >= 0.0 && j <= 1.0 + 1e-9)
      if (un > 0) assert(math.abs(j - cn.toDouble / un) < 1e-5)
    }
  }

  test("one-hot features: counts partition each user's events, spend only purchases") {
    import spark.implicits._
    val rows = Round11Ops8.mlOneHotFeatures(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
    val total = Tables.events(spark, sf).count()
    assert(rows.map(r => r._2 + r._3 + r._4 + r._5 + r._6).sum === total)
    rows.foreach { case (_, _, _, _, _, nPurch, spend) =>
      if (nPurch == 0) assert(spend === 0.0) else assert(spend > 0.0)
    }
  }

  test("target encode: enc between category rate and global rate (shrinkage)") {
    import spark.implicits._
    val rows = Round11Ops8.mlTargetEncode(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length === 5)
    val ng = rows.map(_._2).sum
    val pg = rows.map(_._3).sum.toDouble / ng
    rows.foreach { case (_, n, pos, enc) =>
      val raw = pos.toDouble / n
      val (lo, hi) = (math.min(raw, pg), math.max(raw, pg))
      assert(enc >= lo - 1e-6 && enc <= hi + 1e-6,
        s"m-estimate must shrink toward the global rate: $enc not in [$lo,$hi]")
    }
  }

  test("explode outer: every doc survives; without + with-match counts partition") {
    import spark.implicits._
    val rows = Round11Ops8.fnExplodeOuter(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_._2).sum === docs.count())
    // at least one doc lacks a q-token (the outer contract is exercised)
    assert(rows.map(_._4).sum > 0)
  }
}
