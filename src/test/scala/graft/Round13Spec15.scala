package graft

import graft.ops.Round13Ops15
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Round-13 part 15: incremental rate limiter vs the batch oracle
  * semantics, waterfall coalesce precedence, medallion conservation.
  */
class Round13Spec15 extends AnyFunSuite with SparkFixture {

  private def t(s: String) = Timestamp.valueOf(s)

  test("rate limiter stream: 4th event in the hour denied, next hour resets") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[Ev]
    val q = Round13Ops15.rateLimitStream(spark, ms.toDF())
      .writeStream.format("memory").queryName("ratelim")
      .outputMode("append").start()
    try {
      // five events for user 1 in hour 0, then one in hour 1
      ms.addData(Ev(1, t("2024-01-01 00:01:00"), 1, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(2, t("2024-01-01 00:02:00"), 1, "click", 1.0),
        Ev(3, t("2024-01-01 00:03:00"), 1, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(4, t("2024-01-01 00:04:00"), 1, "click", 1.0),
        Ev(5, t("2024-01-01 00:05:00"), 1, "click", 1.0))
      q.processAllAvailable()
      ms.addData(Ev(6, t("2024-01-01 01:04:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("ratelim")
        .as[(Long, Long, Boolean)].collect().sortBy(_._2)
      assert(got.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
      assert(got.map(_._3).toSeq ===
        Seq(true, true, true, false, false, true),
        "first three admitted, 4th/5th throttled, next hour resets")
    } finally q.stop()
  }

  test("rate limiter batch: allowed+denied partition events, <=3 per user-hour") {
    import spark.implicits._
    val rows = Round13Ops15.streamRateLimitTokens(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.map(r => r._2 + r._3).sum === Tables.events(spark, sf).count())
    rows.foreach(r => assert(r._4 >= 0))
  }

  test("waterfall: priority tier wins over status tier over default") {
    import spark.implicits._
    val rows = Round13Ops15.joinLookupWaterfall(spark, sf)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(rows("1-URGENT") === 250L)
    assert(rows("2-HIGH") === 150L)
    // other priorities fall through to status (50) or default (25)
    rows.filterNot(r => r._1 == "1-URGENT" || r._1 == "2-HIGH")
      .values.foreach(bp => assert(bp == 50L || bp == 25L))
  }

  test("medallion: bronze >= silver, silver equals distinct ids, gold checksum matches") {
    import spark.implicits._
    val layers = Round13Ops15.pipelineMedallionRollup(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val n = Tables.events(spark, sf).count()
    assert(layers("2_silver")._1 === n, "silver must dedup back to the source")
    assert(layers("1_bronze")._1 > n, "bronze must contain the replayed rows")
    assert(layers("2_silver")._2 === layers("3_gold")._2,
      "gold aggregate must conserve the silver checksum")
  }
}
