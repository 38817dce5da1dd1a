package graft

import graft.ops.Round10Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 additions: ingest-restart ledger mirror, segment-level
  * dedup, gaps-and-islands, MAD anomaly summary, readability score.
  */
class Round10Spec extends AnyFunSuite with SparkFixture {

  test("ingest ledger: per-type cumulative totals converge to the table count") {
    import spark.implicits._
    val ledger = Round10Ops.streamFileIngestRestart(spark, sf)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(ledger.map(_._1).distinct.sorted === Seq(0L, 1L, 2L),
      "6 files / 2 per trigger must make exactly 3 triggers")
    val lastPerType = ledger.groupBy(_._2).map { case (t, rows) =>
      t -> rows.maxBy(_._1)._4
    }
    val direct = Tables.events(spark, sf).groupBy($"event_type")
      .agg(count(lit(1)).as("n")).as[(String, Long)].collect().toMap
    assert(lastPerType === direct,
      "final cumulative totals must equal the batch aggregate")
    // cumulative = running sum of arrivals within each type
    ledger.groupBy(_._2).foreach { case (_, rows) =>
      val s = rows.sortBy(_._1)
      assert(s.map(_._3).scanLeft(0L)(_ + _).tail === s.map(_._4))
    }
  }

  test("segment dedup: every reported segment really occurs n_copies times") {
    import spark.implicits._
    val reported = Round10Ops.dedupSegmentExact(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(reported.nonEmpty, "the corpus must contain duplicate segments")
    // brute-force census of the same segmentation
    val census = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .flatMap { case (id, text) =>
        val toks = text.split(" ")
        (0 until toks.length / 4).map(i =>
          (toks.slice(i * 4, i * 4 + 4).mkString(" "), id))
      }
    val byHash = census.groupBy { case (seg, _) =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(seg.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    reported.foreach { case (h, nCopies, nDocs, keep) =>
      val hits = byHash(h)
      assert(hits.length.toLong === nCopies)
      assert(hits.map(_._2).distinct.length.toLong === nDocs)
      assert(hits.map(_._2).min === keep, "survivor must be the lowest doc_id")
    }
    assert(byHash.count(_._2.length >= 2) === reported.length,
      "every duplicated segment must be reported")
  }

  test("gaps-islands: islands partition each user's events on the 10-min gap") {
    import spark.implicits._
    val islands = Round10Ops.analyticGapsIslands(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val totalEvents = Tables.events(spark, sf).count()
    assert(islands.map(_._3).sum === totalEvents,
      "islands must partition every event exactly once")
    islands.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted === (1L to rows.length).toSeq,
        "island ids must be consecutive from 1 within a user")
    }
    // spot-check the busiest user's islands against a direct scan
    val busiest = islands.groupBy(_._1).maxBy(_._2.map(_._3).sum)._1
    val ts = Tables.events(spark, sf).filter($"user_id" === busiest)
      .select(unix_micros($"ts".cast("timestamp"))).as[Long].collect().sorted
    val expectedIslands = ts.foldLeft(List.empty[List[Long]]) {
      case (acc, t) => acc match {
        case (h :: hs) :: rest if t - h <= 600000000L => (t :: h :: hs) :: rest
        case _ => List(t) :: acc
      }
    }
    assert(islands.count(_._1 == busiest) === expectedIslands.length)
  }

  test("MAD anomaly summary: robust stats flag the heavy upper tail") {
    import spark.implicits._
    val rows = Round10Ops.pipelineAnomalyMad(spark, sf)
      .select($"event_type", $"n_events", $"med", $"mad", $"n_outliers",
        $"max_score")
      .as[(String, Long, Double, Double, Long, Double)].collect()
    assert(rows.length >= 2, "every event type gets a summary row")
    rows.foreach { case (_, n, med, mad, nOut, maxScore) =>
      assert(n > 0 && med > 0 && mad > 0)
      assert(nOut > 0, "the skewed value distribution must flag outliers")
      assert(maxScore > 3.0)
      assert(nOut < n / 4, "robust stats must not flag a quarter of the data")
    }
  }

  test("readability: formula matches a direct recomputation") {
    import spark.implicits._
    val got = Round10Ops.textReadabilityScore(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length === Tables.documents(spark, sf).count())
    val byId = got.map(r => r._1 -> r).toMap
    Tables.documents(spark, sf).select($"doc_id", $"text")
      .as[(Long, String)].collect().take(25).foreach { case (id, text) =>
        val words = text.split(" ").length.toDouble
        val syl = "[aeiou]+".r.findAllIn(text).length.toDouble
        val flesch = math.floor((206.835
          - 1.015 * (words / math.ceil(words / 15.0))
          - 84.6 * (syl / words)) * 1e4 + 0.5) / 1e4
        val (_, w, s, f) = byId(id)
        assert(w === words.toLong && s === syl.toLong)
        assert(math.abs(f - flesch) < 1e-9, s"doc $id: $f vs $flesch")
      }
  }
}
