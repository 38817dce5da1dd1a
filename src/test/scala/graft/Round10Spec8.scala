package graft

import graft.ops.Round10Ops8
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 8: spatial grid join, format patterns, try_cast,
  * row fingerprints.
  */
class Round10Spec8 extends AnyFunSuite with SparkFixture {

  test("spatial grid: neighbor counts match a brute-force radius scan") {
    import spark.implicits._
    val got = Round10Ops8.joinSpatialGrid(spark, sf)
      .as[(Long, Long)].collect().toMap
    val pts = Tables.part(spark, sf)
      .select($"p_partkey", ($"p_retailprice" / 100.0).as("x"),
        $"p_size".cast("double").as("y"))
      .as[(Long, Double, Double)].collect()
    val r2 = 0.25 * 0.25
    val brute = pts.map { case (id, x, y) =>
      id -> pts.count { case (id2, x2, y2) =>
        id2 != id && (x - x2) * (x - x2) + (y - y2) * (y - y2) <= r2
      }.toLong
    }.filter(_._2 > 0).toMap
    assert(got === brute, "grid join must equal the O(n²) scan")
    assert(got.nonEmpty)
  }

  test("format patterns: renders reproduce from raw values") {
    import spark.implicits._
    val rows = Round10Ops8.fnFormatPatterns(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val key = r.getAs[Long]("o_orderkey")
      assert(r.getAs[String]("key_padded") === f"$key%010d")
      assert(r.getAs[String]("date_str")
        .startsWith(r.getAs[String]("ym_str")))
      assert(r.getAs[String]("price_str").matches("""\d+\.\d{2}"""))
      assert(r.getAs[String]("status_tag").contains("/"))
    }
  }

  test("try_cast: thirds parse, #-prefixed third rejects, sums consistent") {
    import spark.implicits._
    val rows = Round10Ops8.fnTryCast(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.map(_._2).sum === Tables.events(spark, sf).count())
    rows.foreach { case (_, n, ok, bad, _) =>
      assert(ok + bad === n)
      assert(bad > 0, "every type has some #-junk rows")
    }
    // global: exactly the event_id % 3 == 1 rows reject
    val expectedBad = Tables.events(spark, sf)
      .filter($"event_id" % 3 === 1).count()
    assert(rows.map(_._4).sum === expectedBad)
  }

  test("2d histogram: bin counts partition the part table") {
    import spark.implicits._
    val rows = Round10Ops8.aggHistogram2d(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.map(_._3).sum === Tables.part(spark, sf).count())
    rows.foreach { case (pb, sb, n, v) =>
      assert(pb >= 0 && sb >= 0 && n > 0 && v > 0)
    }
    assert(rows.length > 1, "the grid must have multiple occupied bins")
  }

  test("rolling zscore: one row per full non-degenerate frame, finite values") {
    import spark.implicits._
    val rows = Round10Ops8.tsRollingZscore(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, z) =>
      assert(!z.isNaN && !z.isInfinite)
      assert(math.abs(z) < 20, s"20-row frame z-score $z out of range")
    }
    // per type: exactly n - 19 full frames (no zero-variance frames in
    // this continuous-value fixture)
    val counts = Tables.events(spark, sf).groupBy($"event_type")
      .agg(count(lit(1))).as[(String, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (t, g) =>
      assert(g.length === counts(t) - 19)
    }
  }

  test("word length profile: token counts partition the corpus tokens") {
    import spark.implicits._
    val rows = Round10Ops8.textWordlenProfile(spark, sf)
      .as[(String, Int, Long)].collect()
    val total = Tables.documents(spark, sf)
      .select(explode(split($"text", " "))).count()
    assert(rows.map(_._3).sum === total)
    rows.foreach { case (_, wlen, n) => assert(wlen >= 1 && n > 0) }
    assert(rows.map(_._1).distinct.sorted ===
      Array("de", "en", "es", "fr", "zh"))
  }

  test("row fingerprints are collision-free over orders") {
    val r = Round10Ops8.pipelineRowFingerprint(spark, sf).collect().head
    assert(r.getAs[Long]("n_rows") === r.getAs[Long]("n_distinct_fp"))
    assert(r.getAs[String]("min_fp").length === 32)
    assert(r.getAs[String]("max_fp").length === 32)
  }
}
