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

  test("rolling zscore: chunked stitch equals the global per-type window (sf0.01)") {
    // The round-16 chunked two-phase form must be row-identical to the
    // semantic definition — one window over the whole type. sf0.01 has
    // ~2k rows per type, so every type crosses the 1024-row chunk
    // boundary and the 19-row carry stitch is actually exercised
    // (sf0.001's ~200-row types would all fit one chunk).
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DecimalType, LongType}
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val w = Window.partitionBy($"event_type").orderBy($"ts", $"event_id")
      .rowsBetween(-19, Window.currentRow)
    val naive = Tables.events(spark, dir)
      .select($"event_type", $"ts", $"event_id",
        Tables.money($"value").as("x"))
      .withColumn("nf", count(lit(1)).over(w))
      .withColumn("sx", sum($"x").over(w).cast(DecimalType(18, 2)))
      .withColumn("sxx", sum($"x" * $"x").over(w).cast(DecimalType(28, 4)))
      .filter($"nf" === 20 && $"sxx" * 20 - $"sx" * $"sx" > 0)
      .selectExpr("event_type", "event_id",
        """round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / 20)
          | / sqrt((20 * CAST(sxx AS DOUBLE)
          |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (20 * 19)), 6)
          |AS zscore""".stripMargin.replace("\n", " "))
      .orderBy($"event_type", $"event_id")
      .as[(String, Long, Double)].collect()
    val chunked = Round10Ops8.tsRollingZscore(spark, dir)
      .as[(String, Long, Double)].collect()
    assert(chunked.length === naive.length)
    assert(chunked === naive, "chunked rolling sums must be row-identical")
    // and the stitch actually ran: > |event_type| chunk partitions
    val nChunks = Round10Ops8.tsRollingZscore(spark, dir) // plan reuse
      .select($"event_type").distinct().count() // 5 types present
    val chunkCount = Tables.events(spark, dir)
      .groupBy($"event_type").count()
      .agg(sum(ceil($"count" / 1024)).cast(LongType)).as[Long].head()
    assert(chunkCount > nChunks,
      s"sf0.01 must split types into multiple chunks (got $chunkCount)")
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
