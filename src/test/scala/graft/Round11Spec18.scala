package graft

import graft.ops.Round11Ops21
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 21: Katz centrality, centroid classifier,
  * distinct rollup, segment migration, compression ratio, stable
  * UUIDs. */
class Round11Spec18 extends AnyFunSuite with SparkFixture {

  test("katz: scaled integers >= isolated baseline, katz = scaled/256") {
    import spark.implicits._
    val rows = Round11Ops21.graphKatzCentrality(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, xs, k) =>
      // x4 >= 4^4 + 4 neighbors' minimum contributions > 256
      assert(xs > 256, "connected nodes exceed the bare attenuation sum")
      assert(math.abs(k - xs / 256.0) < 1e-6)
    }
  }

  test("centroid classifier: one prediction per test vector, exact counts") {
    import spark.implicits._
    val rows = Round11Ops21.mlCentroidClassifier(spark, sf)
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val nTest = rows.map(_._2).sum
    val expected = Tables.embeddings(spark, sf)
      .filter($"vec_id" % 2 =!= 0).count()
    assert(nTest === expected, "every test vector classified exactly once")
    rows.foreach { case (_, n, c, acc) =>
      assert(c <= n && acc >= 0.0 && acc <= 1.0)
      assert(math.abs(acc - c.toDouble / n) < 1e-4)
    }
    // deterministic across runs (argmax on exact decimals)
    val again = Round11Ops21.mlCentroidClassifier(spark, sf)
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.toSeq === again.toSeq)
    // NOTE: the synthetic embeddings carry no label signal by
    // construction (accuracy ≈ 1/10 baseline) — the oracle checks the
    // exact math; this spec pins mechanics and determinism.
  }

  test("distinct rollup: grand total matches direct distinct count") {
    import spark.implicits._
    val rows = Round11Ops21.aggDistinctRollup(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length === 1)
    val direct = Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(grand.head.getLong(2) === direct)
    // per-type subtotal rows exist and are <= grand total
    val perType = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(perType.nonEmpty)
    perType.foreach(r => assert(r.getLong(2) <= direct))
  }

  test("segment migration: every transition count positive, quartiles in 1..4") {
    import spark.implicits._
    val rows = Round11Ops21.analyticSegmentMigration(spark, sf)
      .as[(Int, Int, Int, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, qf, qt, n) =>
      assert(qf >= 1 && qf <= 4 && qt >= 1 && qt <= 4 && n > 0)
    }
  }

  test("compression ratio: repetitive docs compress better") {
    import spark.implicits._
    val ratios = Round11Ops21.textCompressionRatio(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(ratios.nonEmpty)
    ratios.foreach { case (_, ob, cb, r) =>
      assert(ob > 0 && cb > 0)
      assert(math.abs(r - cb.toDouble / ob) < 1e-4)
    }
    // direction: docs with fewer distinct tokens (more repetition)
    // must compress better on average than high-diversity docs
    val diversity = Tables.documents(spark, sf)
      .select($"doc_id", (size(array_distinct(split($"text", " "))).cast("double") /
        size(split($"text", " ")).cast("double")).as("dv"))
      .as[(Long, Double)].collect().toMap
    val joined = ratios.map { case (id, _, _, r) => (diversity(id), r) }
    val med = joined.map(_._1).sorted.apply(joined.length / 2)
    val lo = joined.filter(_._1 < med).map(_._2)
    val hi = joined.filter(_._1 >= med).map(_._2)
    assert(lo.nonEmpty && hi.nonEmpty)
    assert(lo.sum / lo.length < hi.sum / hi.length,
      "low-diversity half compresses better")
  }

  test("stable uuid: v3 layout, deterministic across runs") {
    import spark.implicits._
    val rows = Round11Ops21.fnUuid3Stable(spark, sf)
      .as[(Long, String)].collect()
    assert(rows.length === Tables.orders(spark, sf).count())
    val re = "^[0-9a-f]{8}-[0-9a-f]{4}-3[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$".r
    rows.foreach { case (_, u) =>
      assert(re.matches(u), s"uuid layout: $u")
    }
    val again = Round11Ops21.fnUuid3Stable(spark, sf)
      .as[(Long, String)].collect()
    assert(rows.toSeq === again.toSeq)
  }
}
