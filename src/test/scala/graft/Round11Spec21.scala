package graft

import graft.ops.Round11Ops24
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 24: modularity, OOF target encoding,
  * cluster histogram, Theil index, markdown strip, Mann-Kendall. */
class Round11Spec21 extends AnyFunSuite with SparkFixture {

  test("modularity: contributions reconcile, |Q| <= 1") {
    import spark.implicits._
    val rows = Round11Ops24.graphModularity(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val q = rows.head._6
    assert(rows.forall(_._6 === q), "global Q repeated per community")
    assert(q >= -1.0 && q <= 1.0)
    // degree sums add to 2m over all communities
    val dsum = rows.map(_._4).sum
    assert(dsum % 2 === 0)
  }

  test("OOF encode: fold complement math checks out") {
    import spark.implicits._
    val rows = Round11Ops24.mlTargetEncodeOof(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val nC = g.map(_._3).sum
      val posC = g.map(_._4).sum
      g.foreach { case (_, _, nF, posF, enc) =>
        val expected = (posC - posF).toDouble / (nC - nF)
        assert(math.abs(enc - expected) < 1e-4)
      }
    }
  }

  test("cluster histogram: cluster members + singletons = all docs") {
    import spark.implicits._
    val rows = Round11Ops24.dedupClusterSizeHistogram(spark, sf)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    val docsCovered = rows.map { case (sz, n) => sz * n }.sum
    assert(docsCovered === Tables.documents(spark, sf).count())
    rows.foreach { case (sz, n) => assert(sz >= 1 && n > 0) }
  }

  test("theil: non-negative inequality per year") {
    import spark.implicits._
    val rows = Round11Ops24.analyticTheilIndex(spark, sf)
      .as[(Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, t) =>
      assert(n > 0)
      assert(t >= -1e-6, s"Theil index is non-negative, got $t")
    }
  }

  test("markdown strip: semantics match the constructed wrapper") {
    import spark.implicits._
    val rows = Round11Ops24.textMarkdownStrip(spark, sf)
      .as[(Long, String, Long)].collect()
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach { case (id, stripped, nl) =>
      assert(stripped === s"title\n\n${texts(id)} see link")
      assert(nl === 1)
    }
  }

  test("mann-kendall: |S| bounded by pair count, trend matches sign") {
    import spark.implicits._
    val rows = Round11Ops24.tsMannKendall(spark, sf)
      .as[(String, Long, Long, Double, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, s, z, tr) =>
      assert(math.abs(s) <= n * (n - 1) / 2)
      assert(tr === (if (s > 0) "up" else if (s < 0) "down" else "flat"))
      if (s > 0) assert(z >= 0) else if (s < 0) assert(z <= 0)
    }
  }
}
