package graft

import graft.ops.Round13Ops9
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 9: Matryoshka recall bounds + self-consistency,
  * drift symmetry, bloom round-trip mass conservation.
  */
class Round13Spec9 extends AnyFunSuite with SparkFixture {

  test("matryoshka: recall in [0,1], full-rank self-overlap is exact") {
    import spark.implicits._
    val rows = Round13Ops9.simMatryoshkaPrefixRecall(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.length === 8)
    rows.foreach { case (qid, ov, rec) =>
      assert(ov >= 0 && ov <= 10, s"q$qid overlap $ov")
      assert(math.abs(rec - ov / 10.0) < 1e-9)
    }
    // the prefix shares SOME signal with the full vector: across the 8
    // probes at least one neighbor should survive truncation
    assert(rows.map(_._2).sum > 0, "prefix recall collapsed to zero everywhere")
  }

  test("embedding drift: 64 dims, cohort sizes partition the corpus") {
    import spark.implicits._
    val rows = Round13Ops9.pipelineEmbeddingDrift(spark, sf)
      .as[(Int, Long, Long, Double, Double)].collect()
    assert(rows.length === 64)
    val n = Tables.embeddings(spark, sf).count()
    rows.foreach { case (dim, na, nb, shift, z) =>
      assert(na + nb === n, s"dim $dim cohorts don't partition")
      assert(!z.isNaN, s"dim $dim z NaN")
      // z and shift must agree in sign (same numerator)
      assert(shift == 0.0 || shift * z >= 0.0, s"dim $dim sign mismatch")
    }
  }

  test("bloom roundtrip: re-read aggregates equal the source") {
    import spark.implicits._
    val (n, s, np, ps) = Round13Ops9.sourceParquetBloomRoundtrip(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    val src = Tables.orders(spark, sf)
      .select((Tables.money($"o_totalprice") * 100).cast("long").as("c"),
        $"o_custkey")
    assert(n === src.count())
    assert(s === src.agg(sum($"c")).as[Long].head())
    assert(np === src.filter($"o_custkey" === 7).count())
    assert(ps >= 0 && np <= n)
  }
}
