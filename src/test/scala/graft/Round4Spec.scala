package graft

import graft.ops.{Relational, Round4Ops}
import org.scalatest.funsuite.AnyFunSuite

/** Semantic properties of the round-4 operators beyond the DuckDB
  * hash-match: plan-equivalence of the bucketed range join, the
  * packing budget invariant, and contamination-check direction.
  */
class Round4Spec extends AnyFunSuite with SparkFixture {

  test("bucketed range join returns exactly the theta-join result") {
    val theta = Relational.joinThetaRange(spark, sf).collect().map(_.toSeq).toSet
    val bucketed = Round4Ops.joinRangeBucketed(spark, sf).collect().map(_.toSeq).toSet
    assert(bucketed === theta,
      s"bucketed plan must be result-identical; diff=${bucketed.diff(theta).take(3)} / ${theta.diff(bucketed).take(3)}")
    assert(theta.nonEmpty, "the equivalence must be exercised on real pairs")
  }

  test("token-budget packing: shards fill sequentially and never start past the budget") {
    import spark.implicits._
    val rows = Round4Ops.pipelineTokenBudgetPack(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    val budget = 8192L
    rows.groupBy(_._2).foreach { case (lang, docs) =>
      val ordered = docs.sortBy(_._1)
      var cum = 0L
      ordered.foreach { case (_, _, n, shard) =>
        assert(shard === cum / budget, s"$lang: shard must be floor(cumBefore/budget)")
        cum += n
      }
      val shards = ordered.map(_._4).distinct.sorted
      assert(shards === (0L to shards.max).toArray.toSeq,
        s"$lang: shard ids must be contiguous from 0")
    }
  }

  test("contamination check only flags training docs against the benchmark set") {
    import spark.implicits._
    val rows = Round4Ops.pipelineContaminationCheck(spark, sf)
      .as[(Long, Long, Int)].collect()
    assert(rows.forall { case (docId, benchId, n) =>
      docId >= 20 && benchId < 20 && n >= 1 })
  }

  test("limit_offset is page 3 of the total order") {
    import spark.implicits._
    val page = Round4Ops.limitOffset(spark, sf).as[(Long, Double)].collect()
    val full = graft.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_totalprice".cast("double").as("total"))
      .as[(Long, Double)].collect()
      .sortBy { case (k, t) => (-t, k) }
    assert(page.toSeq === full.slice(40, 60).toSeq)
  }

  test("recursive CTE month ladder covers 1995 exactly") {
    val months = Round4Ops.sqlRecursiveCte(spark, sf).collect()
    assert(months.length === 12)
    val first = months.head.getAs[java.time.LocalDateTime]("m")
    assert(first === java.time.LocalDateTime.of(1995, 1, 1, 0, 0))
  }

  test("containment values are in (0, 1] and directed small-to-big") {
    import spark.implicits._
    val rows = Round4Ops.textContainment(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, c) => a != b && c > 0.0 && c <= 1.0 })
  }
}
