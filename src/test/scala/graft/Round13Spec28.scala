package graft

import graft.ops.Round13Ops28
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 28: LDP debiasing accuracy, IN-list pushdown pin.
  */
class Round13Spec28 extends AnyFunSuite with SparkFixture {

  test("ldp: debiased estimate lands near the true rate, report differs") {
    import spark.implicits._
    val (n, tc, rc, rr, dr, tr, err) =
      Round13Ops28.pipelineLdpRandomizedResponse(spark, sf)
        .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    assert(n === Tables.customer(spark, sf).count())
    assert(rc !== tc, "perturbation must actually flip some reports")
    // RR noise at n>=150: the debiased estimate should sit within a
    // few percentage points of truth while the raw report is pulled
    // toward 0.5's mixture point
    assert(err < 0.12, s"debiased err $err too large")
    assert(math.abs(dr - tr) <= math.abs(rr - tr) + 0.02,
      "debiasing should not be farther from truth than the raw rate")
  }

  test("in pushdown: the In filter reaches the scan") {
    val df = Round13Ops28.filterPushdownIn(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("PushedFilters")).mkString("\n")
    assert(scan.contains("In(o_custkey"),
      s"expected the IN-list in PushedFilters:\n$scan")
    import spark.implicits._
    val (nRows, nKeys, _) = df.as[(Long, Long, Long)].head()
    assert(nKeys <= 40 && (nRows == 0 || nKeys > 0))
  }
}
