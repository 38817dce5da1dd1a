package graft

import graft.ops.Round13Ops42
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 42: capture-recapture estimator bounds, key-profile
  * consistency.
  */
class Round13Spec42 extends AnyFunSuite with SparkFixture {

  test("capture-recapture: estimate bounds observed population") {
    import spark.implicits._
    val (n1, n2, m, obs, lp, chap, cov) =
      Round13Ops42.analyticCaptureRecapture(spark, sf)
        .as[(Long, Long, Long, Long, Double, Long, Double)].head()
    assert(n1 > 0 && n2 > 0 && m > 0)
    assert(m <= math.min(n1, n2))
    assert(obs === n1 + n2 - m + (obs - (n1 + n2 - m)),
      "observed covers both windows")
    // the estimate can never be below what we directly observed... the
    // estimator is >= max(n1, n2); and coverage = observed/estimate <= ~1
    assert(lp >= math.max(n1, n2) - 1e-9)
    assert(chap <= lp + 1, "Chapman corrects the LP estimate downward")
    assert(cov > 0.0 && cov <= 1.5)
  }

  test("key profile: orderkey unique, weaker candidates are not") {
    import spark.implicits._
    val rows = Round13Ops42.pipelineCandidateKeyProfile(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.length === 4)
    val byKey = rows.map(r => r._1 -> r).toMap
    val ok = byKey("o_orderkey")
    assert(ok._4 === 1L && ok._5 === 0.0, "o_orderkey must be unique")
    val ck = byKey("o_custkey")
    assert(ck._4 === 0L && ck._3 < ck._2,
      "customers repeat across orders")
    rows.foreach { case (_, n, d, uniq, ratio) =>
      assert(d <= n && (uniq == 0L || uniq == 1L))
      assert(math.abs(ratio - (1.0 - d.toDouble / n)) < 1e-6)
    }
  }
}
