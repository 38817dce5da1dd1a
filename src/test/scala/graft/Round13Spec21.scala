package graft

import graft.ops.Round13Ops21
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 21: DTW metric properties vs a driver-side reference
  * DP, reconciliation coherence.
  */
class Round13Spec21 extends AnyFunSuite with SparkFixture {

  test("dtw: matches a driver-side full DP on every pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val got = Round13Ops21.tsDtwDistance(spark, sf)
      .as[(String, String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val daily = Tables.events(spark, sf)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1).map { case (t, rs) =>
        t -> rs.sortBy(_._2.getTime).map(r => r._2 -> r._3) }
    def dtwRef(a: Array[Long], b: Array[Long]): Long = {
      val n = a.length
      val dp = Array.fill(n + 1, n + 1)(Long.MaxValue / 4)
      dp(0)(0) = 0
      for (i <- 1 to n; j <- 1 to n)
        dp(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(dp(i - 1)(j), math.min(dp(i)(j - 1), dp(i - 1)(j - 1)))
      dp(n)(n)
    }
    got.foreach { case (ta, tb, n, cost, per) =>
      val da = daily(ta).toMap; val db = daily(tb).toMap
      val common = daily(ta).map(_._1).filter(db.contains).sortBy(_.getTime)
      assert(common.length === n)
      val ref = dtwRef(common.map(da).toArray, common.map(db).toArray)
      assert(cost === ref, s"$ta/$tb: dtw $cost != reference $ref")
      assert(math.abs(per - cost.toDouble / (2 * n)) < 1e-3)
    }
  }

  test("reconcile: shares sum to 1, top-down masses sum to the total forecast") {
    import spark.implicits._
    val rows = Round13Ops21.tsHierarchicalReconcile(spark, sf)
      .as[(Int, Long, Double, Long, Double)].collect()
    // only nations with orders inside the 7-day window appear
    assert(rows.nonEmpty && rows.length <= 25)
    val tf = rows.head._4
    assert(rows.forall(_._4 == tf))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_._5).sum - tf) < 1.0,
      "top-down allocations must re-sum to the coherent total")
  }
}
