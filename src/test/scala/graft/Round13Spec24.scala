package graft

import graft.ops.Round13Ops24
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 24: Shapley axioms — efficiency (values sum to the
  * grand-coalition marginal mass) and non-negativity under a monotone
  * characteristic function.
  */
class Round13Spec24 extends AnyFunSuite with SparkFixture {

  test("shapley: efficiency axiom holds exactly in 1/24 units") {
    import spark.implicits._
    val rows = Round13Ops24.analyticShapleyAttribution(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.map(_._1).toSet === Set("view", "click", "search", "cart"))
    // v is monotone (mask ⊆ S grows with S), so marginals are >= 0
    rows.foreach { case (c, p24, p) =>
      assert(p24 >= 0, s"$c: negative Shapley value $p24")
      assert(math.abs(p - p24 / 24.0) < 1e-6)
    }
    // efficiency: sum phi = v(full) - v(empty); v(full) = all
    // converting users, v(empty) = users with no pre-purchase touches
    val ev = Tables.events(spark, sf)
    val fp = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts").as("t0"))
    val vFull = fp.count()
    val vEmpty = vFull - fp.join(ev, Seq("user_id"))
      .filter($"ts" < $"t0" &&
        $"event_type".isin("view", "click", "search", "cart"))
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum === 24L * (vFull - vEmpty),
      "sum of Shapley values must equal v(grand) - v(empty) exactly")
  }
}
