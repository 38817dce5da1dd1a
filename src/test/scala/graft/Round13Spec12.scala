package graft

import graft.ops.Round13Ops12
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 12: walk mass conservation, SHAP additivity, CSV
  * delimiter round-trip vs the plain-comma path.
  */
class Round13Spec12 extends AnyFunSuite with SparkFixture {

  test("random walks: every start walks somewhere, mass conserved") {
    import spark.implicits._
    val rows = Round13Ops12.graphRandomWalkVisits(spark, sf)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // |V| independently via the registered degree-distribution op
    val nodes = graft.ops.Round10Ops4.graphDegreeDistribution(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_nodes"))
      .as[Long].head()
    assert(rows.map(_._2).sum === nodes,
      "one walk per start node: end-visit counts must sum to |V|")
    assert(rows.forall(_._2 > 0))
  }

  test("linear shap: additivity pred = base + phi1 + phi2 up to rounding") {
    import spark.implicits._
    val rows = Round13Ops12.mlLinearShapExact(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.length === 10)
    rows.foreach { case (okey, _, _, _, p1, p2, base, pred) =>
      assert(math.abs(base + p1 + p2 - pred) < 5e-4,
        s"order $okey: additivity violated: $base + $p1 + $p2 != $pred")
    }
    // highest-revenue orders: y strictly ordered desc with key ties
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("multichar csv: equals the comma-delimited read of the same data") {
    import spark.implicits._
    val got = Round13Ops12.sourceCsvMulticharDelim(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.length === 5)
    val n = Tables.events(spark, sf).count()
    assert(got.map(_._2).sum === n, "round-trip must preserve every row")
  }
}
