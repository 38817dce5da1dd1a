package graft

import graft.ops.Round13Ops8
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 8: DISTRIBUTE BY plan shape, late-dim mass
  * conservation, rounding-mode conformance vs the native functions.
  */
class Round13Spec8 extends AnyFunSuite with SparkFixture {

  test("distribute by: explicit repartition honored, redundant sort elided") {
    val df = Round13Ops8.sqlDistributeClusterBy(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // DISTRIBUTE BY materializes as a user-requested exchange the agg
    // then reuses (no ENSURE_REQUIREMENTS hash exchange on top of it)
    assert(plan.contains("hashpartitioning(o_orderpriority") &&
        plan.contains("REPARTITION_BY_COL"),
      s"expected the explicit hash exchange on the distribute key:\n$plan")
    assert(plan.split("hashpartitioning\\(o_orderpriority").length == 2,
      s"the aggregate must reuse the DISTRIBUTE BY exchange:\n$plan")
    // EliminateSorts drops the partition-local SORT BY under the agg:
    // the only Sort left is the global outer ORDER BY
    assert(!"Sort \\[[^\\]]*cents".r.findFirstIn(plan).isDefined,
      s"the redundant SORT BY under an aggregate should be elided:\n$plan")
    assert(df.count() === 5)
  }

  test("late dim: late counts are exactly the mod-10 customers' orders") {
    import spark.implicits._
    val rows = Round13Ops8.pipelineLateArrivingDim(spark, sf)
      .as[(Int, Long, Long, Long, Double)].collect()
    assert(rows.map(_._2).sum === Tables.orders(spark, sf).count())
    val expectedLate = Tables.orders(spark, sf).as("o")
      .join(Tables.customer(spark, sf).as("c"),
        col("o.o_custkey") === col("c.c_custkey"))
      .filter(pmod(col("c.c_custkey"), lit(10)) === 0).count()
    assert(rows.map(_._3).sum === expectedLate)
    rows.foreach { r =>
      assert(r._3 <= r._2 && r._5 >= 0.0 && r._5 <= 1.0)
    }
  }

  test("rounding modes: integer forms agree with native round/bround/floor/ceil") {
    import spark.implicits._
    val (n, hu, he, fl, ce) = Round13Ops8.fnRoundingModes(spark, sf)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(n === Tables.orders(spark, sf).count())
    assert(fl <= he && he <= ce)
    assert(fl <= hu && hu <= ce)
    // conformance: the engine's own functions produce the same sums
    val d = Tables.orders(spark, sf)
      .select(Tables.money($"o_totalprice").as("p"))
      .agg(sum(round($"p", 0).cast("long")).as("hu"),
        sum(bround($"p", 0).cast("long")).as("he"),
        sum(floor($"p").cast("long")).as("fl"),
        sum(ceil($"p").cast("long")).as("ce"))
      .as[(Long, Long, Long, Long)].head()
    assert(d._1 === hu, "native round (HALF_UP) disagrees")
    assert(d._2 === he, "native bround (HALF_EVEN) disagrees")
    assert(d._3 === fl, "native floor disagrees")
    assert(d._4 === ce, "native ceil disagrees")
  }
}
