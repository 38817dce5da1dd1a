package graft

import graft.ops.Round13Ops11
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 11: null-ordering contract, typed reduce vs max_by
  * cross-check, struct rewrite schema, Or pushdown pin.
  */
class Round13Spec11 extends AnyFunSuite with SparkFixture {

  test("null ordering: non-null block first, nulls only in the tail") {
    import spark.implicits._
    val rows = Round13Ops11.sortNullsOrdering(spark, sf)
      .as[(Long, Option[String], Long)].collect()
    assert(rows.length === 40)
    val firstNull = rows.indexWhere(_._2.isEmpty)
    if (firstNull >= 0)
      assert(rows.drop(firstNull).forall(_._2.isEmpty),
        "nulls must form a contiguous tail under asc_nulls_last")
    // within the non-null prefix, cents are non-increasing per status
    rows.take(if (firstNull < 0) rows.length else firstNull)
      .groupBy(_._2).values.foreach { g =>
        assert(g.map(_._3).sliding(2).forall(p =>
          p.length < 2 || p(0) >= p(1)))
      }
  }

  test("typed reduce: agrees with the untyped max_by formulation") {
    import spark.implicits._
    val (n, sc, sk) = Round13Ops11.typedReduceGroups(spark, sf)
      .as[(Long, Long, Long)].head()
    val ref = Tables.orders(spark, sf)
      .select($"o_custkey",
        struct((Tables.money($"o_totalprice") * 100).cast("long")
          .as("cents"), $"o_orderkey".as("okey")).as("s"))
      .groupBy($"o_custkey").agg(max($"s").as("m"))
      .agg(count(lit(1)), sum($"m.cents"), sum($"m.okey"))
      .as[(Long, Long, Long)].head()
    assert((n, sc, sk) === ref)
  }

  test("struct rewrite: dropped field gone, added fields typed") {
    import spark.implicits._
    val df = Tables.orders(spark, sf)
      .select(struct(lit("x").as("priority"), lit(1L).as("cents"),
        lit("y").as("status")).as("info"))
      .withColumn("info", $"info"
        .withField("cents_x2", $"info.cents" * 2)
        .dropFields("status"))
    val fields = df.schema.fields.head.dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType].fieldNames.toSeq
    assert(fields === Seq("priority", "cents", "cents_x2"))
    assert(Round13Ops11.projectStructRewrite(spark, sf).count() === 5)
  }

  test("or pushdown: the disjunction reaches the parquet scan") {
    val df = Round13Ops11.filterPushdownOr(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(scan.contains("Or("),
      s"expected the Or disjunction in PushedFilters:\n$scan")
  }
}
