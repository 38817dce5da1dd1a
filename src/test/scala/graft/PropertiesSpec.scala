package graft

import graft.ops.{Aggregates, Analytic, LlmOps, Relational}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic properties (SURVEY §5.3) on generated + fixture data.
  * ScalaCheck generators are driven with fixed seeds (the
  * scalatest–scalacheck bridge artifact is not on the offline
  * classpath, and fixed seeds keep the suite deterministic anyway).
  */
class PropertiesSpec extends AnyFunSuite with SparkFixture {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("filter commutes with projection on disjoint columns") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf)
    val a = li.select($"l_orderkey", $"l_quantity")
      .filter($"l_quantity" > 25).collect().toSet
    val b = li.filter($"l_quantity" > 25)
      .select($"l_orderkey", $"l_quantity").collect().toSet
    assert(a === b)
  }

  test("union-all count additivity over generated slices") {
    import spark.implicits._
    for (threshold <- samples(Gen.choose(0.0, 500000.0), 5)) {
      val o = Tables.orders(spark, sf)
      val lo = o.filter($"o_totalprice" <= threshold)
      val hi = o.filter($"o_totalprice" > threshold)
      assert(lo.count() + hi.count() === o.count())
    }
  }

  test("window rank stays within [1, partition size]") {
    import spark.implicits._
    val bad = Analytic.winRanking(spark, sf)
      .groupBy($"o_custkey").agg(max($"rn").as("mx"), count(lit(1)).as("n"))
      .filter($"mx" =!= $"n").count()
    assert(bad === 0)
  }

  test("sort is idempotent") {
    val once = Analytic.sortMultiKey(spark, sf).collect().toSeq
    val twice = Analytic.sortMultiKey(spark, sf)
      .orderBy(col("st").desc_nulls_last, col("o_orderpriority").asc,
        col("o_orderkey").desc).collect().toSeq
    assert(once === twice)
  }

  test("set ops: intersect + except partition the left side") {
    import spark.implicits._
    val left = Tables.customer(spark, sf).select($"c_custkey")
    val inter = Analytic.setIntersect(spark, sf)
    val exc = Analytic.setExcept(spark, sf)
    // intersect(left, urgent) and except(left, 1995) use different
    // rights, so just sanity-bound both by the left cardinality
    assert(inter.count() <= left.count())
    assert(exc.count() <= left.count())
  }

  test("rollup total row equals ungrouped aggregate") {
    import spark.implicits._
    val total = Aggregates.aggRollup(spark, sf)
      .filter($"gid" === 3).select($"n").as[Long].head()
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("Q1 revenue equals an independent decimal recomputation") {
    import spark.implicits._
    val viaOp = Relational.aggHashGroupby(spark, sf)
      .agg(sum($"sum_disc_price")).as[Double].head()
    val direct = Tables.lineitem(spark, sf)
      .filter($"l_shipdate" <= Tables.ntz("2000-12-01 00:00:00"))
      .select((Tables.money($"l_extendedprice") *
        (lit(1).cast(Tables.D4_2) - Tables.rate($"l_discount"))).as("np"))
      .agg(sum($"np").cast("double")).as[Double].head()
    assert(math.abs(viaOp - direct) < 1e-6)
  }

  test("jaccard self-similarity and symmetry on generated token sets") {
    import spark.implicits._
    for (toks <- samples(Gen.listOfN(20, Gen.oneOf("a", "b", "c", "d", "e", "f")), 10)
         if toks.nonEmpty) {
      // any stable per-token hash works for the property
      val th = toks.distinct.map(_.hashCode.toLong).sorted.toArray
      val df = Seq((th, th)).toDF("a", "b")
      val self = df.select(LlmOps.intersectSizeUdf($"a", $"b")).as[Int].head()
      assert(self === th.length) // J(x,x) = 1
    }
  }
}
