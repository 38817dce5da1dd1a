package graft

import graft.ops.Round13Ops4
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 4: MAD median cross-check against a driver-side
  * sort, imputation mass conservation, schema-evolution generation
  * reconciliation.
  */
class Round13Spec4 extends AnyFunSuite with SparkFixture {

  test("mad outliers: medians match a driver-side reference, rate consistent") {
    import spark.implicits._
    val (n, med, mad, nOut, rate) = Round13Ops4.analyticMadOutliers(spark, sf)
      .as[(Long, Long, Long, Long, Double)].head()
    val cents = Tables.orders(spark, sf)
      .select((Tables.money($"o_totalprice") * 100).cast("long"))
      .as[Long].collect().sorted
    assert(n === cents.length.toLong)
    val refMed = cents(cents.length / 2) // upper median, rank n/2+1
    assert(med === refMed, s"median $med != reference $refMed")
    val devs = cents.map(c => math.abs(c - refMed)).sorted
    assert(mad === devs(devs.length / 2))
    assert(nOut === devs.count(_ > 3 * mad).toLong)
    assert(math.abs(rate - nOut.toDouble / n) < 1e-6)
  }

  test("impute missing: filled total conserves present mass plus mean-filled gaps") {
    import spark.implicits._
    val rows = Round13Ops4.mlImputeMissing(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nt, nm, mean, filled) =>
      assert(nm > 0 && nm < nt, "the 1-in-7 slice must hit every type")
      val present = (nt - nm) * mean
      assert(math.abs(filled - (present + nm * mean)) < 1e-2,
        "filled total must equal n_total * imputed mean")
    }
  }

  test("schema evolution: generations reconcile with the source halves") {
    import spark.implicits._
    val gens = Round13Ops4.sourceSchemaEvolution(spark, sf)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(gens.map(_._1).toSeq === Seq(1, 2))
    val n = Tables.orders(spark, sf).count()
    assert(gens.map(_._2).sum === n)
    assert(gens(0)._4 === 0L, "gen 1 predates the channel column")
    assert(gens(1)._4 === gens(1)._2, "every gen-2 row carries channel")
  }
}
