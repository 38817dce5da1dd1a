package graft

import graft.ops.Round13Ops10
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 10: stratified-ATE mass checks, HOF self-identities,
  * nested ReadSchema pruning pin.
  */
class Round13Spec10 extends AnyFunSuite with SparkFixture {

  test("stratified ate: strata partition the orders, terms sum to the ATE") {
    import spark.implicits._
    val rows = Round13Ops10.mlStratifiedAte(spark, sf)
      .as[(String, Long, Long, Double, Double, Double, Double, Double)]
      .collect()
    assert(rows.length === 5)
    assert(rows.map(r => r._2 + r._3).sum === Tables.orders(spark, sf).count())
    val ate = rows.head._7
    assert(rows.forall(_._7 == ate))
    assert(math.abs(rows.map(_._6).sum - ate) < 1e-9,
      "stratum terms must sum to the stratified ATE exactly")
  }

  test("array hofs: zip_with palindrome pairs double the plain sum") {
    import spark.implicits._
    val (n, sq, se, sp, nb, np) = Round13Ops10.fnArrayHofs(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // the synthetic corpus has orders without lineitems: the HOF pass
    // covers exactly the orderkeys present in lineitem
    assert(n === Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count())
    assert(sp === 2 * sq, "arr[i] + arr[rev i] summed must equal 2*sum")
    assert(se <= Tables.lineitem(spark, sf).count())
    assert(np === n, "all quantities are positive, forall must hold everywhere")
    assert(nb > 0 && nb <= n)
  }

  test("nested pruning: ReadSchema keeps only the touched struct fields") {
    val df = Round13Ops10.scanNestedPruning(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val scan = plan.linesIterator.filter(_.contains("ReadSchema"))
      .mkString("\n")
    assert(scan.contains("priority") && scan.contains("cents"),
      s"scan must read the two touched nested fields:\n$scan")
    assert(!scan.contains("status"),
      s"the untouched nested field must be pruned from the scan:\n$scan")
    assert(df.count() === 5)
  }
}
