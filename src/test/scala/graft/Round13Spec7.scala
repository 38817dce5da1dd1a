package graft

import graft.ops.Round13Ops7
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 7: Kneser-Ney probability bounds + sums-to-one on a
  * fixed context, ridge shrinkage direction vs OLS, SQL k-means
  * partition/inertia invariants.
  */
class Round13Spec7 extends AnyFunSuite with SparkFixture {

  test("kneser-ney: probabilities in (0,1], discount never exceeds raw MLE") {
    import spark.implicits._
    val rows = Round13Ops7.textKneserNeyBigram(spark, sf)
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.length === 25)
    rows.foreach { case (w1, w2, c12, c1, p) =>
      assert(c12 <= c1, s"$w1 $w2: bigram count exceeds context count")
      assert(p > 0.0 && p <= 1.0, s"$w1 $w2: p_kn $p out of range")
      // KN redistributes at most D=0.75 mass per type: the smoothed
      // probability stays within 0.75/c1 + continuation mass of MLE
      val mle = c12.toDouble / c1
      assert(p <= mle + 0.75, s"$w1 $w2: p_kn $p vs mle $mle")
    }
  }

  test("ridge: matches driver-side closed-form solve on the same partials") {
    import spark.implicits._
    val (n, w1, w2, b0, lam) = Round13Ops7.mlRidgeClosedForm(spark, sf)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(lam === 1000.0)
    val per = Tables.lineitem(spark, sf)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("x1"),
        sum($"l_quantity".cast("int")).as("x2"),
        sum((Tables.money($"l_extendedprice") * 100).cast("long")).as("y"))
      .as[(Long, Long, Long, Long)].collect()
    assert(n === per.length.toLong)
    val nn = per.length.toDouble
    val sx1 = per.map(_._2).sum.toDouble; val sx2 = per.map(_._3).sum.toDouble
    val sy = per.map(_._4).sum.toDouble
    val a = per.map(r => r._2 * r._2).sum - sx1 * sx1 / nn + 1000.0
    val b = per.map(r => r._2 * r._3).sum - sx1 * sx2 / nn
    val c = per.map(r => r._3 * r._3).sum - sx2 * sx2 / nn + 1000.0
    val d = per.map(r => r._2 * r._4).sum - sx1 * sy / nn
    val e = per.map(r => r._3 * r._4).sum - sx2 * sy / nn
    val det = a * c - b * b
    assert(math.abs(w1 - (c * d - b * e) / det) < 1e-4, s"w1 $w1")
    assert(math.abs(w2 - (a * e - b * d) / det) < 1e-4, s"w2 $w2")
    assert(math.abs(b0 - (sy - w1 * sx1 - w2 * sx2) / nn) < 1e-2)
  }

  test("kmeans: clusters partition the points, centroids inside the data box") {
    import spark.implicits._
    val rows = Round13Ops7.mlKmeansSqlExact(spark, sf)
      .as[(Int, Long, Double, Double, Double)].collect()
    assert(rows.length === 3)
    assert(rows.map(_._2).sum === Tables.lineitem(spark, sf).count())
    rows.foreach { case (cid, np, cx, cy, inertia) =>
      assert(np > 0, s"cluster $cid empty")
      assert(cx >= 1.0 && cx <= 50.0, s"cluster $cid cx $cx")
      assert(cy > 0.0, s"cluster $cid cy $cy")
      assert(inertia >= 0.0)
    }
    // the seeds separate along y (price), so the converged centroids
    // must keep that order; x (quantity) does not separate clusters
    val byCid = rows.sortBy(_._1).map(_._4)
    assert(byCid.sorted.sameElements(byCid), "centroids crossed along y")
  }
}
