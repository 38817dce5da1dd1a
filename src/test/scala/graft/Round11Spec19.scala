package graft

import graft.ops.Round11Ops22
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 22: LATERAL top-k, exact global quantiles,
  * BPE merges, lang-id confusion, delta attribution, slugify. */
class Round11Spec19 extends AnyFunSuite with SparkFixture {

  test("lateral topk: at most 3 orders per customer, descending cents") {
    import spark.implicits._
    val rows = Round11Ops22.sqlLateralTopk(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= 3)
      val cents = g.map(_._3)
      cents.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) >= w(1))
      }
    }
  }

  test("exact global quantiles: match a driver-side sort") {
    import spark.implicits._
    val rows = Round11Ops22.aggExactGlobalMedian(spark, sf)
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    val xs = Tables.lineitem(spark, sf)
      .select($"l_extendedprice").as[Double].collect().sorted
    assert(rows.head._2 === xs.length)
    rows.foreach { case (q, n, v) =>
      val r = ((q.toLong * n + 99) / 100).toInt
      assert(v === xs(r - 1), s"q=$q rank=$r")
    }
  }

  test("bpe merges: 8 distinct merges, symbol count shrinks") {
    import spark.implicits._
    val rows = Round11Ops22.mlBpeTrainMerges(spark, sf)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 8))
    rows.foreach { case (_, a, b, c) =>
      assert(a.nonEmpty && b.nonEmpty && c > 0)
    }
    assert(rows.map(r => (r._2, r._3)).distinct.length === 8,
      "no pair merged twice")
    // merged symbols later reappear as sides of deeper merges or stay
    // final; the first merge is built from single characters
    assert(rows.head._2.length === 1 && rows.head._3.length === 1)
  }

  test("langid confusion: cells reconcile to the doc count, shares to 1") {
    import spark.implicits._
    val rows = Round11Ops22.textLangidConfusion(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.map(_._3).sum === Tables.documents(spark, sf).count())
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(math.abs(g.map(_._4).sum - 1.0) < 1e-4)
    }
  }

  test("delta attribution: per-day shares sum to 1 when total nonzero") {
    import spark.implicits._
    val rows = Round11Ops22.tsDeltaAttribution(spark, sf)
      .as[(Date, String, Long, Long, Long, Option[Double])].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val tot = g.head._5
      assert(g.map(_._4).sum === tot, "type deltas sum to the day total")
      if (tot != 0) {
        assert(math.abs(g.flatMap(_._6).sum - 1.0) < 1e-3)
      } else {
        assert(g.forall(_._6.isEmpty))
      }
    }
  }

  test("slugify: only [a-z0-9-], no edge or doubled hyphens") {
    import spark.implicits._
    val rows = Round11Ops22.fnSlugify(spark, sf)
      .as[(Long, String, String)].collect()
    assert(rows.length === Tables.part(spark, sf).count())
    val re = "^[a-z0-9]+(-[a-z0-9]+)*$".r
    rows.foreach { case (_, name, slug) =>
      assert(slug.isEmpty || re.matches(slug), s"'$name' -> '$slug'")
    }
  }
}
