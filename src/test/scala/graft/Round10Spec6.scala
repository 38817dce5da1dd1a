package graft

import graft.ops.Round10Ops6
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 6: cohort LTV, SQL sessionization, sparse TF-IDF
  * pairs.
  */
class Round10Spec6 extends AnyFunSuite with SparkFixture {

  test("cohort ltv: curves are monotone and offset-0 covers every cohort") {
    import spark.implicits._
    val rows = Round10Ops6.analyticCohortLtv(spark, sf)
      .as[(Int, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (cohort, curve) =>
      val sorted = curve.sortBy(_._2)
      assert(sorted.head._2 === 0,
        s"cohort $cohort must start at offset 0 (its members' first orders)")
      // cumulative revenue per customer never decreases
      sorted.map(_._4).sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) <= w(1) + 1e-9)
      }
      assert(curve.map(_._3).distinct.length === 1,
        "cohort size is constant across the curve")
    }
    // cohort sizes sum to the customer count
    val sizes = byCohort.map { case (_, c) => c.head._3 }.sum
    assert(sizes === Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count())
  }

  test("sessionize: gaps within sessions <= 30min, session ids dense per user") {
    import spark.implicits._
    val rows = Round10Ops6.analyticSessionizeSql(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(rows.map(_._3).sum === Tables.events(spark, sf).count(),
      "every event lands in exactly one session")
    rows.groupBy(_._1).foreach { case (_, sessions) =>
      val ids = sessions.map(_._2).sorted
      assert(ids.head === 1 && ids === (1L to ids.length).toArray,
        "session ids are dense from 1 per user")
    }
    rows.foreach { case (_, _, n, dur, ft) =>
      assert(n >= 1 && dur >= 0 && ft.nonEmpty)
      if (n == 1) assert(dur === 0)
    }
  }

  test("sparse tfidf pairs: cosines in (0,1], pairs share a rare term, sorted") {
    import spark.implicits._
    val rows = Round10Ops6.simSparseTfidfPairs(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (a, b, c) =>
      assert(a < b)
      assert(c > 0.0 && c <= 1.0 + 1e-9)
    }
    assert(rows.map(_._3).sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)), "sorted by cosine desc")
    // spot-check the top pair really shares a bigram with df in [2,5]
    val (a, b, _) = rows.head
    val bigrams = Tables.documents(spark, sf)
      .select($"doc_id", split($"text", " ").as("t"))
      .select($"doc_id",
        explode(expr(graft.ops.TextExprs.bigrams("t"))).as("bg"))
      .distinct()
    val bdf = bigrams.groupBy($"bg").agg(count(lit(1)).as("bdf"))
    val shared = bigrams.filter($"doc_id".isin(a, b))
      .join(bdf, "bg")
      .filter($"bdf" >= 2 && $"bdf" <= 5)
      .groupBy($"bg").agg(countDistinct($"doc_id").as("nd"))
      .filter($"nd" === 2).count()
    assert(shared >= 1, s"pair ($a,$b) must share a rare bigram")
  }
}
