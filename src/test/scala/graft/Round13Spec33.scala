package graft

import graft.ops.Round13Ops33
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 33: LCS bounds/symmetry sanity, Page-Hinkley
  * invariants, radix roundtrips.
  */
class Round13Spec33 extends AnyFunSuite with SparkFixture {

  test("lcs: bounded by min length, f1 algebra holds") {
    import spark.implicits._
    val rows = Round13Ops33.textLcsRougel(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (da, db, na, nb, lcs, f1) =>
      assert(db === da + 1)
      assert(lcs >= 0 && lcs <= math.min(na, nb),
        s"pair ($da,$db): lcs $lcs outside [0, min($na,$nb)]")
      assert(math.abs(f1 - 2.0 * lcs / (na + nb)) < 1e-6)
    }
  }

  test("lcs: identical docs give lcs = n (self-pair probe)") {
    import spark.implicits._
    // a doc paired with itself must have LCS = token count; probe via
    // the DP on one doc against itself using the same tokenization
    val tk = Tables.documents(spark, sf).filter($"doc_id" === 0)
      .select(org.apache.spark.sql.functions.slice(
        org.apache.spark.sql.functions.split($"text", " "), 1, 24))
      .as[Seq[String]].head()
    // exact LCS of x with x is |x| by definition; validate our
    // wavefront algebra on a tiny local reference implementation
    def lcsRef(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = if (a(i - 1) == b(j - 1)) dp(i - 1)(j - 1) + 1
          else math.max(dp(i - 1)(j), dp(i)(j - 1))
      dp(a.length)(b.length)
    }
    assert(lcsRef(tk, tk) === tk.length)
    // and the Spark DP agrees with the reference on real pairs
    val pairs = Round13Ops33.textLcsRougel(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect().take(5)
    val docs = Tables.documents(spark, sf).filter($"doc_id" < 60)
      .select($"doc_id", org.apache.spark.sql.functions.slice(
        org.apache.spark.sql.functions.split($"text", " "), 1, 24))
      .as[(Long, Seq[String])].collect().toMap
    pairs.foreach { case (da, db, _, _, lcs, _) =>
      assert(lcs === lcsRef(docs(da), docs(db)).toLong,
        s"pair ($da,$db) disagrees with reference DP")
    }
  }

  test("page-hinkley: excess nonnegative, ph telescopes to zero") {
    import spark.implicits._
    val rows = Round13Ops33.tsPageHinkley(spark, sf)
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, _, excess, alarm) =>
      assert(excess >= 0)
      assert(alarm === 0L || alarm === 1L)
    }
    // n*cum_n - n*T = 0: the final PH statistic is exactly zero
    assert(rows.last._3 === 0L, "PH at the last day must telescope to 0")
  }

  test("base conv: roundtrips decode to the key") {
    import spark.implicits._
    val rows = Round13Ops33.fnBaseConv(spark, sf)
      .as[(Long, String, String, String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, hx, bn, b7, oc) =>
      assert(java.lang.Long.parseLong(hx, 16) === k)
      assert(java.lang.Long.parseLong(bn, 2) === k)
      assert(java.lang.Long.parseLong(b7, 7) === k)
      assert(java.lang.Long.parseLong(oc, 8) === k)
    }
  }
}
