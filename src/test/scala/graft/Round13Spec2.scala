package graft

import graft.ops.Round13Ops2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 2: property pins for the stats/ML-prep batch —
  * identities the DuckDB oracle can't express (cross-row invariants,
  * reference recomputation in driver scala).
  */
class Round13Spec2 extends AnyFunSuite with SparkFixture {

  test("welch t: statistic sign matches the mean ordering, df between min(n)-1 and n1+n2-2") {
    import spark.implicits._
    val (n1, n2, m1, m2, t, df) = Round13Ops2.analyticWelchTtest(spark, sf)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(n1 > 1 && n2 > 1)
    assert((t > 0) == (m1 > m2))
    assert(df >= math.min(n1, n2) - 1 - 1e-9,
      s"Welch df $df below the min(n)-1 lower bound")
    assert(df <= n1 + n2 - 2 + 1e-9, s"Welch df $df above the pooled df")
  }

  test("mann-whitney: U_A + U_B identity and bounds") {
    import spark.implicits._
    val (na, nb, u2a, u2b) = Round13Ops2.analyticMannwhitneyU(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    assert(na > 0 && nb > 0)
    // ΣU identity: U_A + U_B = n_A * n_B (doubled here)
    assert(u2a + u2b === 2 * na * nb)
    assert(u2a >= 0 && u2a <= 2 * na * nb)
  }

  test("chi-square: expected counts reproduce marginals, contribs non-negative") {
    import spark.implicits._
    val rows = Round13Ops2.mlChiSquareSelect(spark, sf)
      .as[(String, Int, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, obs, e, c) =>
      assert(obs > 0 && e > 0 && c >= 0)
    }
    // Σ expected over a segment ≈ that segment's observed total
    // (cells with zero observed are absent, but this corpus populates
    // every (segment, nation) cell — guard and then assert equality)
    val segs = rows.groupBy(_._1)
    val nations = rows.map(_._2).distinct.length
    segs.foreach { case (s, cells) =>
      if (cells.length == nations) {
        val obsSum = cells.map(_._3).sum.toDouble
        val eSum = cells.map(_._4).sum
        assert(math.abs(obsSum - eSum) < 1e-3,
          s"segment $s: Σexpected $eSum != Σobserved $obsSum")
      }
    }
  }

  test("quantile bins: partition the table, sizes differ by at most 1, ranges ordered") {
    import spark.implicits._
    val bins = Round13Ops2.mlQuantileBins(spark, sf)
      .as[(Long, Long, Int, Int)].collect().sortBy(_._1)
    assert(bins.length === 10)
    val total = Tables.lineitem(spark, sf).count()
    assert(bins.map(_._2).sum === total)
    assert(bins.map(_._2).max - bins.map(_._2).min <= 1,
      "equal-frequency bins must differ by at most one row")
    bins.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3 || a._4 <= b._4,
        s"bin ${a._1} max ${a._4} should not exceed bin ${b._1}'s range")
    }
    bins.foreach { case (_, _, lo, hi) => assert(lo <= hi) }
  }

  test("crossval folds: five folds cover the table, train mean excludes the fold") {
    import spark.implicits._
    val folds = Round13Ops2.mlCrossvalFolds(spark, sf)
      .as[(Int, Long, Double, Double)].collect()
    assert(folds.length === 5)
    assert(folds.map(_._2).sum === Tables.orders(spark, sf).count())
    // reference: recompute fold-0 train mean directly
    val xs = Tables.orders(spark, sf)
      .select($"o_orderkey", Tables.money($"o_totalprice").cast("double"))
      .as[(Long, Double)].collect()
    val trainMean0 =
      xs.filter(_._1 % 5 != 0).map(_._2).sum / xs.count(_._1 % 5 != 0)
    val got = folds.find(_._1 === 0).get._3
    assert(math.abs(got - trainMean0) < 1e-3,
      s"fold-0 train mean $got vs reference $trainMean0")
    folds.foreach { case (_, _, _, rmse) => assert(rmse > 0) }
  }

  test("ab lift: rates reproduce from counts, z sign matches lift sign") {
    import spark.implicits._
    val r = Round13Ops2.analyticAbLift(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    val (ua, ca, ub, cb, ra, rb, lift, z) = r
    assert(ua > 0 && ub > 0 && ca <= ua && cb <= ub)
    assert(math.abs(ra - ca.toDouble / ua) < 1e-6)
    assert(math.abs(rb - cb.toDouble / ub) < 1e-6)
    assert((lift > 0) == (z > 0) || lift == 0)
  }

  test("fuzzy levenshtein: pairs verified by a reference edit-distance") {
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val got = Round13Ops2.joinFuzzyLevenshtein(spark, sf)
      .as[(String, String, Int)].collect()
    assert(got.nonEmpty, "the part-name lexicon should contain near-miss pairs")
    got.foreach { case (w1, w2, dist) =>
      assert(dist === lev(w1, w2), s"($w1,$w2): $dist != reference ${lev(w1, w2)}")
      assert(dist <= 2 && w1 < w2 && math.abs(w1.length - w2.length) <= 1)
    }
  }
}
