package graft

import graft.ops.Round14Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 widening: CBO stats surface, theta forecast,
  * Mann-Whitney U. */
class Round14Spec extends AnyFunSuite with SparkFixture {

  test("cbo stats: catalog row counts equal direct counts") {
    import spark.implicits._
    val rows = Round14Ops.scaleCboStats(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(rows.length === 6)
    rows.foreach { case (tbl, _, nRows, nNulls, minK, maxK) =>
      assert(nRows === Tables(spark, sf, tbl).count(), s"$tbl row count")
      assert(nNulls === 0L)
      assert(minK === 0L, s"$tbl min key")
      // lineitem's stats column (l_orderkey) is a FOREIGN key — its
      // max is the orders key span, not the lineitem row count
      if (tbl != "lineitem")
        assert(maxK === nRows - 1, s"$tbl keys contiguous 0..n-1")
    }
  }

  test("theta forecast: 7 horizons, finite, and continuous with the series scale") {
    import spark.implicits._
    val f = Round14Ops.tsThetaForecast(spark, sf)
      .as[(Long, Double)].collect()
    assert(f.map(_._1).toSeq === (1L to 7L))
    // daily revenue is positive and roughly stationary; the theta
    // forecast must stay within an order of magnitude of the daily
    // mean (catches sign/derivation errors without pinning values)
    val dailyMean = Tables.events(spark, sf)
      .groupBy(to_date($"ts")).agg(sum($"value").as("y"))
      .agg(avg($"y")).as[Double].head()
    f.foreach { case (h, v) =>
      assert(v.isFinite && v > 0, s"h=$h forecast $v")
      assert(v > dailyMean * 100 * 0.2 && v < dailyMean * 100 * 5,
        s"h=$h forecast $v vs daily-mean cents ${dailyMean * 100}")
    }
  }

  test("odds ratio: cells partition the filtered events and the CI brackets the OR") {
    import spark.implicits._
    val Array((a, b, c, d, or, lo, hi)) =
      graft.ops.Round14Ops2.analyticOddsRatio(spark, sf)
        .as[(Long, Long, Long, Long, Double, Double, Double)].collect()
    val total = Tables.events(spark, sf)
      .filter($"event_type".isin("purchase", "view")).count()
    assert(a + b + c + d === total, "2x2 cells must partition the events")
    assert(lo < or && or < hi, s"CI [$lo, $hi] must bracket OR $or")
    assert(lo > 0, "Woolf CI is positive by construction")
  }

  test("permutation importance: base row present, permuted accuracy <= base + noise") {
    import spark.implicits._
    val rows = graft.ops.Round14Ops2.mlPermutationImportance(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.map(_._1).sorted.toSeq ===
      Seq("base", "block0", "block1", "block2", "block3"))
    val base = rows.find(_._1 == "base").get
    assert(base._5 === 0.0, "base importance is zero by definition")
    val n = Tables.embeddings(spark, sf).count()
    rows.foreach { case (v, nr, nc, acc, imp) =>
      assert(nr === n, s"$v classifies every vector")
      assert(nc >= 0 && nc <= nr && acc >= 0 && acc <= 1)
      // a permuted block can only help by chance; allow a small
      // negative-importance noise band rather than pinning values
      if (v != "base") assert(imp > -0.15, s"$v importance $imp")
    }
  }

  test("misra-gries: eviction path keeps the guarantee on a skewed stream") {
    import spark.implicits._
    // 1 key with 50% of the mass + 1000 singleton tail keys, k = 8 —
    // cardinality >> k forces constant eviction, the path the
    // uniform-corpus op never exercises
    val stream = (Seq.fill(1000)("heavy") ++ (0 until 1000).map(i => s"t$i"))
    val ds = spark.createDataset(stream).repartition(8)
    val mg = new graft.ops.Round14Ops3.MisraGries(8)
    val cands = ds.select(mg.toColumn.name("c")).head()
    // no-false-negative: any key above N/(k+1) = 2000/9 ≈ 222 must
    // survive every reduce/merge order
    assert(cands.contains("heavy"), s"heavy key evicted: $cands")
    assert(cands.size <= 8, s"summary exceeded k: ${cands.size}")
  }

  test("misra-gries topk op: output equals the exact heavy-hitter census") {
    import spark.implicits._
    val rows = graft.ops.Round14Ops3.aggMisraGriesTopk(spark, sf)
      .as[(String, Long, Long)].collect()
    val exact = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
      .crossJoin(Tables.lineitem(spark, sf)
        .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
        .agg(count(lit(1)).as("nt")))
      .filter($"n" * 32 > $"nt")
      .select($"p_brand").as[String].collect().sorted
    assert(rows.map(_._1).toSeq === exact.toSeq)
    assert(rows.nonEmpty, "uniform brand distribution must still clear 1/32")
  }

  test("mann-whitney: U within [0, m*n] and z matches the brute-force pair count") {
    import spark.implicits._
    val Array((m, n, u, z)) = Round14Ops.analyticMannWhitneyU(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(u >= 0 && u <= m.toDouble * n, s"U=$u outside [0, ${m * n}]")
    assert(z.isFinite)
    // brute-force 2U on the same values (small at spec SF)
    val ev = Tables.events(spark, sf)
      .filter($"event_type".isin("purchase", "view"))
      .select($"event_type", (Tables.money($"value") * 100).cast("long").as("v"))
      .as[(String, Long)].collect()
    val xs = ev.filter(_._1 == "purchase").map(_._2)
    val ys = ev.filter(_._1 == "view").map(_._2)
    var twoU = 0L
    for (x <- xs; y <- ys) {
      if (x > y) twoU += 2 else if (x == y) twoU += 1
    }
    assert(u === twoU / 2.0, s"bucketed U=$u vs brute-force ${twoU / 2.0}")
  }
}
