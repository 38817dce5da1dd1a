package graft

import graft.ops.{Round11Ops, Round11Ops2}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Round-11 widening: graph link prediction / projection / k-core,
  * SQL-expressible ML metrics, cross-correlation + peak detection,
  * Zipf slope, stopword coverage, integrity and entropy audits,
  * stream-static join and stream-union merge (with real streaming
  * twins), shuffle-hash strategy, MIPS / Hamming top-k, linear
  * regression and GMM.
  */
class Round11Spec extends AnyFunSuite with SparkFixture {

  test("adamic-adar: scores positive, common-neighbour counts match score bounds") {
    import spark.implicits._
    val rows = Round11Ops.graphAdamicAdar(spark, sf)
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, nc, s, _) =>
      assert(a < b && nc >= 1)
      // each common neighbour contributes 1/ln(deg) with deg >= 2:
      // nc/ln(maxdeg) <= s <= nc/ln(2)
      assert(s > 0 && s <= nc / math.log(2.0) + 1e-9)
    }
    // ordered by score desc
    assert(rows.map(_._4).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("bipartite projection: bounded by brand-pair count, symmetric construction") {
    import spark.implicits._
    val rows = Round11Ops.graphBipartiteProject(spark, sf)
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty && rows.length <= 25 * 24 / 2)
    rows.foreach { case (a, b, n) => assert(a < b && n >= 1) }
  }

  test("k-core peel: surviving nodes all have degree >= 2, subset of original nodes") {
    import spark.implicits._
    val rows = Round11Ops.graphKcorePeel(spark, sf)
      .as[(Long, Long)].collect()
    // 4 peel rounds with k=2: every surviving node has >= 2 surviving
    // neighbours (degree in the peeled subgraph)
    rows.foreach { case (_, d) => assert(d >= 2) }
  }

  test("auc rank: in [0,1], positive/negative counts partition the table") {
    import spark.implicits._
    val (auc, np, nn) = Round11Ops.mlAucRank(spark, sf)
      .as[(Double, Long, Long)].head()
    assert(auc >= 0.0 && auc <= 1.0)
    assert(np + nn === Tables.embeddings(spark, sf).count())
  }

  test("confusion metrics: counts partition, f1 consistent with p/r") {
    import spark.implicits._
    val r = Round11Ops.mlConfusionMetrics(spark, sf).collect().head
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(tp + fp + fn + tn === Tables.embeddings(spark, sf).count())
    val f1 = r.getDouble(7)
    val expected = 2.0 * tp / (2.0 * tp + fp + fn)
    assert(math.abs(f1 - math.rint(expected * 1e6) / 1e6) < 1e-9)
  }

  test("chi-square: dof 8 for the 5x3 table, statistic non-negative") {
    import spark.implicits._
    val (chi2, dof, n) = Round11Ops.mlChiSquare(spark, sf)
      .as[(Double, Long, Long)].head()
    assert(chi2 >= 0.0)
    assert(dof === 8L)
    assert(n === Tables.orders(spark, sf).count())
  }

  test("cross-correlation: 7 lags, values in [-1,1], lag key arithmetic holds") {
    import spark.implicits._
    val rows = Round11Ops.tsCrossCorrelation(spark, sf)
      .as[(Int, Long, Double)].collect()
    assert(rows.map(_._1).toSeq.sorted === (-3 to 3).toSeq)
    rows.foreach { case (_, n, c) =>
      assert(n > 0 && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("peak detect: each reported hour strictly beats its neighbours") {
    import spark.implicits._
    val peaks = Round11Ops.tsPeakDetect(spark, sf)
      .as[(String, Timestamp, Double)].collect()
    assert(peaks.nonEmpty)
    // reconstruct the hourly series and check the peak property
    val series = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", $"ts").as("hr"), $"event_type")
      .agg(sum($"value".cast("decimal(12,2)")).as("sv"))
      .as[(Timestamp, String, java.math.BigDecimal)].collect()
      .groupBy(_._2).view.mapValues(_.sortBy(_._1.getTime)).toMap
    peaks.take(20).foreach { case (et, hr, v) =>
      val s = series(et); val i = s.indexWhere(_._1 == hr)
      assert(i > 0 && i < s.length - 1)
      assert(s(i)._3.doubleValue > s(i - 1)._3.doubleValue)
      assert(s(i)._3.doubleValue > s(i + 1)._3.doubleValue)
      assert(math.abs(v - s(i)._3.doubleValue) < 1e-9)
    }
  }

  test("product logsum: geomean consistent with log_sum, factors > 1") {
    import spark.implicits._
    val rows = Round11Ops.aggProductLogsum(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.length === 5)
    rows.foreach { case (_, n, ls, gm) =>
      assert(ls > 0 && gm > 1.0) // every factor 1 + v/1000 > 1
      assert(math.abs(gm - math.rint(math.exp(ls / n) * 1e6) / 1e6) < 1e-5)
    }
  }

  test("prefix cluster: clusters >= 2, canonical is min member") {
    import spark.implicits._
    val rows = Round11Ops.dedupPrefixCluster(spark, sf)
      .as[(String, Long, Long)].collect()
    rows.foreach { case (p, n, canon) =>
      assert(p.length <= 16 && n >= 2)
      val members = Tables.documents(spark, sf)
        .filter(substring($"text", 1, 16) === p)
        .agg(min($"doc_id"), count(lit(1))).as[(Long, Long)].head()
      assert(members === ((canon, n)))
    }
  }

  test("stopword coverage: ratios in (0,1), token counts add up per source") {
    import spark.implicits._
    val rows = Round11Ops2.textStopwordCoverage(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nd, nt, ns, r) =>
      assert(nd > 0 && ns <= nt)
      assert(r > 0.0 && r < 1.0) // top-20 tokens cover some but not all
    }
    val totalTokens = rows.map(_._3).sum
    val direct = Tables.documents(spark, sf)
      .select(explode(split($"text", " "))).count()
    assert(totalTokens === direct)
  }

  test("referential integrity: all 7 star-schema FK edges, zero orphans in testdata") {
    import spark.implicits._
    val rows = Round11Ops2.pipelineReferentialIntegrity(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length === 7)
    rows.foreach { case (rel, nc, no) =>
      assert(nc > 0, rel)
      assert(no === 0L, s"$rel unexpectedly has orphans")
    }
  }

  test("column entropy: 0 <= H <= ln(n_distinct)") {
    import spark.implicits._
    val rows = Round11Ops2.pipelineColumnEntropy(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.length === 6)
    rows.foreach { case (t, c, nd, h) =>
      assert(h >= -1e-9, s"$t.$c")
      assert(h <= math.log(nd.toDouble) + 1e-9, s"$t.$c: H > ln(n_distinct)")
    }
  }

  test("stream static join: event counts conserved (user domain ⊂ custkey domain)") {
    import spark.implicits._
    val rows = Round11Ops2.streamStaticJoin(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._2).sum === Tables.events(spark, sf).count(),
      "every event's user_id must resolve to a customer")
  }

  test("stream union merge: equals direct filtered aggregate") {
    import spark.implicits._
    val viaUnion = Round11Ops2.streamUnionMerge(spark, sf)
      .agg(sum($"n")).as[Long].head()
    val direct = Tables.events(spark, sf)
      .filter($"event_type".isin("click", "purchase")).count()
    assert(viaUnion === direct)
  }

  test("static-join stream twin: per-trigger dimension join enriches a MemoryStream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val dim = Seq((1L, "AUTOMOBILE"), (2L, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val q = Round11Ops2.staticJoinStream(
        ms.toDF().toDF("user_id", "event_type"), dim)
      .writeStream.format("memory").queryName("sjoin")
      .outputMode("complete").start()
    try {
      ms.addData((1L, "click"), (1L, "view"), (2L, "click"), (99L, "click"))
      q.processAllAvailable()
      val got = spark.table("sjoin").as[(String, Long)].collect().toMap
      assert(got === Map("AUTOMOBILE" -> 2L, "BUILDING" -> 1L),
        "inner join must drop the unmatched user and group by segment")
    } finally q.stop()
  }

  test("union-merge stream twin: two sources merge into one windowed aggregate") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = Timestamp.valueOf(s)
    val a = MemoryStream[Ev]; val b = MemoryStream[Ev]
    val q = Round11Ops2.unionMergeStream(a.toDF(), b.toDF())
      .select($"window.start".as("ws"), $"event_type", $"count")
      .writeStream.format("memory").queryName("umerge")
      .outputMode("complete").start()
    try {
      a.addData(Ev(1, ts("2024-01-01 00:05:00"), 1, "click", 1.0))
      b.addData(Ev(2, ts("2024-01-01 00:10:00"), 1, "purchase", 1.0),
        Ev(3, ts("2024-01-01 00:20:00"), 2, "click", 1.0))
      q.processAllAvailable()
      val got = spark.table("umerge").as[(Timestamp, String, Long)].collect()
      assert(got.toSet === Set(
        (ts("2024-01-01 00:00:00"), "click", 2L),
        (ts("2024-01-01 00:00:00"), "purchase", 1L)),
        "both sources must land in the same hour window")
    } finally q.stop()
  }

  test("mips top-k: descending inner products, probe excluded") {
    import spark.implicits._
    val rows = Round11Ops2.simMipsTopk(spark, sf)
      .as[(Long, Double)].collect()
    assert(rows.length === 10)
    assert(!rows.map(_._1).contains(1L))
    assert(rows.map(_._2).sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  test("hamming top-k: 3 per probe, distances ascend within probe, bounded by 32 bits") {
    import spark.implicits._
    val rows = Round11Ops2.simHammingTopk(spark, sf)
      .as[(Long, Long, Int, Int)].collect()
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byProbe.values.foreach { g =>
      assert(g.length === 3)
      val ds = g.sortBy(_._4).map(_._3)
      assert(ds.sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
      ds.foreach(d => assert(d >= 0 && d <= 32))
    }
  }

  test("linear regression: deterministic re-run, finite R²") {
    import spark.implicits._
    val a = Round11Ops2.mlLinearRegression(spark, sf).collect().head
    val b = Round11Ops2.mlLinearRegression(spark, sf).collect().head
    assert(a === b, "normal-equation solve must be run-to-run deterministic")
    val r2 = a.getDouble(4)
    assert(!r2.isNaN && r2 <= 1.0)
  }

  test("gmm: deterministic re-run, cluster sizes partition the corpus") {
    import spark.implicits._
    val a = Round11Ops2.mlGmmCluster(spark, sf).as[(Int, Long)].collect()
    val b = Round11Ops2.mlGmmCluster(spark, sf).as[(Int, Long)].collect()
    assert(a.toSeq === b.toSeq, "seeded GMM must be run-to-run deterministic")
    assert(a.map(_._2).sum === Tables.embeddings(spark, sf).count())
    assert(a.map(_._1).toSet.subsetOf(Set(0, 1, 2)))
  }

  test("shuffle-hash join demo: revenue equals the sort-merge formulation") {
    import spark.implicits._
    val viaHash = Round11Ops2.scaleShuffleHashJoin(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    val viaMerge = Tables.lineitem(spark, sf).hint("merge")
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum($"l_extendedprice".cast("decimal(12,2)") *
          (lit(1).cast("decimal(4,2)") - $"l_discount".cast("decimal(4,2)")))
          .as("_rev"))
      .select($"o_orderpriority", $"n_items",
        $"_rev".cast("double").as("revenue"))
      .orderBy($"o_orderpriority")
      .as[(String, Long, Double)].collect().toSeq
    assert(viaHash === viaMerge)
  }

  test("lorenz/gini: deciles partition customers, shares ascend to 1, gini in [0,1)") {
    import spark.implicits._
    val rows = graft.ops.Round11Ops4.analyticLorenzGini(spark, sf)
      .select($"decile", $"n_cust", $"cum_share", $"gini")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === (1 to 10))
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(rows.map(_._2).sum === nCust)
    assert(rows.map(_._3).sliding(2).forall(p => p(0) <= p(1)),
      "Lorenz cumulative shares must be nondecreasing")
    assert(math.abs(rows.last._3 - 1.0) < 1e-9)
    val g = rows.head._4
    assert(g >= 0.0 && g < 1.0, s"gini $g outside [0,1)")
  }

  test("markov transitions: per-from probabilities sum to 1, counts conserve pairs") {
    import spark.implicits._
    val rows = graft.ops.Round11Ops4.analyticMarkovTransitions(spark, sf)
      .as[(String, String, Long, Double)].collect()
    rows.groupBy(_._1).foreach { case (from, ts) =>
      val sum = ts.map(_._4).sum
      assert(math.abs(sum - 1.0) < 1e-4, s"$from: P row sums to $sum")
    }
    val nPairs = rows.map(_._3).sum
    val expected = Tables.events(spark, sf).count() -
      Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(nPairs === expected, "one transition per event except each user's last")
  }

  test("ndcg: ideal ranking bounds the real one (ndcg in (0,1]), gains discount") {
    import spark.implicits._
    val rows = graft.ops.Round11Ops4.mlNdcgBm25(spark, sf)
      .select($"pos", $"rel", $"gain", $"ndcg")
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.length === 15)
    val ndcg = rows.head._4
    assert(ndcg > 0.0 && ndcg <= 1.0, s"ndcg $ndcg outside (0,1]")
    rows.foreach { case (pos, rel, gain, _) =>
      assert(math.abs(gain - rel / (math.log(pos + 1.0) / math.log(2.0))) < 1e-6)
    }
  }

  test("calibration bins cover all events; log loss beats neither oracle nor chance wildly") {
    import spark.implicits._
    val bins = graft.ops.Round11Ops4.mlCalibrationBins(spark, sf)
      .select($"n", $"mean_p").as[(Long, Double)].collect()
    assert(bins.map(_._1).sum === Tables.events(spark, sf).count())
    assert(bins.forall(b => b._2 >= 0.0 && b._2 <= 1.0))
    // the pseudo-scores are independent of the labels, so per-type log
    // loss must sit near -[q ln q̄ + (1-q) ln(1-q̄)]-ish chance levels,
    // far from 0 (a perfect model) — guards against the score/label
    // wiring silently inverting or constant-folding
    val ll = graft.ops.Round11Ops4.mlLogLoss(spark, sf)
      .select($"log_loss").as[Double].collect()
    assert(ll.forall(v => v > 0.2 && v < 5.0), s"implausible log loss: ${ll.toSeq}")
  }

  test("clustering coefficients in [0,1] and consistent with the degree census") {
    import spark.implicits._
    val rows = graft.ops.Round11Ops4.graphClusteringCoeff(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (node, deg, tri, c) =>
      assert(deg >= 2)
      assert(tri <= deg * (deg - 1) / 2, s"node $node: $tri triangles > C($deg,2)")
      assert(c >= 0.0 && c <= 1.0)
    }
  }
}
