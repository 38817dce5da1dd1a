package graft

import graft.ops.Round10Ops2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 2: triangle census, FP-Growth pairs, autocorrelation,
  * Observation metrics, exchange reuse, PCA, ALS.
  */
class Round10Spec2 extends AnyFunSuite with SparkFixture {

  test("triangle census matches a brute-force count on the same k-NN graph") {
    import spark.implicits._
    val got = Round10Ops2.graphTriangleCount(spark, sf)
      .as[(Long, Long)].collect().toMap
    // rebuild the graph driver-side from the raw relation
    val ps = Tables.lineitem(spark, sf)
      .select($"l_partkey", $"l_suppkey").distinct()
      .as[(Long, Long)].collect()
    val byPart = ps.groupBy(_._1).values
    val w = collection.mutable.Map.empty[(Long, Long), Long]
    byPart.foreach { sups =>
      val ids = sups.map(_._2)
      for (u <- ids; v <- ids if u != v)
        w((u, v)) = w.getOrElse((u, v), 0L) + 1L
    }
    // .toSeq before flatMap: flatMapping a Map with tuple results
    // would collapse to one edge per source node
    val top3 = w.keys.toSeq.groupBy(_._1).toSeq.flatMap { case (u, ks) =>
      ks.map { case (_, v) => (v, w((u, v))) }
        .sortBy { case (v, wt) => (-wt, v) }.take(3)
        .map { case (v, _) => (u, v) }
    }
    val und = top3.map { case (u, v) => (u min v, u max v) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val triCount = collection.mutable.Map.empty[Long, Long]
    for {
      (u, v) <- und
      z <- nodes if z > v && und((u, z)) && und((v, z))
    } Seq(u, v, z).foreach(n =>
      triCount(n) = triCount.getOrElse(n, 0L) + 1L)
    assert(got.nonEmpty, "the k-NN graph must contain triangles")
    assert(got === triCount.toMap)
  }

  test("FP-Growth pairs: frequencies are exact basket counts at the ceil threshold") {
    import spark.implicits._
    val got = Round10Ops2.mlFpmFrequentPairs(spark, sf)
      .as[(String, Option[String], Long)].collect()
    assert(got.nonEmpty)
    val baskets = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf), $"l_partkey" === $"p_partkey")
      .groupBy($"l_orderkey").agg(collect_set($"p_brand").as("items"))
      .as[(Long, Seq[String])].collect()
    val minCount = math.ceil(0.015625 * baskets.length).toLong
    val single = baskets.flatMap(_._2.distinct).groupBy(identity)
      .map { case (k, v) => k -> v.length.toLong }
    val pair = baskets.flatMap { case (_, its) =>
      val s = its.distinct.sorted
      for (i <- s.indices; j <- i + 1 until s.length) yield (s(i), s(j))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val expected =
      single.collect { case (i, f) if f >= minCount => (i, None, f) } ++
        pair.collect { case ((a, b), f) if f >= minCount =>
          (a, Some(b), f)
        }
    assert(got.toSet === expected.toSet,
      s"FP-Growth must report exactly the itemsets with freq >= $minCount")
  }

  test("autocorr: n_pairs = n-k per type and acf stays in [-1, 1]") {
    import spark.implicits._
    val got = Round10Ops2.tsAutocorr(spark, sf)
      .as[(String, Int, Long, Double)].collect()
    val n = Tables.events(spark, sf).groupBy($"event_type")
      .agg(count(lit(1))).as[(String, Long)].collect().toMap
    assert(got.length === n.size * 3)
    got.foreach { case (t, k, np, acf) =>
      assert(np === n(t) - k, s"$t lag $k: $np pairs for ${n(t)} rows")
      assert(acf >= -1.0 && acf <= 1.0 && !acf.isNaN)
    }
  }

  test("observed metrics equal a direct aggregate of the same corpus") {
    import spark.implicits._
    val got = Round10Ops2.pipelineObserveMetrics(spark, sf)
      .as[(Long, Long, Long, Long)].head()
    val direct = Tables.documents(spark, sf).agg(
      count(lit(1)), count(when(length($"text") > 500, 1)),
      count(when($"lang" === "en", 1)),
      sum(size(split($"text", " ")).cast("long")))
      .as[(Long, Long, Long, Long)].head()
    assert(got === direct)
  }

  test("MoM growth: every row's prev month really is the calendar predecessor") {
    import spark.implicits._
    val rows = Round10Ops2.scaleExchangeReuse(spark, sf)
      .as[(Int, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (ym, rev, prev, growth) =>
      assert(rev > 0 && prev > 0)
      assert(math.abs(growth - math.rint((rev - prev) / prev * 1e6) / 1e6)
        < 1e-9 || math.abs(growth - (rev - prev) / prev) < 1e-6)
    }
    // months form a contiguous-ish chain: every listed ym has a valid
    // predecessor month by construction of the join
    val yms = rows.map(_._1).toSet
    rows.foreach { case (ym, _, _, _) =>
      val prevYm = if (ym % 100 == 1) ym - 89 else ym - 1
      assert(!yms.contains(ym) || prevYm > 0)
    }
  }

  test("PCA: explained variance is sorted and projections carry it") {
    import spark.implicits._
    val got = Round10Ops2.mlPcaProject(spark, sf)
    assert(got.columns.toSeq ===
      Seq("vec_id", "label") ++ (1 to 8).map(i => s"pc$i"))
    val n = Tables.embeddings(spark, sf).count()
    assert(got.count() === n)
    // variance along pc1 >= pc2 >= ... (the defining PCA property)
    val vars = (1 to 8).map(i =>
      got.agg(var_samp(col(s"pc$i"))).as[Double].head())
    vars.sliding(2).foreach { case Seq(a, b) =>
      assert(a >= b - 1e-9, s"component variances must be sorted: $vars")
    }
  }

  test("ALS: deterministic re-run, 2 ranked recs per user") {
    import spark.implicits._
    val a = Round10Ops2.mlAlsRecommend(spark, sf)
      .as[(Long, Int, String)].collect().toSeq
    val users = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(a.length === users * 2, "every user gets exactly 2 recs")
    a.groupBy(_._1).foreach { case (_, recs) =>
      assert(recs.map(_._2).sorted === Seq(1, 2))
      assert(recs.map(_._3).distinct.length === 2)
    }
    val types = Tables.events(spark, sf).select($"event_type").distinct()
      .as[String].collect().toSet
    assert(a.map(_._3).toSet.subsetOf(types))
    val b = Round10Ops2.mlAlsRecommend(spark, sf)
      .as[(Long, Int, String)].collect().toSeq
    assert(a === b, "seed-pinned ALS must be deterministic across runs")
  }
}
