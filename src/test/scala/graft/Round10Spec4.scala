package graft

import graft.ops.Round10Ops4
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 4: degree census, bounded BFS, blocked edit-distance
  * dedup, cosine range search, hapax ratio, CUSUM.
  */
class Round10Spec4 extends AnyFunSuite with SparkFixture {

  test("degree distribution: bounded by 2k thinning, node count conserved") {
    import spark.implicits._
    val rows = Round10Ops4.graphDegreeDistribution(spark, sf)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    // top-3 per node symmetrized: degree can exceed 3 (incoming picks)
    // but is bounded by the supplier count; all degrees >= 1
    rows.foreach { case (deg, n) => assert(deg >= 1 && n >= 1) }
    val nSupp = Tables.supplier(spark, sf).count()
    assert(rows.map(_._2).sum <= nSupp)
  }

  test("shortest path: seed at 0, neighbours at 1, triangle inequality on edges") {
    import spark.implicits._
    val dist = Round10Ops4.graphShortestPath(spark, sf)
      .as[(Long, Int)].collect().toMap
    val seed = dist.minBy(_._2)
    assert(seed._2 === 0, "seed node must be at distance 0")
    assert(dist.values.forall(d => d >= 0 && d <= 4))
    assert(dist.values.count(_ == 1) >= 1, "seed must have neighbours")
    // every edge (u,v) with both ends reached satisfies |d(u)-d(v)| <= 1
    val und = Round10Ops4.graphShortestPath(spark, sf) // distances again
    val ps = Tables.lineitem(spark, sf)
      .select($"l_partkey".as("p"), $"l_suppkey".as("s")).distinct()
    // rebuild thinned edges driver-side (same construction as the op)
    val w = ps.as("a").join(ps.as("b"),
        $"a.p" === $"b.p" && $"a.s" =!= $"b.s")
      .groupBy($"a.s".as("u"), $"b.s".as("v"))
      .agg(count(lit(1)).as("w"))
    val topk = w.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"u").orderBy($"w".desc, $"v")))
      .filter($"rk" <= 3)
      .select(least($"u", $"v").as("u"), greatest($"u", $"v").as("v"))
      .distinct().as[(Long, Long)].collect()
    topk.foreach { case (u, v) =>
      (dist.get(u), dist.get(v)) match {
        case (Some(du), Some(dv)) =>
          assert(math.abs(du - dv) <= 1 || du == 4 || dv == 4,
            s"edge ($u,$v): dist $du vs $dv violates BFS levels")
        case _ => // one end beyond the 4-hop horizon
      }
    }
  }

  test("blocked edit dedup: pairs share a block and distance is symmetric-bounded") {
    import spark.implicits._
    val rows = Round10Ops4.dedupBlockingEdit(spark, sf)
      .as[(Long, Long, String, Int)].collect()
    assert(rows.forall { case (a, b, _, d) => a < b && d >= 0 && d <= 25 })
    // verify a sample pair against a driver-side Levenshtein
    if (rows.nonEmpty) {
      val (a, b, _, d) = rows.head
      val txt = Tables.documents(spark, sf)
        .filter($"doc_id".isin(a, b))
        .select($"doc_id", substring($"text", 1, 60).as("p"))
        .as[(Long, String)].collect().toMap
      def lev(s: String, t: String): Int = {
        val dp = Array.tabulate(s.length + 1, t.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to s.length; j <- 1 to t.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (s(i - 1) == t(j - 1)) 0 else 1))
        dp(s.length)(t.length)
      }
      assert(lev(txt(a), txt(b)) === d)
    }
  }

  test("range search: exactly the vectors the exact top-k scan would admit") {
    import spark.implicits._
    val got = Round10Ops4.simRangeSearch(spark, sf)
      .as[(Long, Double)].collect()
    assert(got.forall(_._2 >= 0.15))
    // results sorted desc and unique per vec_id
    assert(got.map(_._2).sliding(2).forall(w =>
      w.length < 2 || w(0) >= w(1)))
    assert(got.map(_._1).distinct.length === got.length)
    // cross-check count against knn-style brute force via the same kernel
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val t = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding",
        sqrt(expr("graft_dot(embedding, embedding)")).as("nrm"))
    val probe = t.filter($"vec_id" === 0)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    val n = t.filter($"vec_id" =!= 0).crossJoin(probe)
      .withColumn("c", round(expr("graft_dot(embedding, pe)") / ($"nrm" * $"pn"), 6))
      .filter($"c" >= 0.15).count()
    assert(n === got.length)
  }

  test("hapax ratio: 5 langs, hapax <= vocab, ratio consistent") {
    import spark.implicits._
    val rows = Round10Ops4.textHapaxRatio(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._1).sorted === Array("de", "en", "es", "fr", "zh"))
    rows.foreach { case (_, v, h, r) =>
      assert(h <= v && v > 0)
      assert(math.abs(r - math.rint(h.toDouble / v * 1e6) / 1e6) < 1e-9)
    }
  }

  test("cusum: excursions bracket zero and n covers each type") {
    import spark.implicits._
    val rows = Round10Ops4.tsCusum(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    val counts = Tables.events(spark, sf).groupBy($"event_type")
      .agg(count(lit(1))).as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet === counts.keySet)
    rows.foreach { case (t, n, up, down) =>
      assert(n === counts(t))
      // the final prefix equals the total, so D_n = 0 — both the max
      // and the min bracket zero
      assert(up >= 0.0 && down <= 0.0, s"$t: [$down, $up] must bracket 0")
    }
  }
}
