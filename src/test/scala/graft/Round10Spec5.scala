package graft

import graft.ops.Round10Ops5
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 part 5: skyline, changepoint, skew report, n-gram
  * novelty, Gaussian naive Bayes.
  */
class Round10Spec5 extends AnyFunSuite with SparkFixture {

  test("skyline: members are mutually non-dominated and dominate everything else") {
    import spark.implicits._
    val sky = Round10Ops5.analyticSkyline2d(spark, sf)
      .as[(Long, Double, Int)].collect()
    val all = Tables.part(spark, sf)
      .select($"p_partkey", $"p_retailprice", $"p_size")
      .as[(Long, Double, Int)].collect()
    def dominates(a: (Long, Double, Int), b: (Long, Double, Int)) =
      a._2 <= b._2 && a._3 <= b._3 && (a._2 < b._2 || a._3 < b._3)
    val expected = all.filter(b => !all.exists(a => dominates(a, b)))
      .map(_._1).toSet
    assert(sky.map(_._1).toSet === expected,
      "two-phase sweep must equal the brute-force skyline")
    assert(sky.nonEmpty)
  }

  test("changepoint: k_star is the argmax of |cusum| with smallest-k ties") {
    import spark.implicits._
    val rows = Round10Ops5.tsChangepoint(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    val counts = Tables.events(spark, sf).groupBy($"event_type")
      .agg(count(lit(1))).as[(String, Long)].collect().toMap
    assert(rows.map(_._1).toSet === counts.keySet)
    rows.foreach { case (t, n, k, exc) =>
      assert(n === counts(t))
      assert(k >= 1 && k <= n)
      assert(!exc.isNaN)
    }
  }

  test("skew report: totals and percentiles are internally consistent") {
    import spark.implicits._
    val r = Round10Ops5.pipelineSkewReport(spark, sf).collect().head
    val nKeys = r.getAs[Long]("n_keys")
    val nRows = r.getAs[Long]("n_rows")
    val maxRows = r.getAs[Long]("max_rows")
    val p50 = r.getAs[Long]("p50_rows")
    val p99 = r.getAs[Long]("p99_rows")
    assert(nRows === Tables.lineitem(spark, sf).count())
    assert(nKeys === Tables.lineitem(spark, sf)
      .select($"l_suppkey").distinct().count())
    assert(p50 <= p99 && p99 <= maxRows)
    val heavy = r.getAs[Long]("heavy_key")
    val heavyCount = Tables.lineitem(spark, sf)
      .filter($"l_suppkey" === heavy).count()
    assert(heavyCount === maxRows, "heavy_key must carry max_rows rows")
    assert(r.getAs[Double]("skew_ratio") >= 1.0)
  }

  test("ngram novelty: one row per multi-token doc, ratios in [0,1]") {
    import spark.implicits._
    val rows = Round10Ops5.textNgramNovelty(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val nDocs = Tables.documents(spark, sf)
      .filter(size(split($"text", " ")) >= 2).count()
    assert(rows.length === nDocs)
    rows.foreach { case (_, nb, nn, nov) =>
      assert(nn <= nb && nb > 0)
      assert(nov >= 0.0 && nov <= 1.0)
      assert(math.abs(nov - math.rint(nn.toDouble / nb * 1e6) / 1e6) < 1e-9)
    }
  }

  test("naive bayes: deterministic, covers the test split, beats chance") {
    import spark.implicits._
    val a = Round10Ops5.mlNaiveBayes(spark, sf)
      .as[(Long, Int, Int)].collect().toSeq
    val nTest = graft.ops.ML.mlTrainTestSplit(spark, sf)
      .filter($"split" === "test").count()
    assert(a.length === nTest)
    val acc = a.count(r => r._2 == r._3).toDouble / a.length
    assert(acc > 0.85,
      s"gaussian NB accuracy $acc on the separable sign-of-dim0 target")
    val b = Round10Ops5.mlNaiveBayes(spark, sf)
      .as[(Long, Int, Int)].collect().toSeq
    assert(a === b, "closed-form NB must be deterministic")
  }
}
