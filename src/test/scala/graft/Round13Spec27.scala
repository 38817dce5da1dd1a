package graft

import graft.ops.Round13Ops27
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 27: style-cosine bounds, checksum chain tamper
  * propagation, coverage bounds.
  */
class Round13Spec27 extends AnyFunSuite with SparkFixture {

  test("style similarity: one nearest neighbor per source, cosine in (0,1]") {
    import spark.implicits._
    val rows = Round13Ops27.textStyleSimilarity(spark, sf)
      .as[(String, String, Double)].collect()
    val nSources = Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(rows.length === nSources)
    rows.foreach { case (s, nb, c) =>
      assert(s != nb)
      assert(c > 0.0 && c <= 1.0, s"$s->$nb cos $c")
    }
  }

  test("checksum chain: deterministic across runs, each link feeds the next") {
    import spark.implicits._
    val a = Round13Ops27.pipelineChecksumChain(spark, sf)
      .as[(Int, Long, Long, String)].collect().sortBy(_._1)
    val b = Round13Ops27.pipelineChecksumChain(spark, sf)
      .as[(Int, Long, Long, String)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq, "chain must be replay-stable")
    assert(a.map(_._4).distinct.length === 3, "links must differ")
    assert(a.map(_._2).sum === Tables.events(spark, sf).count())
  }

  test("coverage: bounded by events*window and by the span, bands partition users") {
    import spark.implicits._
    val rows = Round13Ops27.winIntervalCoverage(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum === nUsers)
    rows.foreach { case (band, n, _, lo, hi) =>
      assert(lo >= 600, "every user covers at least one full window")
      assert(lo <= hi && n > 0)
      // the band is the floor-hour of its members' coverage
      assert(lo / 3600 == band && hi / 3600 == band)
    }
  }
}
