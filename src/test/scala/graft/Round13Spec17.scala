package graft

import graft.ops.Round13Ops17
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 17: conductance bounds, offset-resume exactly-once,
  * star-except column pruning.
  */
class Round13Spec17 extends AnyFunSuite with SparkFixture {

  test("conductance: in [0,1], cut bounded by volume, communities nontrivial") {
    import spark.implicits._
    val rows = Round13Ops17.graphConductance(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, n, vol, cut, phi) =>
      assert(n > 0 && vol >= n, s"community $c: volume $vol < nodes $n")
      assert(cut <= vol, s"community $c: cut $cut > volume $vol")
      assert(phi >= 0.0 && phi <= 1.0, s"community $c: phi $phi")
    }
  }

  test("offset resume: chunks 0-1 from run1 only, chunk 2 from the restart") {
    import spark.implicits._
    val rows = Round13Ops17.pipelineOffsetResume(spark, sf)
      .as[(Int, Long, Long, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0, 1, 2))
    assert(rows.map(_._4).toSeq === Seq("run1", "run1", "run2"),
      "the restart must skip committed chunks and process only chunk 2")
    assert(rows.map(_._2).sum === Tables.events(spark, sf).count())
  }

  test("star except: dropped columns leave the scan's ReadSchema") {
    val df = Round13Ops17.sqlSelectStarExcept(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
    assert(scan.contains("o_orderstatus") && scan.contains("o_totalprice"))
    assert(!scan.contains("o_custkey") && !scan.contains("o_orderdate"),
      s"EXCEPT-ed columns must be pruned from the scan:\n$scan")
    assert(df.count() === 3)
  }
}
