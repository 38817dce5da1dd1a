package graft

import graft.ops.Round13Ops20
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 20: the nprobe sweep's self-verification — recall
  * is monotone in nprobe, cost grows with it, and probing every cell
  * recovers exact kNN exactly.
  */
class Round13Spec20 extends AnyFunSuite with SparkFixture {

  test("nprobe sweep: recall monotone, full probe = exact recall 1.0") {
    import spark.implicits._
    val rows = Round13Ops20.simIvfNprobeSweep(spark, sf)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    // panel = {1,2,4} + the v4 index's full cell count (ceil(sqrt(n)))
    assert(rows.map(_._1).take(3).toSeq === Seq(1, 2, 4))
    assert(rows.last._1 > 4, "panel must end at the full cell count")
    val np = rows.head._2
    assert(rows.forall(_._2 == np), "probe count must not vary with nprobe")
    assert(rows.map(_._3).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      s"recall must be monotone in nprobe: ${rows.map(_._3).toSeq}")
    assert(rows.map(_._4).sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
      "candidate cost must grow with nprobe")
    assert(rows.last._3 === 1.0,
      "probing every cell must reproduce exact kNN: recall 1.0")
    assert(rows.head._3 > 0.0, "nprobe=1 should still find some neighbors")
  }
}
