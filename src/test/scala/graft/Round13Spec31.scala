package graft

import graft.ops.Round13Ops31
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 31: entropy-rate bounds, predictor accuracy algebra.
  */
class Round13Spec31 extends AnyFunSuite with SparkFixture {

  test("markov entropy rate: within [0, log2 k], states complete") {
    import spark.implicits._
    val (n, k, h, hmax) = Round13Ops31.tsMarkovEntropyRate(spark, sf)
      .as[(Long, Long, Double, Double)].head()
    val types = Tables.events(spark, sf)
      .select("event_type").distinct().count()
    assert(n > 0 && k === types, "every event type feeds the chain")
    assert(h >= 0.0 && h <= hmax + 1e-6,
      s"entropy $h outside [0, $hmax]")
    assert(math.abs(hmax - math.log(k.toDouble) / math.log(2.0)) < 1e-5)
  }

  test("markov predictor: best successor count consistent, accuracy weighted") {
    import spark.implicits._
    val rows = Round13Ops31.mlMarkovNextEventAcc(spark, sf)
      .as[(String, String, Long, Long, Double)].collect()
    assert(rows.length === Tables.events(spark, sf)
      .select("event_type").distinct().count())
    rows.foreach { case (s, p, tot, best, acc) =>
      assert(best <= tot && best > 0)
      assert(math.abs(acc - best.toDouble / tot) < 1e-6)
      assert(acc >= 1.0 / 6,
        s"$s: best successor below uniform-ish floor")
      assert(p.nonEmpty)
    }
  }
}
