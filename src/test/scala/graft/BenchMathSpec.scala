package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Bench measurement policy (round-18): the fold/flag/budget
  * arithmetic that decides what lands in BENCH_r{N}.json is pure and
  * these tests are the contract — a regression here silently corrupts
  * the round's canonical artifact, which is exactly what rounds 16-17
  * spent their budget adjudicating after the fact.
  */
class BenchMathSpec extends AnyFunSuite {

  test("medMin excludes failed runs and reports upper median") {
    assert(BenchMath.medMin(Seq(3.0, 1.0, 2.0)) == (2.0, 1.0))
    // failures (-1) never count as observations
    assert(BenchMath.medMin(Seq(-1.0, 4.0, 2.0)) == (4.0, 2.0))
    // even count: upper median (the convention of every prior round)
    assert(BenchMath.medMin(Seq(1.0, 2.0)) == (2.0, 1.0))
    // all runs failed: the failure stays visible as -1/-1
    assert(BenchMath.medMin(Seq(-1.0, -1.0)) == (-1.0, -1.0))
  }

  test("stealOfMin reads the steal around the min run, not the worst run") {
    // min run (0.5 s) was clean; the dirty 9.0 s run must not flag
    assert(BenchMath.stealOfMin(Seq((9.0, 44.0), (0.5, 1.0))) == 1.0)
    assert(BenchMath.stealOfMin(Seq((-1.0, 50.0))) == -1.0)
  }

  test("a FAILED re-run (-1) never lowers the min") {
    // round-17 advisory: a fast-failing re-run must not vindicate a
    // real regression with a bogus sub-second reading
    assert(BenchMath.foldMin(5.0, Some(-1.0)) == 5.0)
    assert(BenchMath.foldMin(5.0, Some(0.4)) == 0.4)
    assert(BenchMath.foldMin(5.0, Some(7.0)) == 5.0)
    assert(BenchMath.foldMin(5.0, None) == 5.0)
    // an all-runs-failed op adopts a successful re-run's reading
    assert(BenchMath.foldMin(-1.0, Some(0.4)) == 0.4)
  }

  test("flagScore ranks uniform all-runs starvation ahead of mild spread") {
    // the r17 cap ranked by absolute med-min spread and dropped exactly
    // this case: all 3 runs slow (near-zero spread) but min 30x the
    // predecessor (pipeline_pii_audit: 10.2 s vs 0.33 s)
    val uniformStarved = BenchMath.flagScore(10.4, 10.2, 3.0, Some(0.33))
    val mildSpread = BenchMath.flagScore(2.8, 1.0, 0.0, Some(0.9))
    assert(uniformStarved > mildSpread)
    assert(uniformStarved > 30.0)
    // clean op: no flag
    assert(BenchMath.flagScore(1.0, 0.9, 1.0, Some(0.85)) == 0.0)
    // sub-threshold noise floors: tiny ops and tiny predecessors don't flag
    assert(BenchMath.flagScore(0.10, 0.03, 0.0, Some(0.01)) == 0.0)
    // steal criterion flags even with flat spread and no predecessor
    assert(BenchMath.flagScore(1.0, 0.9, 12.0, None) > 0.0)
  }

  test("flagScore flags an all-runs-failed op for one adjudicating re-run") {
    // round-18 advisory: without this, foldMin's adopt-a-successful-
    // rerun branch (pinned above) was unreachable — a transiently
    // failing op landed in the round artifact as -1 with no re-run.
    // Fixed 3.0: above mild spread (~2.5), below heavy starvation.
    assert(BenchMath.flagScore(-1.0, -1.0, -1.0, None) == 3.0)
    assert(BenchMath.flagScore(-1.0, -1.0, 0.0, Some(0.5)) == 3.0)
    assert(BenchMath.flagScore(-1.0, -1.0, 0.0, None) <
      BenchMath.flagScore(10.4, 10.2, 3.0, Some(0.33)))
  }

  test("every headline name is a registered query") {
    // the stdout contract line carries only this subset; a renamed or
    // mistyped entry would silently vanish from BENCH_r{N}.json
    val missing = Bench.headline.filterNot(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"headline names not in SparkEntry.queries: $missing")
  }

  test("per-op pass/rerun budget gates degrade before the driver kill clock") {
    // round-19: the pass gate is PER OP (headline-first board), so the
    // budget decides how far down the board a later pass reaches
    // instead of refusing it whole. Estimate + 1.3x slack, 0.85 headroom.
    assert(BenchMath.allowOpRun(400.0, 2.0, 1200.0))
    assert(BenchMath.allowOpRun(1015.0, 2.0, 1200.0))
    assert(!BenchMath.allowOpRun(1018.0, 2.0, 1200.0))
    // an expensive op stops fitting while cheap ones still do
    assert(!BenchMath.allowOpRun(980.0, 40.0, 1200.0))
    assert(BenchMath.allowOpRun(980.0, 0.5, 1200.0))
    // the floor stops a flood of sub-ms estimates at the deadline edge
    assert(!BenchMath.allowOpRun(1019.95, 0.0, 1200.0))
    // re-runs fit while the op's own cost (1.5x slack) stays inside
    assert(BenchMath.allowRerun(1100.0, 1.0, 1200.0))
    assert(!BenchMath.allowRerun(1139.0, 1.0, 1200.0))
    assert(!BenchMath.allowRerun(1139.8, 0.0, 1200.0))
  }
}
