package graft

import graft.ops.Round13Ops13
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 13: path-shape checks, code-score sanity on prose,
  * broadcast↔shuffle strategy switch plan pins.
  */
class Round13Spec13 extends AnyFunSuite with SparkFixture {

  test("top paths: 4-step paths, counts descending, all types known") {
    import spark.implicits._
    val rows = Round13Ops13.analyticTopPaths(spark, sf)
      .as[(String, Long)].collect()
    assert(rows.length === 15)
    assert(rows.map(_._2).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    val types = Tables.events(spark, sf).select("event_type")
      .distinct().as[String].collect().toSet
    rows.foreach { case (path, n) =>
      val steps = path.split(">")
      assert(steps.length <= 4 && steps.nonEmpty, s"path $path")
      assert(n > 0)
      steps.foreach(s => assert(types.contains(s), s"unknown type $s"))
    }
  }

  test("code score: prose corpus scores low on average, counts consistent") {
    import spark.implicits._
    val rows = Round13Ops13.textCodeScore(spark, sf)
      .as[(String, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.map(_._2).sum === Tables.documents(spark, sf).count())
    rows.foreach { case (lang, n, mean, codey) =>
      assert(mean >= 0.0, s"$lang mean $mean")
      assert(codey <= n)
    }
  }

  test("join strategy: broadcast under default, shuffle when disabled") {
    val bPlan = Round13Ops13.scaleJoinStrategySwitch(spark, sf)
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastHashJoin"),
      s"tiny nation dim must broadcast by default:\n$bPlan")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val sPlan = Round13Ops13.scaleJoinStrategySwitch(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!sPlan.contains("BroadcastHashJoin"),
        s"with the threshold disabled the join must not broadcast:\n$sPlan")
      assert(sPlan.contains("SortMergeJoin") ||
        sPlan.contains("ShuffledHashJoin"),
        s"expected a shuffle join fallback:\n$sPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
