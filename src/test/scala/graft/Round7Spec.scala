package graft

import graft.ops.Round7Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural cross-checks for the round-7 part-2 operators — the
  * DuckDB oracle is the value gate; these assert the internal
  * invariants the oracle cannot see (timeline partitioning, funnel
  * ordering, sampling-rate realization, diff reconciliation).
  */
class Round7Spec extends AnyFunSuite with SparkFixture {

  test("scd2: intervals tile each user's timeline, one open interval per user") {
    import spark.implicits._
    val scd = Round7Ops.pipelineScd2(spark, sf).cache()
    val total = Tables.events(spark, sf).count()
    assert(scd.agg(sum($"n_events")).head.getLong(0) === total,
      "runs must cover every event exactly once")
    val current = scd.groupBy($"user_id")
      .agg(sum(when($"is_current", 1).otherwise(0)).as("n"))
      .filter($"n" =!= 1).count()
    assert(current === 0, "exactly one open interval per user")
    // each interval ends where the next begins (lead construction) and
    // consecutive intervals never share a status (runs are maximal)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"valid_from")
    val bad = scd
      .withColumn("next_from", lead($"valid_from", 1).over(w))
      .withColumn("next_status", lead($"status", 1).over(w))
      .filter(($"valid_to".isNotNull && $"valid_to" =!= $"next_from") ||
        ($"next_status".isNotNull && $"next_status" === $"status"))
      .count()
    assert(bad === 0, "intervals must abut and alternate status")
    scd.unpersist()
  }

  test("funnel: stage timestamps are strictly ordered and stage counts are monotone") {
    import spark.implicits._
    val f = Round7Ops.analyticFunnel(spark, sf).cache()
    val disordered = f.filter(
      ($"click_ts".isNotNull && !($"click_ts" > $"view_ts")) ||
        ($"purchase_ts".isNotNull && !($"purchase_ts" > $"click_ts"))).count()
    assert(disordered === 0, "each stage must be strictly after the previous")
    val skipped = f.filter(
      ($"click_ts".isNotNull && $"view_ts".isNull) ||
        ($"purchase_ts".isNotNull && $"click_ts".isNull)).count()
    assert(skipped === 0, "no stage without its predecessor")
    val byStage = f.groupBy($"stage").count().as[(Int, Long)].collect().toMap
    assert(byStage.keySet.subsetOf(Set(0, 1, 2, 3)))
    assert(byStage.getOrElse(3, 0L) > 0,
      "a 30-day 150-user stream must convert someone end to end")
    f.unpersist()
  }

  test("mixture sample: realized rates track the temperature targets, skew flattened") {
    import spark.implicits._
    val m = Round7Ops.pipelineMixtureSample(spark, "/root/testdata/sf0.01")
      .as[(String, Long, Double, Long, Long)].collect()
    m.foreach { case (lang, n, rate, sampled, _) =>
      val realized = sampled.toDouble / n
      assert(math.abs(realized - rate) < 0.15,
        s"$lang realized $realized vs target $rate")
    }
    // temperature flattening: the head language is sampled at a lower
    // rate than the tail (en has ~3x zh's docs at sf0.01)
    val byLang = m.map(r => r._1 -> r._3).toMap
    assert(byLang("en") < byLang("zh"),
      "head language must get the lower temperature rate")
  }

  test("dataset diff: change counts reconcile with the modular derivation") {
    import spark.implicits._
    val d = Round7Ops.pipelineDatasetDiff(spark, sf)
      .groupBy($"change_type").count().as[(String, Long)].collect().toMap
    val keys = Tables.orders(spark, sf)
      .select($"o_orderkey".as[Long]).collect()
    val removed = keys.count(_ % 13 == 0).toLong
    val kept = keys.filterNot(_ % 13 == 0)
    assert(d.getOrElse("removed", 0L) === removed)
    assert(d.getOrElse("added", 0L) === kept.count(_ % 17 == 0).toLong)
    assert(d.getOrElse("changed", 0L) === kept.count(_ % 7 == 0).toLong,
      "every +10% reprice of a nonzero price must register as changed")
  }
}
