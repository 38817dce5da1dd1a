package graft

import graft.ops.Round11Ops14
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 14: kNN classify, variance merge, poly
  * fit, multi-agg pivot, compaction plan, partitioned roundtrip. */
class Round11Spec11 extends AnyFunSuite with SparkFixture {

  test("knn classify: one row per lang, accuracy far above chance") {
    import spark.implicits._
    val rows = Round11Ops14.mlKnnClassify(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length === 5)
    val total = rows.map(_._2).sum
    // round 14: the op classifies a count-capped md5 holdout
    // (P = ceil(n/256)); mirror the coin here so the spec pins the
    // exact holdout size rather than assuming leave-one-out-over-all
    val n = Tables.embeddings(spark, sf).count()
    val p = math.ceil(n / 256.0).toLong
    val expected = Tables.embeddings(spark, sf)
      .filter(pmod(expr(
        "CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"),
        lit(p)) === 0)
      .count()
    assert(total === expected)
    val acc = rows.map(_._3).sum.toDouble / total
    // synthetic embeddings cluster by language only weakly at
    // sf0.001 (measured 0.284); assert above the 0.2 chance floor
    assert(acc > 0.24, s"overall 5-NN accuracy $acc")
  }

  test("variance merge: matches direct spark variance computation") {
    import spark.implicits._
    val merged = Round11Ops14.aggVarianceMerge(spark, sf)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val direct = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), avg($"value").as("m"),
        var_pop($"value").as("v"))
      .as[(String, Long, Double, Double)].collect()
    direct.foreach { case (t, n, m, v) =>
      val (_, mn, mm, mv) = merged(t)
      assert(mn === n)
      assert(math.abs(mm - m) < 0.01, s"$t mean $mm vs $m")
      assert(math.abs(mv - v) < 0.05, s"$t var $mv vs $v")
    }
  }

  test("poly fit: single row, coefficients finite") {
    import spark.implicits._
    val (nd, a0, a1, a2) = Round11Ops14.mlPolyFit(spark, sf)
      .as[(Long, Double, Double, Double)].head()
    assert(nd >= 20)
    Seq(a0, a1, a2).foreach(c => assert(!c.isNaN && !c.isInfinite))
    assert(a0 > 0, "intercept should be near mean daily revenue > 0")
  }

  test("pivot multi: 3 flags, totals match direct aggregation") {
    import spark.implicits._
    val df = Round11Ops14.sqlPivotMulti(spark, sf)
    assert(df.columns.toSeq === Seq("l_returnflag", "o_sq", "o_nq", "f_sq", "f_nq"))
    val rows = df.collect()
    assert(rows.length === 3)
    val totalN = rows.map(r =>
      (if (r.isNullAt(2)) 0L else r.getLong(2)) +
      (if (r.isNullAt(4)) 0L else r.getLong(4))).sum
    assert(totalN === Tables.lineitem(spark, sf).count())
  }

  test("compaction plan: groups near target, bytes partition the estimate") {
    import spark.implicits._
    val rows = Round11Ops14.pipelineCompactionPlan(spark, sf)
      .as[(String, Long, Long, Long, Date, Date)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, g, np, bytes, f, l) =>
      assert(g >= 0 && np >= 1 && bytes > 0)
      assert(!f.after(l))
    }
  }

  test("partitioned roundtrip: per-type counts survive the write") {
    import spark.implicits._
    val rows = Round11Ops14.sourcePartitionedRoundtrip(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val direct = Tables.events(spark, sf).groupBy($"event_type")
      .agg(count(lit(1))).as[(String, Long)].collect().toMap
    assert(rows.length === direct.size)
    rows.foreach { case (t, n, _, mn, mx) =>
      assert(n === direct(t)); assert(mn <= mx)
    }
  }
}
