package graft

import graft.ops.Round7Ops2
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural cross-checks for the round-7 part-3 operators. The
  * DuckDB oracle gates values; these assert what it cannot see — the
  * NAAJ plan shape, bloom-prefilter equivalence to the unfiltered
  * join, incremental-merge equivalence to a full recompute, spine
  * contiguity, and profile consistency.
  */
class Round7Spec2 extends AnyFunSuite with SparkFixture {

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("NOT IN plans as a null-aware BroadcastHashJoin, not a nested loop") {
    val p = plan(Round7Ops2.joinNullAwareAnti(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected single-column NAAJ to stay a broadcast hash join:\n${p.take(1500)}")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "null-aware anti must not degenerate into a nested loop")
  }

  test("null-aware anti excludes NULL probes (three-valued logic)") {
    import spark.implicits._
    val got = Round7Ops2.joinNullAwareAnti(spark, sf)
      .agg(sum($"n_orders")).head.getLong(0)
    // non-null probe + plain anti join ≡ NOT IN over a null-free list
    val building = Tables.customer(spark, sf)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val manual = Tables.orders(spark, sf)
      .filter(pmod($"o_orderkey", lit(97)) =!= 0)
      .join(building, $"o_custkey" === $"c_custkey", "left_anti")
      .count()
    assert(got === manual, "NULL probes must be excluded, the rest anti-joined")
    val withNullProbes = Tables.orders(spark, sf)
      .join(building, $"o_custkey" === $"c_custkey", "left_anti").count()
    assert(got < withNullProbes, "some probes are nulled, so NAAJ must return fewer")
  }

  test("bloom prefilter returns exactly the unfiltered join result") {
    import spark.implicits._
    val got = Round7Ops2.scaleBloomPrefilter(spark, sf)
    val expected = {
      val q = Tables.supplier(spark, sf)
        .filter($"s_acctbal" >= 5000.0).select($"s_suppkey")
      Tables.lineitem(spark, sf)
        .join(q, $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_suppkey")
        .agg(count(lit(1)).as("n_items"),
          sum(Tables.money($"l_quantity"))
            .cast(org.apache.spark.sql.types.DoubleType).as("sum_qty"))
        .orderBy($"s_suppkey")
    }
    assert(got.collect().toSeq === expected.collect().toSeq,
      "false positives must be removed by the exact join")
  }

  test("incremental merge is bit-identical to the full recompute") {
    import spark.implicits._
    val got = Round7Ops2.pipelineIncrementalAgg(spark, sf)
    val full = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(Tables.money($"o_totalprice"))
          .cast(org.apache.spark.sql.types.DoubleType).as("revenue"))
      .orderBy($"o_custkey")
    assert(got.collect().toSeq === full.collect().toSeq,
      "base+delta merge must equal recomputing over the union")
  }

  test("gap-fill spine is contiguous, count-preserving, and fully filled") {
    import spark.implicits._
    val g = Round7Ops2.tsGapFill(spark, sf).cache()
    val perUser = g.groupBy($"user_id")
      .agg(count(lit(1)).as("n_days"),
        (datediff(max($"day"), min($"day")) + 1).as("span"),
        sum($"n_events").as("n_events"),
        sum(when($"filled_max".isNull, 1).otherwise(0)).as("n_null_fill"))
    assert(perUser.filter($"n_days" =!= $"span").count() === 0,
      "every day between a user's first and last active day must appear")
    assert(perUser.filter($"n_null_fill" =!= 0).count() === 0,
      "forward fill starts on an active day, so no filled_max may be null")
    val total = Tables.events(spark, sf).count()
    assert(g.agg(sum($"n_events")).head.getLong(0) === total,
      "zero-filling must not invent or drop events")
    g.unpersist()
  }

  test("z-ordering shrinks per-partition spans on BOTH dimensions") {
    import spark.implicits._
    val z = Round7Ops2.scaleZorderCluster(spark, sf)
    def meanSpans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val spans = df
        .mapPartitions { it =>
          val rows = it.toSeq
          if (rows.isEmpty) Iterator.empty
          else {
            val xs = rows.map(_.getAs[Int]("xb"))
            val ys = rows.map(_.getAs[Int]("yb"))
            Iterator(((xs.max - xs.min).toDouble, (ys.max - ys.min).toDouble))
          }
        }.collect()
      (spans.map(_._1).sum / spans.length, spans.map(_._2).sum / spans.length)
    }
    val (zx, zy) = meanSpans(
      z.repartitionByRange(64, $"zval").sortWithinPartitions($"zval"))
    // unclustered layout: random round-robin partitions see ~full span
    val (rx, ry) = meanSpans(z.repartition(64))
    assert(zx < rx / 2 && zy < ry / 2,
      s"z-ordered partitions must be locally narrow in both dims: " +
        s"x $zx vs $rx, y $zy vs $ry")
  }

  test("z-score outliers are rare, extreme, and upper-tail only") {
    import spark.implicits._
    val o = Round7Ops2.analyticZscoreOutliers(spark, sf).cache()
    val n = o.count()
    val total = Tables.events(spark, sf).count()
    assert(n > 0 && n < total / 10,
      s"|z|>2 must select a small tail ($n of $total)")
    assert(o.filter(abs($"z") <= 2.0).count() === 0)
    // value is non-negative and right-skewed, so the tail is upper-only:
    // min z = -mean/std > -2 for every user
    assert(o.filter($"z" < 0).count() === 0,
      "no left-tail outlier can exist for a non-negative value column")
    o.unpersist()
  }

  test("inverted index df and postings agree with the corpus") {
    import spark.implicits._
    val idx = Round7Ops2.textInvertedIndex(spark, sf).cache()
    val pairs = Tables.documents(spark, sf)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .distinct()
    assert(idx.agg(sum($"df")).head.getLong(0) === pairs.count(),
      "sum of document frequencies = distinct (doc, term) pairs")
    assert(idx.filter(size(split($"postings", ",")) > 20).count() === 0,
      "postings head view is capped at 20 entries")
    // spot-check one term's postings against a direct query
    val term = idx.orderBy(desc("df"), asc("term")).head.getString(0)
    val expected = pairs.filter($"term" === term)
      .select($"doc_id").orderBy($"doc_id").as[Long].take(20)
      .mkString(",")
    val got = idx.filter($"term" === term).head.getString(2)
    assert(got === expected)
    idx.unpersist()
  }

  test("quarantine masks partition the table and stay in 0..15") {
    import spark.implicits._
    val m = Round7Ops2.pipelineQuarantineRules(spark, sf).cache()
    assert(m.agg(sum($"n_rows")).head.getLong(0) ===
      Tables.lineitem(spark, sf).count(),
      "every row lands in exactly one mask bucket")
    assert(m.filter($"violation_mask" < 0 || $"violation_mask" > 15).count() === 0)
    assert(m.filter($"violation_mask" === 0).count() === 1,
      "some rows violate no rule")
    m.unpersist()
  }

  test("trigram LM: probabilities valid, contexts frequent, argmax correct") {
    import spark.implicits._
    val lm = Round7Ops2.textTrigramLm(spark, sf).cache()
    assert(lm.count() > 0)
    assert(lm.filter($"p_next" <= 0 || $"p_next" > 1).count() === 0)
    assert(lm.filter($"n_ctx" < 20).count() === 0)
    assert(lm.filter(size(split($"ctx", " ")) =!= 2).count() === 0,
      "context is exactly a bigram")
    lm.unpersist()
  }

  test("interval containment: every purchase resolves to exactly one session, via a keyed join") {
    import spark.implicits._
    val j = Round7Ops2.joinIntervalContainment(spark, sf)
    val p = plan(j)
    assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
      "the user_id equi-key must keep this a hash/merge join")
    val purchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    val rows = j.cache()
    assert(rows.count() === purchases,
      "each purchase falls inside exactly one session interval")
    assert(rows.select($"event_id").distinct().count() === purchases,
      "no purchase matches two intervals")
    rows.unpersist()
  }

  test("pagerank conserves mass and ranks hubs above leaves") {
    import spark.implicits._
    val pr = graft.ops.Graph.graphPagerank(spark, sf).cache()
    val n = pr.count()
    val mass = pr.agg(sum($"rank_scaled")).head.getDouble(0)
    assert(math.abs(mass - n) < 1e-2 * n,
      s"sum of average-normalized ranks must be ~|V| ($mass vs $n)")
    assert(pr.filter($"rank_scaled" <= 0).count() === 0)
    // supplier nodes (offset range) aggregate many parts' mass: their
    // mean rank must exceed the part-side mean
    val supMean = pr.filter($"node" >= 10000000L)
      .agg(avg($"rank_scaled")).head.getDouble(0)
    val partMean = pr.filter($"node" < 10000000L)
      .agg(avg($"rank_scaled")).head.getDouble(0)
    assert(supMean > partMean,
      s"high-degree supplier hubs must outrank parts ($supMean vs $partMean)")
    pr.unpersist()
  }

  test("compaction is a narrow rewrite that preserves content") {
    import spark.implicits._
    val r = Round7Ops2.pipelineCompactSmallFiles(spark, sf).head()
    assert(r.getInt(0) === 64 && r.getInt(1) === 4,
      "file counts are the 64-in / 4-out contract constants")
    assert(r.getLong(2) === Tables.orders(spark, sf).count())
  }

  test("corr pairs stay in [-1,1] and agree with built-in corr to 1e-6") {
    import spark.implicits._
    val c = Round7Ops2.aggCorrPairs(spark, sf).cache()
    assert(c.count() === 3)
    assert(c.filter(abs($"corr") > 1.0).count() === 0)
    // the exact-moment formula must agree with Spark's own estimator
    // up to its accumulation-order noise (the 2dp quantization of the
    // inputs is shared here, so only summation order differs)
    val builtin = Tables.lineitem(spark, sf)
      .select(Tables.money($"l_quantity").cast("double").as("q"),
        Tables.money($"l_extendedprice").cast("double").as("e"))
      .agg(corr($"q", $"e")).head.getDouble(0)
    val got = c.filter($"pair" === "l_quantity__l_extendedprice")
      .head.getDouble(1)
    assert(math.abs(got - builtin) < 1e-6, s"$got vs builtin $builtin")
    c.unpersist()
  }

  test("column profile agrees with direct per-column queries") {
    import spark.implicits._
    val p = Round7Ops2.pipelineProfileColumns(spark, sf).cache()
    assert(p.count() === 4)
    val li = Tables.lineitem(spark, sf)
    val qRow = p.filter($"column_name" === "l_quantity").head()
    assert(qRow.getLong(1) === li.filter($"l_quantity".isNotNull).count())
    assert(qRow.getLong(2) === li.select($"l_quantity").distinct().count())
    assert(p.filter($"min_val" > $"max_val").count() === 0)
    p.unpersist()
  }
}
