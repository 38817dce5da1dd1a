package graft

import graft.ops.{Analytic, Relational}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions (SURVEY §4): the properties that
  * decide whether a query survives a 100x scale-up — pushdown reaching
  * the parquet scan, column pruning shrinking ReadSchema, the intended
  * join strategies, top-k avoiding global sorts, codegen fusing the
  * hot path.
  */
class PlanSpec extends AnyFunSuite with SparkFixture {

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize THIS plan so AQE finalizes + codegen ids appear
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  /** Count of hash-partitioned shuffles the query ACTUALLY executes,
    * by walking the adaptive physical plan (descending into query
    * stages, which are leaves to the regular collect). Round-18 fix:
    * the round-17 exchange-budget pins counted the string "Exchange
    * hashpartitioning", which never occurs in FORMATTED explain output
    * (the tree line is "Exchange (N)" and the partitioning rides a
    * separate "Arguments: hashpartitioning(...)" detail line) — every
    * such pin compared 0 <= budget and could never fire. Reused
    * exchanges (ReusedExchangeExec / stage reuse) are intentionally
    * not counted: they are free at runtime.
    */
  private def hashShuffles(df: org.apache.spark.sql.DataFrame): Int = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    df.collect()
    def walk(sp: SparkPlan): Seq[SparkPlan] = {
      val kids = sp match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      sp +: kids.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).count {
      case s: ShuffleExchangeExec => s.outputPartitioning.isInstanceOf[HashPartitioning]
      case _ => false
    }
  }

  test("projection pruning reaches the parquet reader (2-column ReadSchema)") {
    val p = plan(Relational.scanProjectionPruning(spark, sf))
    assert(p.contains("ReadSchema"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      s"pruned scan must not read unused columns:\n$readSchema")
  }

  test("shipdate range filter is pushed down to the scan") {
    val p = plan(Relational.scanFilterPushdown(spark, sf))
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_shipdate") ,
      s"expected shipdate pushdown in:\n${p.take(2000)}")
  }

  test("dimension join broadcasts, big-big join sort-merges") {
    assert(plan(Relational.joinBroadcastInner(spark, sf))
      .contains("BroadcastHashJoin"))
    assert(plan(Relational.joinShuffleInner(spark, sf))
      .contains("SortMergeJoin"))
  }

  test("global top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(Analytic.limitTopk(spark, sf))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("Q1 aggregation is a partial+final HashAggregate inside codegen") {
    val p = plan(Relational.aggHashGroupby(spark, sf))
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected two-phase (partial + final) hash aggregation")
    // formatted explain marks fused operators with "[codegen id : N]"
    assert(p.contains("codegen id"), "scan→filter→partial-agg must be codegen-fused")
  }

  test("bucketed tables join without exchanges on the join key") {
    import graft.ops.ScaleTechniques
    val p = plan(ScaleTechniques.joinBucketedColocated(spark, sf))
    assert(p.contains("SortMergeJoin"))
    assert(p.contains("SelectedBucketsCount: 8 out of 8"),
      "both scans must read bucket metadata")
    // only the post-join groupBy + final sort may exchange (2 real
    // exchanges, each appearing once in the final and once in the
    // initial plan's detail sections = 4 entries); shuffling the join
    // inputs would add 4 more
    val exchanges = """\(\d+\) Exchange""".r.findAllIn(p).size
    assert(exchanges <= 4,
      s"bucketed join must not shuffle its inputs; saw $exchanges Exchange nodes:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("partition-column predicate becomes a PartitionFilter") {
    import graft.ops.ScaleTechniques
    val p = plan(ScaleTechniques.scanPartitionPruning(spark, sf))
    assert(p.contains("PartitionFilters") && p.contains("purchase"),
      s"expected partition pruning in:\n${p.take(1500)}")
  }

  test("semi/anti joins plan as LeftSemi/LeftAnti (no row explosion)") {
    assert(plan(Relational.joinSemi(spark, sf)).contains("LeftSemi"))
    assert(plan(Relational.joinAnti(spark, sf)).contains("LeftAnti"))
  }

  test("minhash LSH declares no broadcast hint (100TB contract: nothing corpus-sized is forced to ship)") {
    // AQE may still runtime-convert at toy scale when a side measures
    // small — that's the point of AQE and it self-bounds by
    // autoBroadcastJoinThreshold. What the scale contract forbids is a
    // FORCED broadcast of a corpus-sized relation in the declared plan.
    val lp = graft.ops.LlmOps.dedupMinhashLsh(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!lp.toLowerCase.contains("hint") && !lp.contains("ResolvedHint"),
      s"minhash must not force a broadcast:\n${lp.take(1500)}")
  }

  test("exact pair ops declare no broadcast hint (near-jaccard / containment / near-embedding)") {
    // Round-5 rewrite: all three exact pair operators generate pairs
    // through fragment-replicate SHUFFLE joins (1-Bucket-Theta). Same
    // contract as the minhash pin above: AQE may runtime-convert at toy
    // scale (self-bounded by autoBroadcastJoinThreshold), but the
    // declared plan must not FORCE a corpus-sized relation to ship.
    Seq[org.apache.spark.sql.DataFrame](
      graft.ops.LlmOps.dedupNearJaccard(spark, sf),
      graft.ops.Round4Ops.textContainment(spark, sf),
      graft.ops.LlmOps2.dedupNearEmbedding(spark, sf)
    ).foreach { df =>
      val lp = df.queryExecution.optimizedPlan.toString
      assert(!lp.toLowerCase.contains("hint") && !lp.contains("ResolvedHint"),
        s"exact pair op must not force a broadcast:\n${lp.take(1500)}")
    }
  }

  test("grid-partitioned near-embedding is an equi-join, not a nested loop") {
    val p = plan(graft.ops.LlmOps2.dedupNearEmbedding(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"grid cells must equi-join:\n${p.take(1500)}")
  }

  test("salted skew join stays a shuffle join (merge hint beats tiny-dim broadcast)") {
    val p = plan(graft.ops.Round3Ops.skewSaltedJoin(spark, sf))
    assert(p.contains("SortMergeJoin"),
      s"salted join must demonstrate the shuffle path:\n${p.take(1500)}")
  }

  test("bucketized range join plans as an equi-join, not a nested loop") {
    // join_theta_range is the BNLJ-or-residual baseline; the bucketed
    // rewrite's entire purpose is that (custkey, bucket) becomes a
    // hash-partitionable equi-key with the range check as a residual.
    val p = plan(graft.ops.Round4Ops.joinRangeBucketed(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketed range join must not nested-loop:\n${p.take(1500)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected a hash/merge equi-join:\n${p.take(1500)}")
  }

  test("centroid similarity broadcasts only the labels×dims centroid table") {
    val p = plan(graft.ops.Round4Ops.simCentroidDistance(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"centroid probe must be a broadcast hash join:\n${p.take(1500)}")
  }

  test("contamination check broadcasts the benchmark side (bounded by contract)") {
    // The eval set is small by construction; the training corpus must
    // stream through the probe, never ship. The declared plan forces
    // the broadcast on the bench side only.
    val lp = graft.ops.Round4Ops.pipelineContaminationCheck(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(lp.contains("ResolvedHint") || lp.toLowerCase.contains("broadcast"),
      s"bench side should carry the broadcast hint:\n${lp.take(1500)}")
    val p = plan(graft.ops.Round4Ops.pipelineContaminationCheck(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"probe must be broadcast-side:\n${p.take(1500)}")
  }

  test("scd2 history needs exactly one hash exchange on the history key") {
    // The lag-boundary + running-sum island construction keeps both
    // window passes AND the run aggregate on the single user_id
    // hash partitioning (user_id is a subset of the groupBy keys, so
    // ClusteredDistribution is already satisfied); only the output
    // sort may add a range exchange. The textbook row_number-difference
    // form would partition its second window by (user, type) and
    // double the shuffles — at 100 TB that is the whole cost.
    val hashEx = hashShuffles(graft.ops.Round7Ops.pipelineScd2(spark, sf))
    assert(hashEx == 1,
      s"scd2 must shuffle exactly once on user_id; saw $hashEx hash shuffles")
  }

  test("mixture sampling broadcasts only the per-lang rate table") {
    // 5 rows of (lang, rate, threshold) ship to every executor; the
    // corpus streams through the codegen'd coin filter unshuffled.
    val p = plan(graft.ops.Round7Ops.pipelineMixtureSample(spark,
      "/root/testdata/sf0.01"))
    assert(p.contains("BroadcastHashJoin"),
      s"rate table must broadcast:\n${p.take(1500)}")
  }

  test("dim filter on a non-partition attribute prunes fact partitions at runtime (DPP)") {
    // The dim filter names no partition value, so only a runtime
    // dynamicpruning subquery (fed by the dim broadcast) can skip the
    // non-qualifying event_type directories.
    val p = plan(graft.ops.Round7Ops3.scaleDppJoin(spark,
      "/root/testdata/sf0.01"))
    assert(p.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter in:\n${p.take(2500)}")
    assert(p.contains("BroadcastHashJoin"),
      s"5-row dim must broadcast:\n${p.take(1500)}")
  }

  test("sorted-skipping band filter is pushed to the sorted layout's scan") {
    val p = plan(graft.ops.Round8Ops.scaleSortedSkipping(spark, sf))
    assert(p.contains("PushedFilters") && p.contains("GreaterThanOrEqual(ts"),
      s"ts band must reach the parquet footer stats:\n${p.take(2000)}")
  }

  test("SCD2 point-in-time join is a hash join on user_id, not a nested loop") {
    val p = plan(graft.ops.Round8Ops.joinScd2PointInTime(spark, sf))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval residual must ride the user_id equi-key:\n${p.take(2000)}")
  }

  test("bitmap distinct is two-phase mergeable aggregation (no expand)") {
    val p = plan(graft.ops.Round8Ops.aggBitmapDistinct(spark, sf))
    assert(!p.contains("Expand"),
      s"bitmap path must not use COUNT(DISTINCT)'s Expand:\n${p.take(2000)}")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final aggregation over mergeable bitmaps")
  }

  test("NO query plans an unpartitioned Window (full-board sweep)") {
    // The one class of scale-killer a green oracle can't catch: a
    // logical Window with an empty partition spec funnels the ENTIRE
    // input through one task (WindowExec's own "No Partition Defined"
    // warning). Round-8 shipped two (text_zipf_fit's global row_number,
    // stream_watermark_late_data's prefix scan); both are rewritten
    // window-free in round 9, and this sweep pins the pattern for every
    // registered query — including subquery plans — so the next one
    // cannot land silently. Allowlist is intentionally EMPTY: a future
    // op whose unpartitioned window is genuinely k-bounded (input under
    // a limit) should rank via the collect_list→array_sort→posexplode
    // shape instead (see textZipfFit).
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        // one construction retry, same policy as Verify.scala's dump
        // loop: iterative MLlib fits historically flaked in long
        // shared-JVM sweeps (the dgesdd NotConverged pca flake, fixed
        // at the root in round 13 by switching to eigSym — this guard
        // keeps the board sweep robust to the next one). NonFatal
        // only, and the first failure is PRINTED (round-13 advisory:
        // a silently swallowed first throw let nondeterministic
        // construction bugs pass the sweep ~50% of the time), so
        // flakes stay visible in the test output while OOM-class
        // fatals still abort the suite.
        val df = try fn(spark, sf) catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"PlanSpec window sweep: $name first construction failed " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}) — retrying once")
            fn(spark, sf)
        }
        val bad = df.queryExecution.optimizedPlan.collectWithSubqueries {
          case w: LWindow if w.partitionSpec.isEmpty => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unpartitioned Window in: ${offenders.mkString(", ")}")
  }

  test("NO per-row window partitions only by low-cardinality columns (full-board sweep)") {
    // Round-16 (verdict task 2): the third class of scale-killer a
    // green oracle can't catch — a Window partitioned ONLY by columns
    // with single-digit distinct values (event_type has 5 values,
    // o_orderstatus 3, lang 5, ...). Such a window caps parallelism at
    // the key domain FOREVER: each task sorts n/|domain| rows no matter
    // how many executors exist — the ts_rolling_zscore lesson (rewritten
    // this round as chunked two-phase rolling sums, Round10Ops8). A
    // window is an offender when
    //   (a) every partitionSpec attribute is a known low-card column, AND
    //   (b) its input is per-row over a raw table: the walk from the
    //       window to the leaves crosses no Aggregate — calendar/bucket
    //       rollups window over a domain-bounded aggregate and pass
    //       structurally, because their INPUT is already tiny.
    // Ops whose low-card per-row window is justified carry a named
    // allowlist entry stating the bound.
    import org.apache.spark.sql.catalyst.plans.logical._
    val lowCard = Set("event_type", "o_orderstatus", "o_orderpriority",
      "l_returnflag", "l_linestatus", "lang", "c_mktsegment", "r_name")
    def boundedInput(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true // rollup: bounded by its group-key domain
      case _: GlobalLimit | _: LocalLimit => true
      case j: Join => boundedInput(j.left) && boundedInput(j.right)
      case u: Union => u.children.forall(boundedInput)
      case other if other.children.size == 1 =>
        boundedInput(other.children.head)
      case _ => false // leaf relation (or an unhandled multi-child shape)
    }
    // The 14 ops this sweep flagged when first run (round 16): ten were
    // REWRITTEN distributed (ts_rolling_zscore/win_rolling_median/
    // ts_hampel_filter/ts_autocorr via TwoPhase chunk-carry;
    // ts_cusum/ts_changepoint via the two-phase cusumFrame;
    // agg_trimmed_mean/agg_weighted_median via value-bucket offsets;
    // multimodal_shard_manifest/pipeline_token_budget_pack via doc_id-
    // bucket offsets; win_ratio_to_report via a rollup join). The four
    // below stay low-card BY JUSTIFIED EXCEPTION:
    val allow: Map[String, String] = Map(
      "sample_reservoir_hash" -> ("rank<=4 filter plans as WindowGroupLimit: " +
        "each map task keeps a 4-row heap per type, so only k rows per " +
        "(task, type) ever reach the window sort (pinned below)"),
      "win_cume_dist" -> ("native percent_rank/cume_dist/ntile demo: these " +
        "functions are whole-partition BY DEFINITION; the distributed " +
        "exact-quantile twin on the board is agg_exact_global_median / " +
        "win_top_percent (bucket-offset ranks)"),
      "win_ntile_dist" -> ("native ntile/percent_rank/cume_dist demo over " +
        "o_orderstatus — same whole-partition-by-definition exemption as " +
        "win_cume_dist, same bucket-offset twins"),
      "win_range_numeric" -> ("native RANGE BETWEEN numeric-offset frame " +
        "demo: the value-band frame is what the op exists to exercise; " +
        "the distributed band-rollup twin is analytic_pareto_abc's " +
        "bucket-offset prefix sums"))
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if allow.contains(name) => None
      case (name, fn) =>
        val df = try fn(spark, sf) catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"PlanSpec low-card window sweep: $name first construction " +
              s"failed (${e.getClass.getSimpleName}: ${e.getMessage}) — retrying once")
            fn(spark, sf)
        }
        val bad = df.queryExecution.optimizedPlan.collectWithSubqueries {
          case w: Window if w.partitionSpec.nonEmpty &&
            w.partitionSpec.forall(_.references.forall(a =>
              lowCard.contains(a.name))) &&
            !boundedInput(w.child) => w
        }
        if (bad.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"per-row window partitioned only by low-card columns in: ${offenders.mkString(", ")}")
  }

  test("reservoir sample's rank<=4 pushes into a WindowGroupLimit (allowlist justification)") {
    // sample_reservoir_hash is allowlisted in the low-card window sweep
    // on the claim that InferWindowGroupLimit turns its row_number<=4
    // filter into a map-side 4-row top-k per type. Pin the claim.
    val p = plan(graft.ops.Round7Ops3.sampleReservoirHash(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"reservoir pick must plan as WindowGroupLimit:\n${p.take(2500)}")
  }

  /** Build-spine boundedness for the BNLJ sweep: walks ONLY through
    * cardinality-preserving/reducing nodes from the build root
    * (project / filter / sort / exchange / limit / grouping aggregate)
    * toward a node that bounds the row count by construction. The
    * round-14 version collected matching nodes ANYWHERE in the build
    * subtree, so a corpus-sized build containing an unrelated 1-row
    * aggregate (e.g. under the far side of a join) passed the guard —
    * round-15 ADVICE. Anything not on the allowlisted spine (a scan, a
    * join, a generate/expand, a union) fails CLOSED.
    */
  private def boundedBuild(p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution._
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
    p match {
      // a grouping aggregate only ever REDUCES cardinality: bounded
      // outright when grouping-free (≤1 row), else bounded iff its
      // input is
      case a: BaseAggregateExec =>
        a.groupingExpressions.isEmpty || boundedBuild(a.child)
      case l: GlobalLimitExec if l.limit <= 10000 => true
      case t: TakeOrderedAndProjectExec if t.limit <= 10000 => true
      case l: LocalTableScanExec if l.rows.size <= 10000 => true
      case r: RangeExec if r.numElements <= BigInt(10000) => true
      // a reused broadcast exchange refers to a subtree already
      // validated where it was planned first
      case _: ReusedExchangeExec => true
      // a nested loop join of two bounded inputs is bounded (the
      // scalar x scalar crosses the 1-row-aggregate pattern produces
      // when a query attaches two independent totals)
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec =>
        boundedBuild(j.left) && boundedBuild(j.right)
      // cardinality-preserving/reducing spine nodes: recurse
      case n: ProjectExec          => boundedBuild(n.child)
      case n: FilterExec           => boundedBuild(n.child)
      case n: SortExec             => boundedBuild(n.child)
      case n: LocalLimitExec       => boundedBuild(n.child)
      case n: CoalesceExec         => boundedBuild(n.child)
      case n: BroadcastExchangeExec => boundedBuild(n.child)
      case n: ShuffleExchangeExec  => boundedBuild(n.child)
      case _ => false
    }
  }

  test("BNLJ bounded() rejects a corpus-sized build hiding a 1-row aggregate (negative)") {
    // The exact shape the spine walk exists to catch: the build side is
    // the RAW events table joined to a scalar aggregate — the old
    // anywhere-in-subtree collect saw the grouping-free aggregate and
    // called the corpus-sized build bounded.
    import org.apache.spark.sql.functions.{broadcast, count, lit}
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val poisoned = ev.select($"event_id", $"value")
      .crossJoin(ev.agg(count(lit(1)).as("n_total")))   // bounded subtree INSIDE
    val df = Tables.nation(spark, sf)
      .crossJoin(broadcast(poisoned))                    // corpus-sized build
    val builds = df.queryExecution.sparkPlan.collect {
      case j: BroadcastNestedLoopJoinExec =>
        j.buildSide match {
          case org.apache.spark.sql.catalyst.optimizer.BuildLeft  => j.left
          case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
        }
    }
    assert(builds.nonEmpty, "fixture must plan a BNLJ")
    // the corpus-sized poisoned build must FAIL the walk even though a
    // 1-row aggregate exists somewhere inside it
    assert(builds.exists(b => !boundedBuild(b)),
      s"spine walk accepted a corpus-sized build:\n${builds.mkString("\n")}")
  }

  test("NO query plans an unbounded BroadcastNestedLoopJoin (full-board sweep)") {
    // Round-14 (verdict task 7): the second class of scale-killer a
    // green oracle can't catch — a nested-loop join whose broadcast
    // side grows with the data. The sanctioned exception is the
    // 1-row-aggregate pattern (crossJoin(broadcast(globalAgg))) used
    // board-wide to attach a scalar total: its build side is an
    // aggregate with NO grouping keys, provably ≤1 row at any scale.
    // The sweep first checks the BUILD subtree of every BNLJ
    // STRUCTURALLY: a grouping-free aggregate, a small GlobalLimit/
    // TakeOrdered, or a small LocalTableScan each bounds the broadcast
    // by construction, so the ~40 scalar-total crossJoins pass with no
    // listing. What structure can't prove is DOMAIN-bounded
    // cardinality — a literal-key probe filter, a rollup keyed by
    // calendar/bucket/segment, a fixed dimension — so those ops are
    // allowlisted BY NAME with the bound that justifies each. An op
    // not listed here whose BNLJ build side is corpus-sized (it merely
    // MEASURES small at toy SF) fails the sweep.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalTableScanExec, TakeOrderedAndProjectExec, RangeExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val allow: Map[String, String] = Map(
      // --- fixed-k probe / seed / centroid subsets: a literal key
      // filter (vec_id === 0 / < k) selects a CONSTANT number of rows
      // regardless of corpus size; the corpus side stays streamed ---
      "sim_ann_filtered" -> "16 centroids + 1 probe by literal vec_id filter",
      "sim_ann_index_batch_probe" -> "8 probes by literal vec_id filter vs 16-row centroid artifact",
      "sim_ann_index_persist" -> "1 probe vs 16-row centroid artifact (limit 4 probe cells)",
      "sim_ann_ivf" -> "1 probe vs 16-row centroid table (limit nProbe cells)",
      "sim_ann_pq" -> "k-row codebook + 1 probe by literal vec_id filter",
      "sim_borda_fusion" -> "1 probe by literal vec_id filter; fused lists limit 20",
      "sim_hamming_topk" -> "literal-filtered probe signature set broadcast",
      "sim_hybrid_rrf" -> "1 probe by literal vec_id filter; both lists limit k",
      "sim_knn_batch" -> "8 probes by literal vec_id filter",
      "sim_knn_query" -> "1 probe by literal vec_id filter",
      "sim_matryoshka_prefix_recall" -> "8 probes by literal vec_id filter",
      "sim_mips_topk" -> "1 probe by literal vec_id filter",
      "sim_range_search" -> "1 probe by literal vec_id filter",
      "sim_spherical_assign_round" -> "5 seed vectors by literal vec_id filter",
      // --- fixed dimensions / literal tables: cardinality set by the
      // schema or the query text, not the data volume ---
      "join_cross_small" -> "region x nation demo: 5x25 fixed dimensions",
      "fn_fuzzy_brand_match" -> "canonical brand list (~25 rows, schema-fixed) broadcast",
      "ml_nb_sql_exact" -> "language list (5) and vocabulary rollup (Heaps-law sublinear) broadcast",
      "sql_tvf_inline" -> "inline VALUES literal table",
      "join_fuzzy_levenshtein" -> "distinct-token vocabulary self-join (Heaps-law sublinear in corpus rows)",
      // --- rollup self-joins bounded by group-key DOMAIN cardinality:
      // buckets over a fixed value range, calendar periods, segment /
      // event-type keys — these grow with the domain, not with rows ---
      "agg_exact_global_median" -> "value-domain bucket offsets (c div 2^20) triangular join",
      "agg_tukey_summary" -> "quartile scalars derived via bounded bucket rollups",
      "analytic_ab_lift" -> "two segment aggregate rows cross-joined",
      "analytic_basket_size_dist" -> "distinct basket sizes (bounded by max order width ~7)",
      "analytic_concurrent_orders" -> "calendar-month rollup triangular join",
      "analytic_diff_in_diff" -> "2x2 period x cohort aggregate grid",
      "analytic_gini_decomposition" -> "segment-pair grid (5 segments)",
      "analytic_kendall_tau" -> "per-type rank rollup pairs (5 event types)",
      "analytic_lorenz_gini" -> "price-domain buckets + 10 deciles triangular joins",
      "analytic_pareto_abc" -> "price-domain bucket offsets triangular join",
      "analytic_skyline_2d" -> "price-domain bucket offsets triangular join",
      "analytic_top_share_concentration" -> "value-domain bucket offsets triangular join",
      "analytic_welch_ttest" -> "two segment aggregate rows cross-joined",
      "ml_effect_size" -> "event-type pair grid (5 types)",
      "analytic_fdr_bh" -> "event-type pair grid (5 types) + 10-row BH fold",
      "ml_gain_lift" -> "10-decile rollup triangular join",
      "ml_gini_split" -> "threshold grid (24 hours) x class rollup",
      "ml_ks_test" -> "value-domain bucket ECDF offsets triangular join",
      "analytic_mann_whitney_u" -> "value-domain bucket offsets triangular join (ml_ks_test shape)",
      "ml_threshold_sweep" -> "score-bin rollup triangular join (fixed bin count)",
      "ml_permutation_importance" -> "per-language centroid table broadcast (5 rows)",
      "ml_centroid_classifier" -> "per-label centroid array table (label-domain rows, one row per label) broadcast",
      "pipeline_cross_source_overlap" -> "source-pair grid (~20 sources, feed-count bounded)",
      "text_style_similarity" -> "source-profile pair grid (~20 sources)",
      "ts_decompose_additive" -> "calendar-day rollup band self-join (wall-clock bounded)",
      "ts_rolling_corr" -> "calendar-day rollup band self-join (wall-clock bounded)",
      // --- round-16 additions: the build-spine walk (stricter than the
      // round-14 anywhere-in-subtree collect) fails closed on these
      // DOMAIN-bounded builds the old check passed structurally ---
      "analytic_wilcoxon_signed_rank" -> "per-user |diff| bucket rollup (div 2^20, value-domain bounded) broadcast",
      "ml_knn_classify" -> "md5 count-capped probe subset (pmod(draw, P)=0 with P=ceil(n/target): ~constant probes at any corpus size)",
      "stream_watermark_late_data" -> "4-value pid rollup (least(3, floor(...)) key domain) broadcast")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if allow.contains(name) => None
      case (name, fn) =>
        val df = try fn(spark, sf) catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(
              s"PlanSpec BNLJ sweep: $name first construction failed " +
              s"(${e.getClass.getSimpleName}: ${e.getMessage}) — retrying once")
            fn(spark, sf)
        }
        val bad = df.queryExecution.sparkPlan.collect {
          case j: BroadcastNestedLoopJoinExec =>
            val build = j.buildSide match {
              case org.apache.spark.sql.catalyst.optimizer.BuildLeft  => j.left
              case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
            }
            boundedBuild(build)
        }
        if (bad.contains(false)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded BroadcastNestedLoopJoin in: ${offenders.mkString(", ")}")
  }

  test("ANALYZE'd star schema: catalog stats flow into planning and reorder the join") {
    // Round-14 (verdict task 8): at 100 TB, join order on the 6-table
    // star is a cost-based decision, and cost needs ANALYZE statistics.
    // scale_cbo_stats registers + ANALYZEs the tables; this pin proves
    // the collected stats actually reach the optimizer: under
    // spark.sql.cbo.{enabled,joinReorder.enabled} the DELIBERATELY
    // mis-ordered FROM (fact table first, tiny dims last) must plan a
    // DIFFERENT join tree than the statistics-blind optimizer, which
    // preserves the written order.
    val names = graft.ops.Round14Ops.cboTables(spark, sf)
    val q = s"""
      SELECT r.r_name, count(*) AS n
      FROM ${names("lineitem")} l
      JOIN ${names("orders")} o ON l.l_orderkey = o.o_orderkey
      JOIN ${names("customer")} c ON o.o_custkey = c.c_custkey
      JOIN ${names("nation")} n ON c.c_nationkey = n.n_nationkey
      JOIN ${names("region")} r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name"""
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    def optimized(on: Boolean): String = {
      keys.foreach(k => conf.set(k, on.toString))
      // force optimization INSIDE the conf scope
      spark.sql(q).queryExecution.optimizedPlan.toString
    }
    try {
      val off = optimized(false)
      val on = optimized(true)
      // stats visible: under CBO the fact relation reports the exact
      // ANALYZE row count, not a size-derived guess
      val rc = spark.table(names("lineitem"))
        .queryExecution.optimizedPlan.stats.rowCount
      assert(rc.isDefined && rc.get > 0,
        s"ANALYZE row count must reach the plan (got $rc)")
      assert(on != off,
        s"CBO + stats must change the mis-ordered star join tree:\n$on")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("filtered ANN pushes the lang predicate into the documents scan") {
    // sim_ann_filtered's contract: the predicate prunes the corpus
    // BEFORE centroid assignment and distance work. The lang filter
    // must reach the documents parquet scan as a pushed filter (scan
    // reads only doc_id+lang), not run as a post-filter on scored
    // candidates.
    val p = plan(graft.ops.Round11Ops3.simAnnFiltered(spark, sf))
    val scanBlock = p.split("\n\n").find(b =>
      b.contains("documents.parquet") && b.contains("PushedFilters"))
    assert(scanBlock.isDefined, s"no documents scan with PushedFilters:\n${p.take(2500)}")
    assert(scanBlock.get.contains("EqualTo(lang,en)"),
      s"lang predicate must be pushed to the scan:\n${scanBlock.get}")
    val readSchema = scanBlock.get.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("lang") &&
      !readSchema.contains("text"),
      s"probe-side scan must read only doc_id+lang:\n$readSchema")
  }

  test("star join broadcasts every dimension side (no BNLJ, ≥2 BHJ)") {
    // 6-table star: nation/region/customer-side dims are broadcast-
    // sized by contract; the fact side must stream through
    // BroadcastHashJoins. A BroadcastNestedLoopJoin anywhere would mean
    // a join degenerated to a non-equi form. (Round-8's driver bench
    // read 6.5 s for this query — load noise, but without a pinned
    // plan shape that took a judge session to dismiss.)
    val p = plan(Relational.joinMultiwayStar(spark, sf))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected ≥2 broadcast dim joins:\n${p.take(2000)}")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"star join must stay equi-keyed:\n${p.take(2000)}")
  }

  test("runtime bloom filter is injected on the probe side of the big-big join") {
    // InjectRuntimeFilter: the filtered (creation) side builds a bloom
    // filter at runtime and the probe side applies might_contain
    // before its shuffle — the shuffle-volume reducer between static
    // pushdown and DPP. The join itself must stay big-big (SMJ): a
    // broadcast join would make the bloom redundant and Spark skips it.
    val p = plan(graft.ops.Round9Ops.scaleRuntimeBloomJoin(spark, sf))
    assert(p.toLowerCase.contains("bloom"),
      s"expected a runtime bloom filter in:\n${p.take(2500)}")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"bloom demo must keep the shuffle join:\n${p.take(1500)}")
  }

  test("cosine/quantized top-k use the grid shuffle join with per-cell top-k") {
    // Round-11 rewrite: both exact all-pairs top-k ops generate pairs
    // via the G×G grid SHUFFLE join (LlmOps.gridPairs) — with
    // statistics-driven auto-broadcast disabled (the 100 TB condition)
    // the plan must contain NO BroadcastExchange — and the top-k must
    // be TakeOrderedAndProject (per-partition top-k map-side, merge on
    // the driver), never a global Sort.
    val c = spark.conf
    val saved = c.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Seq(
        "sim_cosine_topk" -> graft.ops.LlmOps.simCosineTopk(spark, sf),
        "sim_embedding_quantize" -> graft.ops.Round8Ops.simEmbeddingQuantize(spark, sf)
      ).foreach { case (name, df) =>
        val lp = df.queryExecution.optimizedPlan.toString
        assert(!lp.toLowerCase.contains("hint") && !lp.contains("ResolvedHint"),
          s"$name must not force a broadcast:\n${lp.take(1500)}")
        val p = plan(df)
        assert(!p.contains("BroadcastExchange"),
          s"$name must shuffle, not broadcast, its pair-generation side:\n${p.take(2000)}")
        assert(p.contains("TakeOrderedAndProject"),
          s"$name top-k must not global-sort:\n${p.take(1500)}")
      }
    } finally saved match {
      case Some(v) => c.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => c.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("ngram jaccard + SRP ANN generate pairs via shuffle joins (no corpus broadcast)") {
    // Round-10 rewrite of both ops: pair generation must be a
    // fragment-replicate / (band,sig) SHUFFLE join. With statistics-
    // driven auto-broadcast disabled (the 100 TB condition: a corpus-
    // sized side never measures under the threshold), the physical
    // plan must contain NO BroadcastExchange at all — the round-9
    // ngram variant shipped the whole sketch table to every executor.
    val c = spark.conf
    val saved = c.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Seq(
        "dedup_ngram_jaccard" -> graft.ops.Round3Ops.dedupNgramJaccard(spark, sf),
        "dedup_near_embedding_ann" -> graft.ops.Round5Ops.dedupNearEmbeddingAnn(spark, sf)
      ).foreach { case (name, df) =>
        val lp = df.queryExecution.optimizedPlan.toString
        assert(!lp.toLowerCase.contains("hint") && !lp.contains("ResolvedHint"),
          s"$name must not force a broadcast:\n${lp.take(1500)}")
        val p = plan(df)
        assert(!p.contains("BroadcastExchange"),
          s"$name must shuffle, not broadcast, its pair-generation side:\n${p.take(2000)}")
      }
    } finally saved match {
      case Some(v) => c.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => c.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }


  test("month-over-month self-join reuses the monthly aggregate's exchange") {
    // scale_exchange_reuse's whole point: both join branches sit on
    // the identical scan→partial-agg→shuffle subtree, so the fact
    // table is read and shuffled ONCE — the second branch must plan as
    // ReusedExchange (or AQE's stage reuse), never a second scan.
    val p = plan(graft.ops.Round10Ops2.scaleExchangeReuse(spark, sf))
    assert(p.contains("ReusedExchange") || p.contains("StageReuse"),
      s"self-joined aggregate must reuse its exchange:\n${p.take(2500)}")
    // distinct scan NODES (tree lines repeat the shared subtree under
    // the reused branch): one in the final plan + one in the initial
    val scanIds = """\((\d+)\) Scan parquet""".r
      .findAllMatchIn(p).map(_.group(1)).toSet
    assert(scanIds.size <= 2,
      s"the orders scan must plan once per section, saw nodes $scanIds:\n" +
        p.linesIterator.filter(_.contains("Scan parquet")).mkString("\n"))
  }

  test("selective-filter aggregate coalesces post-shuffle partitions under AQE") {
    // 32 shuffle partitions carrying a few KB each must fold into a
    // handful of post-shuffle reads — the knob that stops a selective
    // filter from paying tens of thousands of tiny tasks at 100 TB
    val p = plan(graft.ops.Round10Ops7.scaleAqeCoalesce(spark, sf))
    assert(p.contains("AQEShuffleRead") && p.contains("coalesced"),
      s"expected AQE-coalesced shuffle read in:\n${p.take(2500)}")
  }

  test("QUALIFY emulation gets the per-partition top-k pushdown (WindowGroupLimit)") {
    // rank <= k over a partitioned row_number must NOT rank every row:
    // Catalyst's InferWindowGroupLimit turns it into a running top-k
    // per partition (partial before the shuffle, final after), so each
    // month contributes k+ties rows to the window sort, not its whole
    // order history — the property that keeps QUALIFY-style queries
    // flat at 100 TB.
    val p = plan(graft.ops.Round10Ops3.sqlQualify(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"rank<=k filter must push into a WindowGroupLimit:\n${p.take(2500)}")
  }

  test("pareto prefix sum: window is bucket-partitioned and the plan has no nested loop on the big side") {
    // the two-phase distributed prefix sum must keep the per-row
    // window partitioned by bucket (the board sweep enforces the
    // unpartitioned-Window ban; this pin additionally asserts the
    // bucket-offset theta join stays on the TINY bucket-totals side —
    // a BroadcastNestedLoopJoin over ~#buckets rows, never over parts)
    val df = graft.ops.Round10Ops3.analyticParetoAbc(spark, sf)
    val p = plan(df)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LWindow => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "prefix-sum window must be partitioned by bucket")
    // the only join allowed to nested-loop is bucket-totals × itself;
    // its build side must be an aggregate (the tiny rollup), which the
    // formatted plan shows as HashAggregate feeding the BNLJ broadcast
    if (p.contains("BroadcastNestedLoopJoin")) {
      assert(p.contains("HashAggregate"),
        "BNLJ must sit on the aggregated bucket-totals, not raw rows")
    }
  }

  test("shuffle-hash hint produces a ShuffledHashJoin, not sort-merge or broadcast") {
    // the demo's point is the explicit strategy: hash-build the hinted
    // side after a shuffle — no sort of either side, no broadcast of a
    // table that only fits an executor
    val p = plan(graft.ops.Round11Ops2.scaleShuffleHashJoin(spark, sf))
    assert(p.contains("ShuffledHashJoin"),
      s"shuffle_hash hint must select ShuffledHashJoin:\n${p.take(2000)}")
    assert(!p.contains("SortMergeJoin"),
      s"hinted join must not fall back to sort-merge:\n${p.take(2000)}")
  }

  test("hybrid skew join routes hot keys to broadcast AND cold keys to shuffle") {
    // the op's contract is physical: the top-16 hot keys' rows take a
    // BroadcastHashJoin (bounded build side), the cold remainder takes
    // a ShuffledHashJoin — blanket salting would inflate the cold
    // path, a blanket broadcast would ship the whole dim
    val p = plan(graft.ops.Round11Ops23.skewHybridJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"hot path must broadcast:\n${p.take(2500)}")
    assert(p.contains("ShuffledHashJoin"),
      s"cold path must shuffle-hash:\n${p.take(2500)}")
  }

  test("batch kNN per-probe top-10 becomes a WindowGroupLimit, not a full rank") {
    // rank <= 10 over probe-partitioned row_number must run as a
    // running top-k per partition: only probes x 10 (+ties) rows reach
    // the final window sort, so the corpus side streams through once
    // at any size
    val p = plan(graft.ops.Round11Ops18.simKnnBatch(spark, sf))
    assert(p.contains("WindowGroupLimit"),
      s"per-probe top-k must push into WindowGroupLimit:\n${p.take(2500)}")
  }

  test("exact global quantiles: windows bucket-bounded, no corpus-wide sort") {
    // distributed selection must not degenerate into a global ORDER BY
    // of the value column: the only Sort allowed over corpus-sized
    // input is the final 3-row output ordering after the aggregate
    val df = graft.ops.Round11Ops22.aggExactGlobalMedian(spark, sf)
    val p = plan(df)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LWindow => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "selection re-rank must stay partitioned by quantile target")
  }

  test("win_rolling_median: exactly the four planned hash exchanges, no extra shuffle") {
    // The TwoPhase rewrite budgets FOUR hash exchanges: (1) the
    // (event_type, day) intra-day rank — the ONLY corpus-sized one,
    // (2) the census branch's own (event_type, day) exchange — its
    // partial groupBy shrinks the corpus map-side, so the shuffle
    // carries |types|x|days| rows per task (a separate scan branch;
    // ReuseExchange cannot fire across the differing downstream
    // projections), (3) the |types|x|days|-row census offset window on
    // event_type, (4) the (event_type, chunk) frame window after the
    // carry union. The offsets join back as a broadcast, so a FIFTH
    // hash shuffle would mean the rewrite accidentally re-shuffled the
    // corpus (round-16 verdict task 6). Final output sort adds range
    // partitioning, not hash. Round-18 note: the round-17 form of this
    // pin asserted <=3 over a string count that was always 0 (see
    // hashShuffles); the true executed count was 4 all along — the
    // budget now states the real plan.
    val df = graft.ops.Round10Ops7.winRollingMedian(spark, sf)
    val hashEx = hashShuffles(df)
    assert(hashEx <= 4,
      s"rolling median budgets 4 hash shuffles (day-rank, census " +
        s"partial-agg, census window, chunk); saw $hashEx")
    assert(plan(df).contains("BroadcastHashJoin"),
      "census offsets must join back as a broadcast")
  }

  test("ts_sma_crossover: windows run over the daily rollup, one corpus shuffle") {
    // Cost model: ONE corpus-sized hash exchange (the per-(type, day)
    // revenue rollup); every window after it runs over the
    // |types|x|days|-row daily table. A second corpus-sized exchange
    // (or a window whose input is the raw events) would be the
    // accidental-regression shape this pin exists to catch.
    val df = graft.ops.Round11Ops9.tsSmaCrossover(spark, sf)
    val hashEx = hashShuffles(df)
    assert(hashEx <= 2,
      s"sma crossover budgets the rollup exchange (+1 window repartition " +
        s"of the 150-row daily table); saw $hashEx hash shuffles")
    // every window's input must be the aggregated daily table — a
    // window whose subtree has no Aggregate is running over raw events
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LWindow => w
    }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"window must consume the daily rollup, not raw events:\n$w")
    }
  }

  test("agg_weighted_median: census broadcasts back, no corpus-sized shuffle or sort") {
    // Boundary-bucket selection (round-17 rewrite, round-17 verdict
    // task 4: pin it like win_rolling_median). Budget is FOUR hash
    // shuffles, NONE corpus-sized: (1) the (flag, bucket) census
    // groupBy — partial aggregation shrinks the corpus map-side, the
    // shuffle carries ~|flags|x|buckets| rows, (2) the census offset/
    // total/pick windows on c_rf (census rows), (3) the intra-bucket
    // running-sum window on (flag, bucket) — its input is the corpus
    // FILTERED to the single median bucket per flag by the broadcast
    // join, so bucket-sized, (4) the final per-flag aggregate. A fifth
    // shuffle, or the census joining back as anything but a broadcast,
    // is the regression shape this pin catches: the pre-rewrite form
    // ran the prefix sum over EVERY row (full corpus shuffle + sort,
    // 1.42 s -> 0.69 s at sf0.1 when removed).
    val df = graft.ops.Round11Ops19.aggWeightedMedian(spark, sf)
    val hashEx = hashShuffles(df)
    assert(hashEx <= 4,
      s"weighted median budgets 4 hash shuffles (census partial-agg, " +
        s"census windows, median-bucket window, final agg); saw $hashEx")
    assert(plan(df).contains("BroadcastHashJoin"),
      "the per-flag median-bucket census must join back as a broadcast")
    // no unpartitioned (global) window anywhere: a corpus-wide sort
    // hiding inside an empty partitionSpec is the classic regression
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LWindow => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "every window must stay partitioned (no global sort)")
  }

  test("agg_trimmed_mean: census broadcasts back, no corpus-sized shuffle or sort") {
    // Same boundary-bucket shape as agg_weighted_median; budget is SIX
    // hash shuffles because unionByName re-aliases the second census
    // consumer, so the (flag, bucket) census groupBy + its c_rf spans
    // windows each plan twice (whole-bucket leg and straddling-bucket
    // leg — both census-sized; the corpus is scanned, never shuffled),
    // plus (5) the straddling-bucket row_number window, bucket-sized
    // behind the broadcast semi-filter, and (6) the final per-flag
    // aggregate over the union. The pre-rewrite form ranked the whole
    // corpus (3.19 s -> 1.40 s at sf0.1 when removed); a seventh
    // shuffle or a non-broadcast bounds join is that regression
    // returning.
    val df = graft.ops.Round11Ops26.aggTrimmedMean(spark, sf)
    val hashEx = hashShuffles(df)
    assert(hashEx <= 6,
      s"trimmed mean budgets 6 hash shuffles (2x census partial-agg, " +
        s"2x census windows, boundary-bucket window, final agg); saw $hashEx")
    assert(plan(df).contains("BroadcastHashJoin"),
      "the straddling-bucket bounds must join back as a broadcast")
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collectWithSubqueries {
      case w: LWindow => w
    }
    assert(wins.nonEmpty && wins.forall(_.partitionSpec.nonEmpty),
      "every window must stay partitioned (no global sort)")
  }

  test("cache-reuse: both band branches read the InMemory rollup, not lineitem") {
    // the op's point: the corpus-sized aggregate materializes ONCE;
    // each consumer scans the |nations|-sized cached relation
    val df = graft.ops.Round11Ops8.scaleCacheReuse(spark, sf)
    try {
      val p = plan(df)
      val scans = p.linesIterator.count(_.contains("TableCacheQueryStage"))
      assert(p.contains("InMemoryTableScan") || scans >= 2,
        s"cached rollup must serve the branches:\n${p.take(3000)}")
    } finally spark.sharedState.cacheManager.clearCache()
  }
}
