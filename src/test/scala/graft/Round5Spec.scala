package graft

import graft.ops.{LlmOps2, Round5Ops}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 additions: grid-partitioned exact embedding near-dup
  * (identity with brute force), the SRP ANN path (recall floor),
  * keyed upsert semantics, and the AQE-skew demonstration join.
  */
class Round5Spec extends AnyFunSuite with SparkFixture {

  test("grid-partitioned near-embedding equals the brute-force all-pairs result") {
    import spark.implicits._
    val grid = LlmOps2.dedupNearEmbedding(spark, sf)
      .as[(Long, Long, Double)].collect().toSeq
    // reference: unpartitioned cross-pair scan, same kernels
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val t = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding",
        sqrt(expr("graft_dot(embedding, embedding)")).as("nrm"))
    val a = t.select($"vec_id".as("id_a"), $"embedding".as("ea"), $"nrm".as("na"))
    val b = t.select($"vec_id".as("id_b"), $"embedding".as("eb"), $"nrm".as("nb"))
    val brute = a.join(b, $"id_a" < $"id_b")
      .withColumn("cos", expr("graft_dot(ea, eb)") / ($"na" * $"nb"))
      .filter($"cos" >= 0.4)
      .select($"id_a", $"id_b", round($"cos", 6).as("cosine"))
      .orderBy($"id_a", $"id_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(grid === brute)
    assert(grid.nonEmpty, "threshold must not produce a vacuous identity")
  }

  test("SRP ANN near-embedding is a subset of exact with recall >= 0.8") {
    import spark.implicits._
    // ground truth: brute-force all-pairs exact cosine over the SAME
    // derived near-dup corpus at the same θ=0.7
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val t = Round5Ops.annCorpus(spark, sf)
    val a = t.select($"vec_id".as("id_a"), $"embedding".as("ea"), $"nrm".as("na"))
    val b = t.select($"vec_id".as("id_b"), $"embedding".as("eb"), $"nrm".as("nb"))
    val exact = a.join(b, $"id_a" < $"id_b")
      .withColumn("cos", expr("graft_dot(ea, eb)") / ($"na" * $"nb"))
      .filter($"cos" >= Round5Ops.annTheta)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.size >= 50, s"derived corpus must plant enough near-dup pairs, got ${exact.size}")
    val ann = Round5Ops.dedupNearEmbeddingAnn(spark, sf)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert((ann -- exact).isEmpty,
      "exact cosine verification must keep every ANN pair above threshold")
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"SRP banding recall $recall below floor")
  }

  test("SRP ANN candidate volume is bounded (< 8n raw band collisions, not O(n^2))") {
    val n = Round5Ops.annCorpus(spark, sf).count()
    val candidates = Round5Ops.annCandidates(spark, sf).count()
    // the round-9 3-bit bands produced ~full-cross-product candidate
    // volume (~n²/2 ×8 bands); 16-bit bands must keep it linear
    assert(candidates < 8 * n,
      s"candidate volume $candidates vs n=$n — banding is not pruning")
    assert(candidates > 0, "banding must still produce candidates")
  }

  test("upsert: updates change price+status in place, inserts append, rest untouched") {
    import spark.implicits._
    val before = Tables.orders(spark, sf)
      .select($"o_orderkey", Tables.money($"o_totalprice").as("p"))
      .as[(Long, BigDecimal)].collect().toMap
    // o_totalprice is DOUBLE on output (determinism protocol); cents
    // are far below 2^53 so the comparisons below stay exact
    val after = Round5Ops.pipelineUpsert(spark, sf)
      .as[(Long, Double, String)].collect()
    val byKey = after.map(r => r._1 -> r).toMap
    assert(after.length === byKey.size, "upsert output must be unique per key")
    val nUpd = before.keys.count(_ % 97 == 0)
    val nIns = before.keys.count(_ % 101 == 0)
    assert(after.length === before.size + nIns)
    before.foreach { case (k, p) =>
      val (_, price, status) = byKey(k)
      if (k % 97 == 0) {
        assert(price === (p + 100).toDouble && status === "U",
          s"key $k must be updated")
      } else {
        assert(price === p.toDouble, s"key $k must keep its price")
        assert(status != "N", s"existing key $k must not look inserted")
      }
      if (k % 101 == 0) {
        val (_, ip, is) = byKey(k + 1000000000L)
        assert(ip === p.toDouble && is === "N", s"key $k must spawn an insert")
      }
    }
    assert(nUpd > 0 && nIns > 0, "both merge branches must be exercised")
  }

  test("AQE splits the skewed partition in skew_aqe_join (OptimizeSkewedJoin fires)") {
    val c = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.forceOptimizeSkewedJoin")
      .map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.adaptive.enabled", "true")
      c.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // sf0.001-sized thresholds: the hot partition (~75% of rows) must
      // cross them while the median stays under (x2 amplification now,
      // so thresholds are 4x lower than the round-5 x8 values)
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512b")
      c.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // the downstream groupBy re-shuffles regardless, so AQE's
      // "no extra shuffle" veto would skip the split; force lifts only
      // that veto — the split itself still requires real skew stats
      c.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      val df = Round5Ops.skewAqeJoin(spark, sf)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the sort-merge join:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None)    => c.unset(k)
    }
  }
}
