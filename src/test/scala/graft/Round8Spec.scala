package graft

import graft.ops.Round8Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic edge cases of the round-8 operators that the value-equality
  * oracle proves only in aggregate: CDC delete-wins, EWMA seeding,
  * survivorship canonical choice, quantization bounds, null-safe join
  * completeness, backfill isolation.
  */
class Round8Spec extends AnyFunSuite with SparkFixture {
  import spark.implicits._

  test("cdc apply: a user whose LAST op is a delete is absent from final state") {
    val ev = graft.Tables.events(spark, sf)
      .filter($"event_type".isin("signup", "view", "error"))
    val lastOp = ev
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)))
      .filter($"rn" === 1)
    val deleted = lastOp.filter($"event_type" === "error")
      .select($"user_id").as[Long].collect().toSet
    val kept = Round8Ops.pipelineCdcApply(spark, sf)
      .select($"user_id").as[Long].collect().toSet
    assert(deleted.nonEmpty, "fixture should contain at least one trailing delete")
    assert(deleted.intersect(kept).isEmpty,
      s"deleted keys must not survive: ${deleted.intersect(kept).take(5)}")
    val u0 = lastOp.filter($"event_type" =!= "error").count()
    assert(kept.size.toLong === u0, "every non-deleted key keeps exactly one row")
  }

  test("ewma: a user's first event equals its own value (weight chain collapses)") {
    val first = Round8Ops.tsEwma(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"event_id")))
    // first event per user: ewma = round(v, 6) by definition
    val ev = graft.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id",
        round(graft.Tables.money($"value").cast("double"), 6).as("expect"))
    val joined = first.filter($"rn" === 1)
      .join(ev, Seq("user_id", "event_id"))
    assert(joined.count() > 0)
    assert(joined.filter($"ewma" =!= $"expect").count() === 0)
  }

  test("survivorship: canonical_id is the cluster min and a member") {
    val s = Round8Ops.pipelineDedupSurvivorship(spark, sf)
    assert(s.filter($"canonical_id" =!= $"cluster_id").count() === 0,
      "CC labels clusters by min member id, so canonical == cluster_id")
    assert(s.filter($"n_members" < 2).count() === 0,
      "clusters come from pairs, so every cluster has >= 2 members")
  }

  test("quantization: codes bounded by ±127 and exactly integer-valued") {
    val q = graft.Tables.embeddings(spark, sf)
      .select($"vec_id",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("scale",
        lit(127.0) / expr("array_max(transform(e, x -> abs(x)))"))
      .withColumn("q", expr("transform(e, x -> round(x * scale))"))
      .withColumn("bad", expr(
        "size(filter(q, v -> abs(v) > 127.0 OR v != CAST(CAST(v AS BIGINT) AS DOUBLE)))"))
    assert(q.filter($"bad" > 0).count() === 0)
  }

  test("quantized cosine: within int8 error bound of exact, recall@50 >= 0.8 on exact top-10") {
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val exact = graft.ops.LlmOps.simCosineTopk(spark, sf)
      .select($"id_a", $"id_b", $"cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val quant = Round8Ops.simEmbeddingQuantize(spark, sf)
      .select($"id_a", $"id_b", $"q_cos").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // error bound: int8 symmetric quantization perturbs each coord by
    // <= max|x|/254; cosine error stays well under 0.03 at 64 dims
    val common = exact.keySet.intersect(quant.keySet)
    assert(common.nonEmpty)
    common.foreach { k =>
      assert(math.abs(exact(k) - quant(k)) < 0.03,
        s"pair $k: exact=${exact(k)} quant=${quant(k)}")
    }
    val top10 = exact.toSeq.sortBy(-_._2).take(10).map(_._1)
    val recall = top10.count(quant.contains).toDouble / top10.size
    assert(recall >= 0.8, s"recall@50 of exact top-10 = $recall")
  }

  test("null-safe join: the NULL bucket matches itself (plain = would drop it)") {
    val r = Round8Ops.joinNullSafeEq(spark, sf)
    val nullRow = r.filter($"k".isNull).collect()
    assert(nullRow.length === 1, "exactly one NULL-key row must survive")
    assert(nullRow.head.getLong(1) === nullRow.head.getLong(2),
      "both sides count the same NULL bucket")
  }

  test("backfill: only the purchase partition changes") {
    val audited = Round8Ops.pipelineBackfillPartition(spark, sf)
    val raw = graft.Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(sum(graft.Tables.money($"value")).cast("double").as("orig"))
    val j = audited.join(raw, Seq("event_type"))
    assert(j.filter($"event_type" =!= "purchase")
      .filter($"sum_value" =!= $"orig").count() === 0,
      "non-purchase partitions must be byte-for-byte the v1 data")
    assert(j.filter($"event_type" === "purchase")
      .filter($"sum_value" === $"orig").count() === 0,
      "the purchase partition must reflect the corrected recompute")
  }
}
