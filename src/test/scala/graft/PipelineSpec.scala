package graft

import graft.ops.{LlmOps, Pipeline, Reshape}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-2 widening ops: IVF ANN recall, stratified-sample rate bounds,
  * pivot/mode determinism properties not covered by the DuckDB oracle.
  */
class PipelineSpec extends AnyFunSuite with SparkFixture {

  test("IVF ANN recall@10 vs exact kNN is >= 0.5") {
    import spark.implicits._
    val exact = LlmOps.simKnnQuery(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    val ivf = Pipeline.simAnnIvf(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    assert(ivf.size === 10)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@10 $recall below floor (got $ivf vs $exact)")
  }

  test("stratified sample rates land near the per-stratum targets") {
    import spark.implicits._
    val total = graft.Tables.events(spark, sf)
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    val sampled = Pipeline.sampleStratified(spark, sf)
      .groupBy($"event_type").count().as[(String, Long)].collect().toMap
    val targets = Map("purchase" -> 0.5, "click" -> 0.125).withDefaultValue(0.25)
    sampled.foreach { case (t, n) =>
      val rate = n.toDouble / total(t)
      assert(math.abs(rate - targets(t)) <= 0.12,
        s"$t: sampled rate $rate vs target ${targets(t)}")
    }
  }

  test("stratified sample is identical under repartitioning") {
    import spark.implicits._
    val a = Pipeline.sampleStratified(spark, sf).collect().toSeq
    val b = Pipeline.sampleStratified(spark, sf).repartition(13).orderBy($"event_id")
      .collect().toSeq
    assert(a === b)
  }

  test("quality-filter pipeline output is a subset of quality-scored docs") {
    import spark.implicits._
    val kept = Pipeline.pipelineQualityFilter(spark, sf)
    val n = kept.count()
    assert(n > 0, "filter must keep something on the synthetic corpus")
    val langs = kept.select($"lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "fr")))
    val scores = kept.select(min($"score"), max($"n_tokens")).head()
    assert(scores.getDouble(0) >= 0.55)
    assert(scores.getLong(1) <= 400)
  }

  test("pivot cells reconcile with the unpivoted totals") {
    import spark.implicits._
    val pivoted = Reshape.aggPivot(spark, sf)
    val totalByPivot = pivoted
      .select((sum($"f_cnt") + sum($"o_cnt") + sum($"p_cnt")).as("n"))
      .head().getLong(0)
    val direct = graft.Tables.orders(spark, sf).count()
    assert(totalByPivot === direct)
  }

  test("mode pick is deterministic under different partitionings") {
    val a = Reshape.aggMode(spark, sf).collect().toSeq
    val b = Reshape.aggMode(spark, sf).collect().toSeq
    assert(a === b && a.nonEmpty)
  }

  test("connected components agree with a reference union-find (random + path graphs)") {
    import spark.implicits._
    def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.map(x => x -> find(x)).toMap
    }
    val rnd = new scala.util.Random(3)
    val graphs = Seq(
      // a 60-node path: diameter 59 — plain min-label propagation would
      // need 59 rounds; pointer jumping must close it within the cap
      (0L until 59L).map(i => (i, i + 1)),
      // random sparse graph
      Seq.fill(120)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter { case (a, b) => a != b })
    graphs.foreach { edges =>
      val got = graft.ops.Round3Ops.connectedComponents(spark,
          edges.toDF("id_a", "id_b"))
        .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
      val want = unionFind(0, edges)
      assert(got === want, "cluster labels must equal union-find roots (min member)")
    }
  }

  test("connected components: edges stay intra-cluster, label is the min member") {
    import spark.implicits._
    val cc = graft.ops.Round3Ops.dedupConnectedComponents(spark, sf)
      .select($"doc_id", $"cluster_id").as[(Long, Long)].collect().toMap
    assert(cc.nonEmpty)
    // every near-dup edge's endpoints were assigned the same cluster
    val edges = graft.ops.LlmOps.dedupNearJaccard(spark, sf)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    edges.foreach { case (a, b) =>
      assert(cc(a) == cc(b), s"edge ($a,$b) split across clusters")
    }
    // the cluster id is the smallest member of the cluster
    cc.groupBy(_._2).foreach { case (lbl, members) =>
      assert(members.keys.min == lbl, s"cluster $lbl label is not min member")
    }
  }
}
