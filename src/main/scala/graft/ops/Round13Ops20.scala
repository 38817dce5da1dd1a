package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 20: the IVF nprobe recall/cost sweep —
  * the serving-time tuning table for the persisted ANN index.
  */
object Round13Ops20 {

  /** Recall@10 and scan cost vs nprobe ∈ {1,2,4,nCent} through the
    * persisted IVF index — THE serving knob: more probed cells buys
    * recall with linearly more scanned candidates. One candidate pass
    * (probes × corpus, cell rank attached from the tiny centroid
    * table), then per-nprobe ranks over the SAME pairs; the panel's
    * last entry is the v4 index's full cell count (read from the tiny
    * centroids file — was the fixed 16 before round 17's √n sizing),
    * so every cell is probed and recall is exactly 1.0 by construction —
    * pinned in Round13Spec20 along with monotonicity, which makes
    * this op self-verifying despite having no SQL oracle (the
    * centroid choice is engine-specific, same reason as sim_ann_ivf).
    */
  def simIvfNprobeSweep(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val path = Round12Ops.ivfIndexPath(spark, sfDir)
    val cents = spark.read.parquet(s"$path/centroids")
    val assigned = spark.read.parquet(s"$path/assign")
      .filter($"rn" === 1).drop("rn")
    // COUNT-CAPPED probe set (round-14 scale probe: the original
    // 1-in-16 FRACTION made probes grow with the corpus, so the
    // nprobe=16 full-scan leg was n²/16 — 19.9× at 10× data; a fixed
    // ~128-probe panel is what a serving-time tuning sweep actually
    // uses, and the pairs leg becomes 128·n, linear). Same md5 coin
    // as sim_cosine_histogram; deterministic at every scale.
    val cap = assigned.agg(
      ceil(count(lit(1)) / 128.0).cast(LongType).as("p"))
    val probes = assigned.crossJoin(broadcast(cap))
      .filter(pmod(expr(
        "CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"),
        $"p") === 0)
      .select($"vec_id".as("qid"), $"embedding".as("pe"), $"nrm".as("pn"))
    // cell rank per (probe, cell): how many cells must be probed
    // before this cell is scanned
    val cellRank = probes.crossJoin(broadcast(cents))
      .withColumn("cos_c", LlmOps.dot($"pe", $"ce") / ($"pn" * $"cn"))
      .withColumn("cr", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos_c".desc, $"cid")))
      .select($"qid", $"cid", $"cr")
    val pairs = assigned.join(
        cellRank.join(probes, Seq("qid")), Seq("cid"))
      .filter($"vec_id" =!= $"qid")
      .withColumn("cos", LlmOps.dot($"embedding", $"pe") / ($"nrm" * $"pn"))
      .select($"qid", $"vec_id", $"cr", $"cos")
      .localCheckpoint()
    val exact = pairs
      .withColumn("xr", row_number().over(
        Window.partitionBy($"qid").orderBy($"cos".desc, $"vec_id")))
      .filter($"xr" <= 10)
      .select($"qid", $"vec_id")
    val nCent = cents.count().toInt // tiny parquet footer read
    val panel = Seq(1, 2, 4).filter(_ < nCent) :+ nCent
    val swept = pairs
      .withColumn("nprobe", explode(array(panel.map(lit): _*)))
      .filter($"cr" <= $"nprobe")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"qid", $"nprobe").orderBy($"cos".desc, $"vec_id")))
    val hits = swept.filter($"rk" <= 10)
      .join(exact, Seq("qid", "vec_id"))
      .groupBy($"nprobe", $"qid").agg(count(lit(1)).as("hit"))
    val cand = swept.groupBy($"nprobe", $"qid")
      .agg(count(lit(1)).as("n_cand"))
    cand.join(hits, Seq("nprobe", "qid"), "left")
      .groupBy($"nprobe")
      .agg(count(lit(1)).as("n_probes"),
        round(avg(coalesce($"hit", lit(0L)).cast(DoubleType) / 10.0), 4)
          .as("avg_recall_at_10"),
        round(avg($"n_cand".cast(DoubleType)), 2).as("avg_candidates"))
      .orderBy($"nprobe")
  }
}
