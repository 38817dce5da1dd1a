package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 3: the retrieval stack — Okapi BM25 over
  * the corpus's inverted-index statistics, reciprocal-rank fusion of
  * the lexical and dense rankings (the hybrid-search primitive), and
  * a filtered ANN probe (predicate applied inside the bucket probe,
  * not post-hoc on the result).
  */
object Round11Ops3 {

  /** Fixed query-term set shared by BM25 and the RRF fusion — three
    * common terms plus the one rare discriminative term in the
    * synthetic vocabulary.
    */
  private[graft] val queryTerms = Seq("spark", "query", "merge", "dup")

  /** Per-document BM25 scores for [[queryTerms]] (k1 = 1.2, b = 0.75),
    * plus the matched-term count. Shared by the retrieval op and the
    * RRF fusion.
    *
    * Exactness protocol: with T = total tokens and N = docs, the tf
    * normalization tf·(k1+1) / (tf + k1·(1−b+b·dl·N/T)) is cleared of
    * its decimal constants by multiplying through by 10·T:
    * 22·tf·T / (10·T·tf + 3·T + 9·dl·N) — every operand is an integer
    * product exact in a double (< 2⁵³ even at 10¹³ tokens), so both
    * engines perform ONE correctly-rounded division. The idf
    * ln((N−df+0.5)/(df+0.5)+1) = ln(2(N+1)/(2df+1)) likewise takes an
    * exactly-computed argument; ln is the one library call, pinned by
    * the repo's round-to-9dp DECIMAL protocol (same as
    * text_perplexity_proxy), and the per-term contributions sum as
    * DECIMAL(28,9) — order-free — before the final display round.
    *
    * Scale shape: two hash aggregates over the token stream (dl, tf),
    * a broadcast of the |Q|-row df table and the 1-row totals, and one
    * corpus-partitioned join tf ⋈ dl on doc_id. Nothing corpus-sized
    * is ever broadcast or collected.
    */
  private def bm25Scores(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, sfDir)
      .select($"doc_id", explode(split($"text", " ")).as("term"))
    val dl = toks.groupBy($"doc_id").agg(count(lit(1)).as("dl"))
    val tot = dl.agg(sum($"dl").as("t"), count(lit(1)).as("n"))
    val tf = toks.filter($"term".isin(queryTerms: _*))
      .groupBy($"doc_id", $"term").agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy($"term").agg(count(lit(1)).as("df"))
    tf.join(dl, Seq("doc_id"))
      .join(broadcast(dft), Seq("term"))
      .crossJoin(broadcast(tot))
      .withColumn("idf",
        round(log(lit(2.0) * ($"n" + 1) / ($"df" * 2 + 1)), 9)
          .cast(DecimalType(28, 9)))
      .withColumn("tfn",
        (lit(22.0) * $"tf" * $"t") /
          (lit(10.0) * $"t" * $"tf" + lit(3.0) * $"t" + lit(9.0) * $"dl" * $"n"))
      .withColumn("c",
        round($"idf".cast(DoubleType) * $"tfn", 9).cast(DecimalType(28, 9)))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_terms"),
        round(sum($"c").cast(DoubleType), 6).as("bm25"))
  }

  /** Okapi BM25 top-15 for the fixed query — the lexical-retrieval
    * scoring an LLM data pipeline runs against its inverted index
    * (text_inverted_index is the artifact; this is the ranker over
    * its df/tf statistics). Top-15 via TakeOrderedAndProject.
    */
  def textBm25Retrieval(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    bm25Scores(spark, sfDir)
      .orderBy($"bm25".desc, $"doc_id")
      .limit(15)
  }

  /** Rank an already-top-k'd (score, id) list window-free: the ≤k
    * rows collapse to ONE array row, array_sort gives the total order
    * (score desc, id asc), posexplode's position is the rank. The
    * unpartitioned-window ban (PlanSpec full-board sweep) applies even
    * to k-bounded inputs; this is the sanctioned textZipfFit shape —
    * state is k structs, never corpus-sized.
    */
  private def rankDesc(topk: DataFrame, rankName: String): DataFrame =
    topk
      .agg(collect_list(struct(col("s"), col("id"))).as("arr"))
      .select(posexplode(array_sort(col("arr"), (l, r) =>
        when(l("s") > r("s"), -1).when(l("s") < r("s"), 1)
          .when(l("id") < r("id"), -1).when(l("id") > r("id"), 1)
          .otherwise(0))).as(Seq("pos", "v")))
      .select(col("v.id").as("doc_id"), (col("pos") + 1).as(rankName))

  /** Reciprocal-rank fusion of the BM25 top-50 and the dense-cosine
    * top-50 (probe = vec 0, doc/vec ids share the corpus id space):
    * rrf = Σ_lists 1/(60+rank) — Cormack et al.'s k=60. Hybrid
    * retrieval's standard merge; integer ranks make the two addends
    * and their one IEEE sum bit-identical on any engine.
    *
    * Scale shape: each list is a TakeOrderedAndProject top-50 (the
    * expensive part is the per-list scoring, already bounded by the
    * BM25/kNN plans); ranking the 50 survivors is the window-free
    * rankDesc shape — bounded by k, not the corpus — and the fusion
    * is a tiny full-outer join of two ≤50-row lists.
    */
  def simHybridRrf(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 50
    val lex = rankDesc(
      bm25Scores(spark, sfDir)
        .select($"bm25".as("s"), $"doc_id".as("id"))
        .orderBy($"s".desc, $"id").limit(k),
      "r_lex")
    val t = LlmOps.embeddingsWithNorm(spark, sfDir)
    val probe = t.filter($"vec_id" === 0)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    val dense = rankDesc(
      t.filter($"vec_id" =!= 0)
        .crossJoin(broadcast(probe))
        .withColumn("s", LlmOps.dot($"embedding", $"pe") / ($"nrm" * $"pn"))
        .select($"s", $"vec_id".as("id"))
        .orderBy($"s".desc, $"id").limit(k),
      "r_dense")
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / ($"r_lex" + 60), lit(0.0)) +
          coalesce(lit(1.0) / ($"r_dense" + 60), lit(0.0)))
      .select($"doc_id", $"r_lex", $"r_dense", round($"rrf", 9).as("rrf"))
      .orderBy($"rrf".desc, $"doc_id")
      .limit(20)
  }

  /** Exact FILTERED kNN — the recall baseline for simAnnFiltered,
    * exposed for LlmSpec (post-filtering an unfiltered kNN is the
    * recall bug the filtered probe avoids; the baseline must filter
    * first too).
    */
  private[graft] def exactFilteredKnn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = LlmOps.embeddingsWithNorm(spark, sfDir)
    val keep = documents(spark, sfDir)
      .filter($"lang" === "en").select($"doc_id")
    val probe = t.filter($"vec_id" === 0)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    t.join(keep, t("vec_id") === keep("doc_id")).drop("doc_id")
      .filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .withColumn("cos", LlmOps.dot($"embedding", $"pe") / ($"nrm" * $"pn"))
      .orderBy($"cos".desc, $"vec_id").limit(10)
      .select($"vec_id", round($"cos", 6).as("cosine"))
  }

  /** Filtered ANN: top-10 dense neighbours of the probe RESTRICTED to
    * lang='en' documents, with the predicate applied inside the IVF
    * bucket probe — the corpus is filtered BEFORE centroid assignment
    * and distance evaluation, so the query does filtered-fraction ×
    * nProbe/nCent of the brute-force work instead of scoring
    * everything and discarding. (Post-filtering an unfiltered ANN
    * result is the classic recall bug: k survivors of the filter may
    * be far fewer than k.) The lang predicate is a pushed parquet
    * filter on the documents scan — PlanSpec pins PushedFilters — and
    * the doc⋈vec id join is statistics-driven (broadcast at test
    * scale, shuffle on the shared id at 100 TB). nProbe=8 of 16
    * centroids; recall ≥ 0.8 vs the exact FILTERED kNN asserted in
    * LlmSpec. No oracle (centroid choice engine-specific, same
    * declaration as sim_ann_ivf).
    */
  def simAnnFiltered(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nCent = 16
    val nProbe = 8
    val t = LlmOps.embeddingsWithNorm(spark, sfDir)
    val cents = t.filter($"vec_id" < nCent)
      .select($"vec_id".as("cid"), $"embedding".as("ce"), $"nrm".as("cn"))
    val keep = documents(spark, sfDir)
      .filter($"lang" === "en").select($"doc_id")
    val filtered = t.join(keep, t("vec_id") === keep("doc_id")).drop("doc_id")
    val assigned = filtered.crossJoin(broadcast(cents))
      .withColumn("cos_c", LlmOps.dot($"embedding", $"ce") / ($"nrm" * $"cn"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"vec_id").orderBy($"cos_c".desc, $"cid")))
      .filter($"rn" === 1)
      .select($"cid", $"vec_id", $"embedding", $"nrm")
    val probe = t.filter($"vec_id" === 0)
      .select($"embedding".as("pe"), $"nrm".as("pn"))
    val probeCids = cents.crossJoin(broadcast(probe))
      .withColumn("cos_p", LlmOps.dot($"ce", $"pe") / ($"cn" * $"pn"))
      .orderBy($"cos_p".desc, $"cid")
      .limit(nProbe)
      .select($"cid")
    assigned
      .join(broadcast(probeCids), "cid")
      .filter($"vec_id" =!= 0)
      .crossJoin(broadcast(probe))
      .withColumn("cos", LlmOps.dot($"embedding", $"pe") / ($"nrm" * $"pn"))
      .orderBy($"cos".desc, $"vec_id")
      .limit(10)
      .select($"vec_id", round($"cos", 6).as("cosine"))
  }
}
