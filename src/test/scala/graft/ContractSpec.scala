package graft

import org.apache.spark.sql.types.{ArrayType, DecimalType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Guards on the driver contract itself: the no-oracle set stays
  * exactly the documented one, and every oracle key has a query.
  */
class ContractSpec extends AnyFunSuite with SparkFixture {

  private val documentedNoOracle = Set(
    "agg_approx_count_distinct", // HLL is engine-specific
    "agg_approx_quantiles", // GK sketch is engine-specific
    "ml_rf_train_predict", "ml_rf_accuracy", // not SQL-expressible
    "ml_rf_feature_importance", "ml_rf_regression",
    "dedup_minhash_lsh", // hash-family specific (recall asserted)
    "sim_ann_lsh", // hash-family specific (recall asserted)
    "sim_ann_ivf", // centroid choice engine-specific (recall asserted)
    "agg_hll_sketch", // DataSketches binary engine-specific (bounded)
    "agg_count_min_sketch", // CMS layout engine-specific (bounded)
    "ml_dt_train_predict", "ml_kmeans_cluster", // not SQL-expressible
    "ml_logreg_train_predict", // not SQL-expressible (L-BFGS linear model)
    "ml_gbt_train_predict", // not SQL-expressible (binary GBT)
    "ml_rf_save_load", // not SQL-expressible (reload identity pinned in MLSpec)
    "ml_cross_validation", // fold assignment engine-specific
    "ml_cv_best_model", // fold assignment engine-specific (winner pinned in MLSpec)
    "dedup_near_embedding_ann", // SRP hash-family specific (recall asserted)
    "sim_ann_pq", // PQ codebook choice engine-specific (recall asserted)
    "ml_pca_project", // component sign/basis engine-specific (variance asserted)
    "ml_als_recommend", // factorization engine-specific (determinism asserted)
    "ml_naive_bayes", // smoothed Gaussian likelihood engine-specific (determinism + accuracy asserted)
    "ml_isotonic_regression", // PAV pooling not SQL-expressible (determinism + monotonicity asserted)
    "ml_linear_regression", // normal-equation solve not SQL-expressible as one query (determinism + R² asserted)
    "ml_gmm_cluster", // EM fit engine-specific (determinism + size conservation asserted)
    "sim_ann_filtered", // IVF centroid choice engine-specific (filtered recall asserted)
    "text_compression_ratio", // deflate byte counts codec-implementation specific (direction asserted)
    "ml_bpe_train_merges", // 8-round merge loop not expressible as one SQL query (validity + compression asserted)
    "ml_lda_topics", // EM topic fit engine-specific (determinism + normalization asserted)
    "sim_ann_index_persist", // centroid choice engine-specific; probe-reads-artifact plan + recall asserted
    "ml_bpe_apply", // encodes with the trainer's driver-loop merges (determinism + count sandwich asserted)
    "dedup_semantic_cluster", // coarse centroid choice engine-specific (recall + keep-min asserted in Round12Spec)
    "dedup_minhash_index_persist", // band bucketing hash-family specific (cross-pair recall + zero-FP + index plan asserted in Round13Spec)
    "sim_ann_index_batch_probe", // centroid choice engine-specific (batch recall vs exact kNN + artifact plan asserted in Round13Spec4)
    "sim_ivf_nprobe_sweep") // centroid choice engine-specific; recall(16)=1.0 exact + monotonicity asserted in Round13Spec20

  test("registered query count matches the declared SURVEY §2 inventory") {
    // Bump DELIBERATELY with each widening, in the same commit that
    // updates SURVEY.md §2 and README — this pin is what makes
    // inventory drift (round 5/6 verdicts) impossible to ship silently.
    assert(SparkEntry.queries.size === 640,
      "SparkEntry.queries changed size: update SURVEY.md §2 + README " +
        "and bump this pin in the same commit")
  }

  test("SURVEY §2z generated inventory matches SparkEntry exactly") {
    // The canonical inventory table is generated from SparkEntry by
    // tools/gen_inventory.py; this pin makes skipping the regeneration
    // a build failure, so the declared surface can never drift from
    // the registered one (round-9 consolidation of 8 rounds of
    // widening tables).
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val begin = "<!-- BEGIN GENERATED INVENTORY (tools/gen_inventory.py) -->"
    val end = "<!-- END GENERATED INVENTORY -->"
    val i0 = survey.indexOf(begin); val i1 = survey.indexOf(end)
    assert(i0 >= 0 && i1 > i0, "SURVEY.md §2z markers missing")
    val tableKeys = "\\| `([a-z0-9_]+)` \\|".r
      .findAllMatchIn(survey.substring(i0, i1)).map(_.group(1)).toSet
    assert(tableKeys === SparkEntry.queries.keySet,
      "SURVEY §2z is stale: run python3 tools/gen_inventory.py " +
        s"(missing=${SparkEntry.queries.keySet -- tableKeys} " +
        s"extra=${tableKeys -- SparkEntry.queries.keySet})")
    // verification tiers must agree with oracleSql registration too
    val oracleRows = "\\| `([a-z0-9_]+)` \\| duckdb-oracle \\|".r
      .findAllMatchIn(survey.substring(i0, i1)).map(_.group(1)).toSet
    assert(oracleRows === SparkEntry.oracleSql.keySet,
      "SURVEY §2z verification column is stale: run tools/gen_inventory.py")
  }

  test("every query is oracle-checked unless documented otherwise") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === documentedNoOracle,
      s"undocumented oracle-less queries: ${missing -- documentedNoOracle}; " +
        s"stale no-oracle entries: ${documentedNoOracle -- missing}")
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("QUADRATIC BY CONTRACT set is pinned: 4 labeled exact baselines, each with a linear twin") {
    // Four ops are deliberately O(n²): they are the EXACT ground truth
    // that calibrates a recall-pinned linear-path twin, and they carry
    // a "QUADRATIC BY CONTRACT" def-site label with the measured 10×
    // probe ratio. This pin (round-16, verdict task 6) makes the set
    // explicit: a new quadratic op must either add itself here WITH a
    // linear twin and a def-site label, or get flagged by the scale
    // probe with no contract to point at.
    val quadratic = Map( // op -> (linear twin, def-site file)
      "sim_cosine_topk" -> ("sim_ann_ivf", "ops/LlmOps.scala"),
      "sim_embedding_quantize" -> ("sim_ann_pq", "ops/Round8Ops.scala"),
      "sim_euclidean_topk" -> ("sim_ann_lsh", "ops/Round8Ops.scala"),
      "dedup_near_embedding" -> ("dedup_near_embedding_ann", "ops/LlmOps2.scala"))
    quadratic.foreach { case (q, (twin, _)) =>
      assert(SparkEntry.queries.contains(q), s"quadratic op $q not registered")
      assert(SparkEntry.queries.contains(twin),
        s"quadratic op $q has no registered linear twin $twin")
    }
    // the def-site label set must be EXACTLY the pinned files: a label
    // added elsewhere (new quadratic op) or removed (contract silently
    // dropped) fails until this pin is updated in the same commit
    import scala.jdk.CollectionConverters._
    val base = java.nio.file.Paths.get("src/main/scala/graft")
    val labeled = java.nio.file.Files.walk(base).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filter(p => new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        .contains("QUADRATIC BY CONTRACT"))
      .map(p => base.relativize(p).toString).toSet
    assert(labeled === quadratic.values.map(_._2).toSet,
      s"QUADRATIC BY CONTRACT def-site labels drifted: $labeled")
  }

  test("query names are snake_case and unique per contract") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-snake-case names: $bad")
  }

  test("oracle-checked queries emit only atomic, non-decimal columns") {
    // The driver's compare sorts the pandas frame by every column;
    // array/map/struct cells are unhashable there and crash the gate
    // (r3: fn_vector_arith), and DECIMAL output columns hash
    // differently across engines even when every value matches (r5:
    // pipeline_upsert, skew_aqe_join) — the determinism protocol keeps
    // DECIMAL internal and casts to DOUBLE as the last step. Schema-
    // only check — no execution.
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted.flatMap { name =>
      val schema = SparkEntry.queries(name)(spark, sf).schema
      val bad = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] ||
          f.dataType.isInstanceOf[DecimalType] => f.name
      }
      if (bad.isEmpty) None else Some(s"$name(${bad.mkString(",")})")
    }
    assert(offenders.isEmpty,
      s"oracle-checked queries with non-atomic or decimal output columns: $offenders")
  }
}
