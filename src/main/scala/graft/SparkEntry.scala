package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.aggHashGroupby(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2a scans / sources
    "scan_parquet_full"       -> (Relational.scanParquetFull _),
    "scan_projection_pruning" -> (Relational.scanProjectionPruning _),
    "scan_filter_pushdown"    -> (Relational.scanFilterPushdown _),
    "source_json_lines"       -> (Relational.sourceJsonLines _),
    // §2b projections / filters
    "project_expressions"      -> (Relational.projectExpressions _),
    "filter_complex_predicate" -> (Relational.filterComplexPredicate _),
    "filter_null_semantics"    -> (Relational.filterNullSemantics _),
    // §2c joins
    "join_broadcast_inner" -> (Relational.joinBroadcastInner _),
    "join_shuffle_inner"   -> (Relational.joinShuffleInner _),
    "join_multiway_star"   -> (Relational.joinMultiwayStar _),
    "join_left_outer"      -> (Relational.joinLeftOuter _),
    "join_full_outer"      -> (Relational.joinFullOuter _),
    "join_semi"            -> (Relational.joinSemi _),
    "join_anti"            -> (Relational.joinAnti _),
    "join_theta_range"     -> (Relational.joinThetaRange _),
    "join_cross_small"     -> (Relational.joinCrossSmall _),
    "join_asof_last_event" -> (Relational.joinAsofLastEvent _),
    // §2d aggregations
    "agg_hash_groupby" -> (Relational.aggHashGroupby _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "scan_parquet_full"        -> Oracle.scanParquetFull,
    "scan_projection_pruning"  -> Oracle.scanProjectionPruning,
    "scan_filter_pushdown"     -> Oracle.scanFilterPushdown,
    "source_json_lines"        -> Oracle.sourceJsonLines,
    "project_expressions"      -> Oracle.projectExpressions,
    "filter_complex_predicate" -> Oracle.filterComplexPredicate,
    "filter_null_semantics"    -> Oracle.filterNullSemantics,
    "join_broadcast_inner"     -> Oracle.joinBroadcastInner,
    "join_shuffle_inner"       -> Oracle.joinShuffleInner,
    "join_multiway_star"       -> Oracle.joinMultiwayStar,
    "join_left_outer"          -> Oracle.joinLeftOuter,
    "join_full_outer"          -> Oracle.joinFullOuter,
    "join_semi"                -> Oracle.joinSemi,
    "join_anti"                -> Oracle.joinAnti,
    "join_theta_range"         -> Oracle.joinThetaRange,
    "join_cross_small"         -> Oracle.joinCrossSmall,
    "join_asof_last_event"     -> Oracle.joinAsofLastEvent,
    "agg_hash_groupby"         -> Oracle.aggHashGroupby,
  )
}
