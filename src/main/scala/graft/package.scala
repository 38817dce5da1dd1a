/** graft — a Spark-native analytics engine (Scala 2.13 / Spark 4.1.2).
  *
  * Architecture (SURVEY.md is the binding blueprint):
  *  - [[graft.SparkEntry]] is the driver contract: `queries` maps every
  *    operator name to a DataFrame builder `(SparkSession, sfDir) =>
  *    DataFrame`; `oracleSql` carries the DuckDB differential oracle.
  *  - [[graft.Tables]] owns testdata ingestion and the determinism
  *    helpers (exact DECIMAL money casts, NTZ literals, the
  *    events-NANOS workaround).
  *  - `graft.ops.*` hold the operator implementations, grouped by
  *    SURVEY §2 category; all are declarative DataFrame plans that
  *    Catalyst optimizes (pushdown, pruning, join selection, AQE) —
  *    imperative escapes are limited to compiled kernels
  *    ([[graft.expressions.FloatDotProduct]], the two-pointer
  *    intersection UDF) and one typed mapPartitions (multimodal
  *    binary features).
  *  - [[graft.RandomForestApp]] is the reference-workflow facade:
  *    feature files in, forest trained, predictions out.
  *
  * Every operator follows the SURVEY §7d determinism protocol so its
  * output hash-matches DuckDB bit-for-bit at any parallelism: exact
  * decimal accumulation for money, total ORDER BY, doubles only as
  * final single-op casts, UTC/NTZ timestamps end-to-end.
  */
package object graft
