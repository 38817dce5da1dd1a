package graft

/** DuckDB oracle SQL — one val per oracle-checked query (SURVEY §2).
  *
  * These are hand-written DuckDB dialect, NOT shared with the Spark
  * side. Dialect cheat-sheet (built up as ops are added):
  *   - money math: CAST(x AS DECIMAL(12,2)), rates DECIMAL(4,2) — exact,
  *     matches the Spark side's decimal accumulation; CAST sum to DOUBLE
  *     only at the end. avg = CAST(sum_dec AS DOUBLE)/count(*) on BOTH
  *     sides (a single identical double division).
  *   - timestamps: DuckDB reads the same parquet as naive TIMESTAMP;
  *     Spark side is TIMESTAMP_NTZ with UTC session — compare as-is.
  */
object Oracle {

  val aggHashGroupby: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
               * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
  """
}
