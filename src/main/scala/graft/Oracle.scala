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
  *   - JSON: `props->>'$.k'` then CAST, matching get_json_object.
  *   - null-safe equality: IS NOT DISTINCT FROM ↔ Spark <=>.
  */
object Oracle {

  private val moneyD = "DECIMAL(12,2)"
  private val rateD  = "DECIMAL(4,2)"
  private def m(c: String)   = s"CAST($c AS $moneyD)"
  private def rt(c: String)  = s"CAST($c AS $rateD)"
  private val oneR           = s"CAST(1 AS $rateD)"
  /** per-lineitem net revenue, exact decimal */
  private val netExpr = s"${m("l_extendedprice")} * ($oneR - ${rt("l_discount")})"

  val aggHashGroupby: String = s"""
    SELECT l_returnflag, l_linestatus,
      CAST(sum(${m("l_quantity")}) AS DOUBLE) AS sum_qty,
      CAST(sum(${m("l_extendedprice")}) AS DOUBLE) AS sum_base_price,
      CAST(sum($netExpr) AS DOUBLE) AS sum_disc_price,
      CAST(sum($netExpr * ($oneR + ${rt("l_tax")})) AS DOUBLE) AS sum_charge,
      CAST(sum(${m("l_quantity")}) AS DOUBLE) / count(*) AS avg_qty,
      CAST(sum(${m("l_extendedprice")}) AS DOUBLE) / count(*) AS avg_price,
      CAST(sum(${rt("l_discount")}) AS DOUBLE) / count(*) AS avg_disc,
      count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
  """

  // ---- §2a ----

  val scanParquetFull: String = """
    SELECT * FROM lineitem
    ORDER BY l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
    LIMIT 1000
  """

  val scanProjectionPruning: String =
    "SELECT l_orderkey, l_quantity FROM lineitem ORDER BY l_orderkey, l_quantity"

  val scanFilterPushdown: String = """
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    ORDER BY l_orderkey, l_linenumber
  """

  // csv/json round trips must reproduce the original rows exactly
  val sourceRoundtrip: String = """
    SELECT event_id, event_type, user_id, value
    FROM events ORDER BY event_id
  """

  val sourceJsonLines: String = """
    SELECT event_id, event_type, CAST(props->>'$.k' AS INTEGER) AS k
    FROM events ORDER BY event_id
  """

  // ---- §2b ----

  val projectExpressions: String = s"""
    SELECT l_orderkey, l_linenumber,
      CAST($netExpr AS DOUBLE) AS net_price,
      CASE WHEN l_quantity > 25 THEN 'bulk' ELSE 'small' END AS qty_class,
      l_returnflag || '-' || l_linestatus AS flag_status
    FROM lineitem ORDER BY l_orderkey, l_linenumber
  """

  val filterComplexPredicate: String = """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O','F')
      AND o_totalprice BETWEEN 10000 AND 200000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '%HIGH%')
      AND NOT (o_custkey % 10 = 3)
    ORDER BY o_orderkey
  """

  val filterNullSemantics: String = """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st,
      NULLIF(o_orderstatus, 'P') IS NULL AS st_is_null,
      NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'O' AS st_nse_o,
      coalesce(NULLIF(o_orderstatus, 'P'), '?') AS st_coal
    FROM orders ORDER BY o_orderkey
  """

  // ---- §2c ----

  val joinBroadcastInner: String = s"""
    SELECT c_custkey, c_name, count(*) AS n_orders,
      CAST(sum(${m("o_totalprice")}) AS DOUBLE) AS sum_total
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
  """

  val joinShuffleInner: String = s"""
    SELECT o_orderstatus, count(*) AS n_items,
      CAST(sum($netExpr) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
  """

  val joinMultiwayStar: String = s"""
    SELECT n_name, CAST(sum($netExpr) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
  """

  val joinLeftOuter: String = """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    ORDER BY c_custkey
  """

  val joinFullOuter: String = """
    SELECT lkey, rkey FROM
      (SELECT c_custkey AS lkey FROM customer WHERE c_custkey % 2 = 0) l
      FULL OUTER JOIN
      (SELECT DISTINCT o_custkey AS rkey FROM orders WHERE o_orderkey % 3 = 0) r
      ON lkey = rkey
    ORDER BY coalesce(lkey, rkey)
  """

  val joinSemi: String = """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    ORDER BY c_custkey
  """

  val joinAnti: String = """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    ORDER BY c_custkey
  """

  val joinThetaRange: String = """
    SELECT o1.o_custkey AS custkey, o1.o_orderkey AS k1, o2.o_orderkey AS k2
    FROM orders o1 JOIN orders o2
      ON o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
     AND o2.o_orderdate >= o1.o_orderdate
     AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
    ORDER BY k1, k2
  """

  val joinCrossSmall: String = """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
  """

  // ---- §2d ----

  val aggCountDistinct: String = """
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
  """

  val aggRollup: String = s"""
    SELECT GROUPING(l_returnflag, l_linestatus) AS gid, l_returnflag, l_linestatus,
      CAST(sum($netExpr) AS DOUBLE) AS revenue, count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
  """

  val aggCube: String = s"""
    SELECT GROUPING(l_returnflag, l_linestatus) AS gid, l_returnflag, l_linestatus,
      CAST(sum($netExpr) AS DOUBLE) AS revenue, count(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
  """

  val aggGroupingSets: String = s"""
    SELECT GROUPING(o_orderstatus, o_orderpriority) AS gid, o_orderstatus, o_orderpriority,
      count(*) AS n,
      CAST(sum(${m("o_totalprice")}) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
  """

  // Stats from exact decimal moment sums (see Aggregates.aggStats):
  // same closed-form double arithmetic as the Spark side, so results
  // are bit-identical under any partitioning on either engine.
  val aggStats: String = """
    WITH m AS (
      SELECT l_returnflag, count(*) AS n,
        sum(CAST(l_quantity AS DECIMAL(12,2))) AS sq,
        sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sqq,
        sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS sp,
        sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS spp,
        sum(CAST(l_discount AS DECIMAL(4,2))) AS sd,
        sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sqp,
        sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS sqd
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
      ROUND(sqrt((CAST(sqq AS DOUBLE) * n - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) / (n * (n - 1))), 4) AS sd_qty,
      ROUND((CAST(sqq AS DOUBLE) * n - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) / (n * (n - 1)), 4) AS var_qty,
      ROUND((CAST(sqp AS DOUBLE) * n - CAST(sq AS DOUBLE) * CAST(sp AS DOUBLE)) /
        (sqrt(CAST(sqq AS DOUBLE) * n - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE)) *
         sqrt(CAST(spp AS DOUBLE) * n - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))), 4) AS corr_qty_price,
      ROUND((CAST(sqd AS DOUBLE) * n - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE)) / (n * (n - 1)), 4) AS covar_qty_disc,
      n
    FROM m ORDER BY l_returnflag
  """

  val aggPercentiles: String = """
    SELECT o_orderstatus,
      ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS median_price,
      ROUND(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90_price,
      count(*) AS n
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
  """

  val aggMinmaxBy: String = """
    SELECT o_custkey,
      first(o_orderkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS max_order,
      first(o_orderkey ORDER BY o_totalprice ASC, o_orderkey ASC) AS min_order,
      max(o_totalprice) AS max_price,
      min(o_totalprice) AS min_price
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
  """

  // joined DECIMAL(12,2) strings, not a raw list — the driver's pandas
  // harness cannot sort/hash ndarray cells
  val aggCollectSorted: String = """
    SELECT o_custkey,
      array_to_string(
        list_transform(list(o_totalprice ORDER BY o_totalprice),
          x -> CAST(CAST(x AS DECIMAL(12,2)) AS VARCHAR)), ',') AS prices
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
  """

  // ---- §2e windows ----

  val winRanking: String = """
    SELECT o_custkey, o_orderkey, o_totalprice,
      row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn,
      rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
      dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk
    FROM orders ORDER BY o_custkey, rn
  """

  val winTopkPerGroup: String = """
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
      FROM orders) t
    WHERE rn <= 3 ORDER BY o_custkey, rn
  """

  val winRunningFrame: String = s"""
    SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(sum(${m("o_totalprice")}) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      count(*) OVER (
        PARTITION BY o_custkey ORDER BY o_orderkey
        RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_near
    FROM orders ORDER BY o_custkey, o_orderkey
  """

  val winLeadLag: String = """
    SELECT o_custkey, o_orderkey, o_orderdate,
      lag(o_orderdate)  OVER w AS prev_date,
      lead(o_orderdate) OVER w AS next_date,
      date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS gap_days
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
  """

  val winNtileDist: String = """
    SELECT o_orderstatus, o_orderkey, o_totalprice,
      ntile(4)       OVER w AS quartile,
      percent_rank() OVER w AS pr,
      cume_dist()    OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderstatus, o_totalprice, o_orderkey
  """

  val winFirstLast: String = """
    SELECT o_custkey, o_orderkey,
      first_value(o_orderkey) OVER w AS first_order,
      last_value(o_orderkey)  OVER w AS last_order,
      nth_value(o_orderkey, 2) OVER w AS second_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
  """

  val textTfidf: String = """
    SELECT term, df, ROUND(ln(n_docs / df), 6) AS idf FROM (
      SELECT term, count(*) AS df,
        (SELECT count(*) FROM documents) AS n_docs
      FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
            FROM documents)
      GROUP BY term)
    ORDER BY term
  """

  val aggHistogram: String = s"""
    SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
      count(*) AS n, CAST(sum(${m("o_totalprice")}) AS DOUBLE) AS sum_price
    FROM orders GROUP BY bucket ORDER BY bucket
  """

  // DuckDB: ^ is power — xor() is the function; shifts are operators
  val fnBitwise: String = """
    SELECT o_orderkey,
      o_orderkey & 255 AS band,
      o_orderkey | 16 AS bor,
      xor(o_orderkey, 85) AS bxor,
      o_orderkey << 2 AS shl,
      o_orderkey >> 3 AS shr,
      CAST(bit_count(o_orderkey) AS BIGINT) AS bcnt
    FROM orders ORDER BY o_orderkey
  """

  private val msetA = "SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'"
  private val msetB = "SELECT l_orderkey FROM lineitem WHERE l_linestatus = 'F'"

  val setIntersectAll: String =
    s"SELECT * FROM ($msetA INTERSECT ALL $msetB) ORDER BY l_orderkey"

  val setExceptAll: String =
    s"SELECT * FROM ($msetA EXCEPT ALL $msetB) ORDER BY l_orderkey"

  // ---- §2f sorts / limits / set ops ----

  val sortMultiKey: String = """
    SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS st, o_orderpriority
    FROM orders
    ORDER BY st DESC NULLS LAST, o_orderpriority ASC, o_orderkey DESC
  """

  val limitTopk: String = s"""
    SELECT l_orderkey, l_linenumber, CAST($netExpr AS DOUBLE) AS net_price
    FROM lineitem
    ORDER BY net_price DESC, l_orderkey, l_linenumber
    LIMIT 20
  """

  private val sliceA = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 300000"
  private val sliceB = "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderpriority = '1-URGENT'"

  val setUnionAll: String =
    s"SELECT * FROM ($sliceA UNION ALL $sliceB) ORDER BY o_orderkey, o_totalprice"

  val setUnionDistinct: String =
    s"SELECT * FROM ($sliceA UNION $sliceB) ORDER BY o_orderkey"

  val setIntersect: String = """
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ORDER BY c_custkey
  """

  val setExcept: String = """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    ORDER BY c_custkey
  """

  // ---- §2g scalar surface ----
  // Dialect notes: len()/EXTRACT return BIGINT (Spark side casts to
  // match); DuckDB dow is 0=Sunday vs Spark 1=Sunday (+1); ceil/floor
  // stay DOUBLE here, Spark casts its LONG result; `//` = int div.

  val fnString: String = """
    SELECT c_custkey,
      substring(c_name, 1, 8) AS sub8,
      upper(c_mktsegment) AS seg_up,
      lower(c_name) AS name_lo,
      trim('  ' || c_mktsegment || '  ') AS seg_trim,
      lpad(c_name, 25, '*') AS name_pad,
      concat_ws('|', c_mktsegment, c_name) AS joined,
      replace(c_name, 'Customer', 'Cust') AS name_repl,
      len(string_split(c_name, '#')) AS n_parts,
      c_name LIKE '%42%' AS has42,
      regexp_extract(c_name, '[0-9]+') AS digits
    FROM customer ORDER BY c_custkey
  """

  val fnDateTime: String = """
    SELECT o_orderkey, o_orderdate,
      CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
      EXTRACT(year FROM o_orderdate) AS yr,
      EXTRACT(month FROM o_orderdate) AS mo,
      EXTRACT(dow FROM o_orderdate) + 1 AS dow,
      o_orderdate + INTERVAL 3 MONTH AS plus3m,
      date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
      last_day(o_orderdate) AS month_end
    FROM orders ORDER BY o_orderkey
  """

  val fnMath: String = """
    SELECT o_orderkey,
      ROUND(o_totalprice / 7, 4) AS ratio4,
      abs(-o_totalprice) AS abs_neg,
      ceil(o_totalprice) AS ceil_p,
      floor(o_totalprice) AS floor_p,
      ROUND(sqrt(o_totalprice), 6) AS sqrt6,
      ROUND(ln(o_totalprice), 6) AS ln6,
      ROUND(log10(o_totalprice), 6) AS log10_6,
      power(o_custkey % 10, 2) AS pow2,
      ((o_orderkey - 100) % 7 + 7) % 7 AS pm7,
      o_orderkey // 7 AS idiv7,
      o_orderkey / 7 AS fdiv7
    FROM orders ORDER BY o_orderkey
  """

  val fnConditional: String = """
    SELECT o_orderkey,
      CASE WHEN o_totalprice > 300000 THEN 'high'
           WHEN o_totalprice > 100000 THEN 'mid'
           ELSE 'low' END AS bucket,
      coalesce(NULLIF(o_orderstatus, 'P'), 'pending') AS status_c,
      least(o_totalprice, 250000.0) AS capped,
      greatest(o_custkey % 7, o_custkey % 5, 2) AS g
    FROM orders ORDER BY o_orderkey
  """

  val fnArray: String = """
    SELECT vec_id,
      len(embedding) AS dim,
      (embedding::DOUBLE[])[1] AS first_d,
      list_max(embedding::DOUBLE[]) AS max_d,
      ROUND(list_aggregate(embedding::DOUBLE[], 'sum'), 6) AS sum_d,
      len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS n_pos,
      list_transform((embedding::DOUBLE[])[1:3], x -> x * 2)[1] AS x2_1,
      list_transform((embedding::DOUBLE[])[1:3], x -> x * 2)[2] AS x2_2,
      list_transform((embedding::DOUBLE[])[1:3], x -> x * 2)[3] AS x2_3,
      list_sort((embedding::DOUBLE[])[1:4])[1] AS srt_1,
      list_sort((embedding::DOUBLE[])[1:4])[4] AS srt_4
    FROM embeddings ORDER BY vec_id
  """

  // fn_map: the oracle constructs the expected sorted-key/value arrays
  // directly (DuckDB has no str_to_map); semantics are identical.
  val fnMap: String = """
    SELECT o_orderkey,
      'prio,status' AS keys,
      string_split(o_orderpriority, '-')[1] || ',' || o_orderstatus AS vals,
      o_orderstatus AS status_val
    FROM orders ORDER BY o_orderkey
  """

  val fnJson: String = """
    SELECT event_id,
      CAST(props->>'$.k' AS INTEGER) AS k,
      '{"u":' || user_id || ',"t":"' || event_type || '"}' AS js,
      user_id AS u,
      event_type AS t
    FROM events ORDER BY event_id
  """

  val fnStruct: String = """
    SELECT o_orderkey,
      o_orderstatus AS s_field,
      to_json(struct_pack(k := o_orderkey, s := o_orderstatus)) AS js,
      (o_orderkey, o_orderstatus) < (5000, 'Z') AS cmp
    FROM orders ORDER BY o_orderkey
  """

  // ---- §2h streaming batch-equivalents ----

  val streamTumblingWindow: String = s"""
    SELECT date_trunc('hour', ts) AS win_start, event_type, count(*) AS n,
      CAST(sum(${m("value")}) AS DOUBLE) AS sum_value,
      count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2 ORDER BY 1, 2
  """

  // Epoch-grid reconstruction of Spark's sliding window(ts,'1h','15m'):
  // each event belongs to the 4 windows starting at
  // floor(epoch/900)*900 - {0,900,1800,2700} seconds.
  val streamSlidingWindow: String = """
    SELECT TIMESTAMP '1970-01-01 00:00:00'
             + to_seconds(CAST(floor(epoch(ts)/900)*900 - off AS BIGINT)) AS win_start,
           event_type, count(*) AS n
    FROM events, (SELECT unnest([0, 900, 1800, 2700]) AS off) offs
    GROUP BY 1, 2 ORDER BY 1, 2
  """

  // Gaps-and-islands mirror of session_window(ts, '30 minutes'):
  // a gap of exactly 30 min starts a new session (half-open windows).
  val streamSessionWindow: String = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS last_event,
      count(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_start
  """

  val streamDedup: String = """
    SELECT event_type, count(*) AS n
    FROM (SELECT DISTINCT ON (event_id) event_id, event_type FROM events)
    GROUP BY event_type ORDER BY event_type
  """

  val streamWatermarkLateData: String = """
    SELECT event_type, count(*) AS n_total,
      count(CASE WHEN is_late THEN 1 END) AS n_late
    FROM (
      SELECT event_type,
        ts < max(ts) OVER (ORDER BY event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             - INTERVAL 10 MINUTE AS is_late
      FROM events)
    GROUP BY event_type ORDER BY event_type
  """

  // ---- §2i ML (only the SQL-expressible split has an oracle) ----

  val mlTrainTestSplit: String = """
    SELECT vec_id, label,
      CASE WHEN vec_id % 5 = 0 THEN 'test' ELSE 'train' END AS split
    FROM embeddings ORDER BY vec_id
  """

  // ---- §2j LLM-data-pipeline ops ----
  // Cosine oracles use explicit ::DOUBLE[] math (list_dot_product on
  // double lists + sqrt norms) — NEVER list_cosine_similarity, which
  // computes in float32 and diverges at 6dp (SURVEY §2j).

  val dedupExactHash: String = """
    SELECT md5(text) AS hash, count(*) AS n_docs, min(doc_id) AS keep_id
    FROM documents GROUP BY md5(text) ORDER BY hash
  """

  val dedupNearJaccard: String = """
    WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
               FROM documents)
    SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        len(list_distinct(list_intersect(a.toks, b.toks)))::DOUBLE /
          (len(a.toks) + len(b.toks)
           - len(list_distinct(list_intersect(a.toks, b.toks)))) AS jac
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id)
    WHERE jac >= 0.8
    ORDER BY id_a, id_b
  """

  private val cosExpr =
    """list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
       (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"""

  val simCosineTopk: String = s"""
    SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cosExpr AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      ORDER BY cos DESC, id_a, id_b LIMIT 20)
    ORDER BY cos DESC, id_a, id_b
  """

  val simKnnQuery: String = s"""
    SELECT vec_id, ROUND(cos, 6) AS cosine FROM (
      SELECT a.vec_id AS vec_id, $cosExpr AS cos
      FROM embeddings a CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) b
      WHERE a.vec_id != 0
      ORDER BY cos DESC, vec_id LIMIT 10)
    ORDER BY cos DESC, vec_id
  """

  val textTokenizeTf: String = """
    SELECT term, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    GROUP BY term ORDER BY n DESC, term LIMIT 50
  """

  val textNgramBigrams: String = """
    WITH toks AS (SELECT lang, string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT lang,
             unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM toks WHERE len(t) >= 2),
    cnt AS (SELECT lang, bigram, count(*) AS n FROM bg GROUP BY lang, bigram)
    SELECT lang, bigram, n, rn FROM (
      SELECT lang, bigram, n,
        row_number() OVER (PARTITION BY lang ORDER BY n DESC, bigram) AS rn
      FROM cnt)
    WHERE rn <= 30 ORDER BY lang, rn
  """

  val textStatsPerSource: String = """
    SELECT source, count(*) AS n_docs,
      CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars,
      count(DISTINCT lang) AS n_langs,
      first(doc_id ORDER BY n_chars DESC, doc_id DESC) AS longest_doc
    FROM documents GROUP BY source ORDER BY source
  """

  val multimodalStructJson: String = """
    SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens,
      to_json(struct_pack(id := doc_id, lang := lang,
        n_tokens := len(string_split(text, ' ')), n_chars := n_chars)) AS js
    FROM documents ORDER BY doc_id
  """

  // ---- §2j wave 2: training-data-pipeline extras ----

  val textLangId: String = """
    WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
               FROM documents),
    c AS (SELECT doc_id, lang,
      len(list_intersect(toks, ['the','fast','data']))      AS c_en,
      len(list_intersect(toks, ['table','scan','order']))   AS c_de,
      len(list_intersect(toks, ['sort','merge','value']))   AS c_fr,
      len(list_intersect(toks, ['batch','window','row']))   AS c_es,
      len(list_intersect(toks, ['spark','column','hash']))  AS c_zh
      FROM t)
    SELECT doc_id, c_en, c_de, c_fr, c_es, c_zh,
      CASE
        WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en >= c_zh THEN 'en'
        WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_zh THEN 'de'
        WHEN c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
        WHEN c_es >= c_zh THEN 'es'
        ELSE 'zh'
      END AS predicted,
      (CASE
        WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en >= c_zh THEN 'en'
        WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_zh THEN 'de'
        WHEN c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
        WHEN c_es >= c_zh THEN 'es'
        ELSE 'zh'
      END) = lang AS matches_label
    FROM c ORDER BY doc_id
  """

  val textQualityScore: String = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (SELECT doc_id,
      len(toks) AS n_tokens,
      len(list_distinct(toks)) AS n_uniq,
      len(list_filter(toks, x -> list_contains(
        ['the','a','of','and','to','in','is','it','key','data'], x))) AS n_stop
      FROM t)
    SELECT doc_id, n_tokens, n_uniq, n_stop,
      ROUND(CAST(n_uniq AS DOUBLE) / n_tokens, 6) AS uniq_ratio,
      ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stop_ratio,
      ROUND(least(n_tokens / 50.0, 1.0) * 0.3
            + (CAST(n_uniq AS DOUBLE) / n_tokens) * 0.4
            + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3, 6) AS score
    FROM s ORDER BY doc_id
  """

  val textTokenCount: String = """
    SELECT doc_id,
      len(string_split(text, ' ')) AS ws_tokens,
      len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
      len(list_distinct(string_split(text, ' '))) AS uniq_tokens,
      ROUND(CAST(n_chars AS DOUBLE) / len(string_split(text, ' ')), 6)
        AS chars_per_token
    FROM documents ORDER BY doc_id
  """

  val textFingerprint: String = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
      md5(array_to_string(list_sort(list_distinct(t)), ' ')) AS fp_content,
      list_aggregate(list_transform(
        list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]),
        x -> md5(x)), 'min') AS fp_min_shingle,
      len(t) - 1 AS n_shingles
    FROM t WHERE len(t) >= 2 ORDER BY doc_id
  """

  val dedupSimhash: String = """
    WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                  FROM documents),
    h AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) AS h
          FROM toks),
    bits AS (SELECT doc_id, h, unnest(range(0, 32)) AS bit FROM h),
    s AS (SELECT doc_id, bit,
            sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS sc
          FROM bits GROUP BY doc_id, bit)
    SELECT doc_id,
      -- CAST: DuckDB sum(BIGINT) yields HUGEINT, which the driver's pandas
      -- harness coerces to float64 and hash-mismatches Spark's BIGINT.
      CAST(sum(CASE WHEN sc > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
    FROM s GROUP BY doc_id ORDER BY doc_id
  """

  val dedupNearEmbedding: String = s"""
    SELECT id_a, id_b, ROUND(cos, 6) AS cosine FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, $cosExpr AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
    WHERE cos >= 0.4
    ORDER BY id_a, id_b
  """

  // ASCII text: byte frames == character substrings, so md5 agrees
  val multimodalFrameSample: String = """
    SELECT doc_id,
      len(text) // 32 AS n_frames,
      len([f FOR f IN range(0, len(text) // 32) IF f % 4 = 0]) AS n_sampled,
      array_to_string(
        [md5(substring(text, f * 32 + 1, 32))
           FOR f IN range(0, len(text) // 32) IF f % 4 = 0], ',') AS frame_hashes
    FROM documents ORDER BY doc_id
  """

  val multimodalBinaryFeatures: String = """
    SELECT doc_id, len(text) AS payload_len,
      ascii(substring(text, 1, 1)) AS first_byte,
      md5(substring(text, 1, 16)) AS head_md5
    FROM documents ORDER BY doc_id
  """

  // ---- scale techniques (results equal the naive formulations) ----

  val skewSaltedAgg: String = s"""
    SELECT user_id, count(*) AS n_events,
      CAST(sum(${m("value")}) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
  """

  val joinBucketedColocated: String = s"""
    SELECT o_orderpriority, count(*) AS n_items,
      CAST(sum($netExpr) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """

  val scanPartitionPruning: String = """
    SELECT event_id, user_id, value, event_type
    FROM events WHERE event_type = 'purchase'
    ORDER BY event_id
  """

  val aggTypedAggregator: String = s"""
    SELECT l_returnflag,
      CAST(sum(${m("l_quantity")} * ${m("l_extendedprice")}) AS DOUBLE)
        / CAST(sum(${m("l_quantity")}) AS DOUBLE) AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
  """

  val joinQ3Topk: String = s"""
    SELECT l_orderkey, o_orderdate, CAST(sum($netExpr) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1996-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
  """

  val joinAsofLastEvent: String = """
    SELECT p.event_id AS purchase_id, p.user_id,
      (SELECT c.event_id FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id < p.event_id))
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS last_click_id
    FROM events p
    WHERE p.event_type = 'purchase'
    ORDER BY purchase_id
  """

  // ---- round-2 widening: reshape ops ----

  // pivot as conditional aggregation — portable across engines (DuckDB
  // PIVOT syntax would also work but desugars to exactly this)
  val aggPivot: String = s"""
    SELECT o_orderpriority,
      count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS f_cnt,
      CAST(sum(CASE WHEN o_orderstatus = 'F' THEN ${m("o_totalprice")} END) AS DOUBLE) AS f_rev,
      count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS o_cnt,
      CAST(sum(CASE WHEN o_orderstatus = 'O' THEN ${m("o_totalprice")} END) AS DOUBLE) AS o_rev,
      count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS p_cnt,
      CAST(sum(CASE WHEN o_orderstatus = 'P' THEN ${m("o_totalprice")} END) AS DOUBLE) AS p_rev
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """

  val aggUnpivot: String = s"""
    WITH wide AS (
      SELECT l_returnflag,
        CAST(sum(${m("l_quantity")}) AS DOUBLE) AS sum_qty,
        CAST(sum(${m("l_extendedprice")}) AS DOUBLE) AS sum_price,
        CAST(count(*) AS DOUBLE) AS n_rows
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, metric, value FROM (
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
      UNION ALL
      SELECT l_returnflag, 'sum_price', sum_price FROM wide
      UNION ALL
      SELECT l_returnflag, 'n_rows', n_rows FROM wide)
    ORDER BY l_returnflag, metric
  """

  val aggStringAgg: String = """
    SELECT o_custkey,
      string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS statuses,
      count(*) AS n_orders
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
  """

  val aggMode: String = """
    WITH counts AS (
      SELECT event_type, CAST(props->>'$.k' AS INTEGER) AS k, count(*) AS n
      FROM events WHERE CAST(props->>'$.k' AS INTEGER) IS NOT NULL GROUP BY 1, 2)
    SELECT event_type, k AS mode_k, n AS n_occurrences FROM (
      SELECT event_type, k, n,
        row_number() OVER (PARTITION BY event_type ORDER BY n DESC, k ASC) AS rn
      FROM counts)
    WHERE rn = 1 ORDER BY event_type
  """

  // zipped unnests (DuckDB zips parallel unnests in one SELECT) mirror
  // posexplode's (pos, value) pairs
  val fnExplode: String = """
    SELECT doc_id,
      unnest(range(len(string_split(text, ' ')))) AS pos,
      unnest(string_split(text, ' ')) AS tok
    FROM documents WHERE doc_id < 50 ORDER BY doc_id, pos
  """

  // ---- round-2 widening: pipeline composites ----

  val sampleStratified: String = """
    SELECT event_id, event_type, user_id
    FROM events
    WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 2) <
      CASE event_type WHEN 'purchase' THEN '80'
                      WHEN 'click' THEN '20'
                      ELSE '40' END
    ORDER BY event_id
  """

  val textPiiMask: String = """
    WITH t AS (
      SELECT doc_id,
        text || ' contact user' || doc_id || '@example.com or +1-555-' ||
          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      FROM documents)
    SELECT doc_id,
      length(raw) AS raw_len,
      length(masked) AS masked_len,
      masked
    FROM (SELECT doc_id, raw,
            regexp_replace(
              regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
              '\+[0-9][0-9-]{5,}', '<PHONE>', 'g') AS masked
          FROM t)
    ORDER BY doc_id
  """

  // score formula shared verbatim with textQualityScore above
  val pipelineQualityFilter: String = """
    WITH s AS (
      SELECT doc_id, lang, text,
        len(string_split(text, ' ')) AS n_tokens,
        len(list_distinct(string_split(text, ' '))) AS n_uniq,
        len(list_filter(string_split(text, ' '), x -> list_contains(
          ['the','a','of','and','to','in','is','it','key','data'], x))) AS n_stop
      FROM documents),
    scored AS (
      SELECT doc_id, lang, text, n_tokens,
        least(n_tokens / 50.0, 1.0) * 0.3
          + (CAST(n_uniq AS DOUBLE) / n_tokens) * 0.4
          + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.3 AS score,
        min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
      FROM s)
    SELECT doc_id, lang, n_tokens, ROUND(score, 6) AS score
    FROM scored
    WHERE doc_id = keep_id
      AND lang IN ('en', 'de', 'fr')
      AND n_tokens BETWEEN 20 AND 400
      AND score >= 0.55
    ORDER BY doc_id
  """

  // ---- round-2 widening: stream-stream interval join (batch mirror) ----

  val streamIntervalJoin: String = """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 10 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    ORDER BY c.user_id, click_id, purchase_id
  """

  // ---- round-3 widening ----

  // 3-token shingle sets via list_transform over 1-based indexes
  // (range(1, n) is end-exclusive, so range(1, len-1) yields the
  // trigram start positions 1 .. len-2)
  val dedupNgramJaccard: String = """
    WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
               WHERE len(string_split(text, ' ')) >= 3),
    s AS (SELECT doc_id, lang,
            list_distinct(list_transform(range(1, len(t) - 1),
              i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS sh
          FROM w)
    SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        len(list_intersect(a.sh, b.sh))::DOUBLE /
          (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) AS jac
      FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE 2 * len(a.sh) >= len(b.sh) AND 2 * len(b.sh) >= len(a.sh))
    WHERE jac >= 0.5
    ORDER BY id_a, id_b
  """

  // every computation in explicit double math (float32 list fns would
  // diverge at 6dp); zip of e with reverse(e) unpacked to 4 scalar
  // columns (array cells break the driver's pandas sort/hash compare)
  val fnVectorArith: String = """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id < 500)
    SELECT vec_id,
      len(v) AS dim,
      list_max(v) AS vmax,
      list_min(v) AS vmin,
      ROUND(list_dot_product(v, v), 6) AS self_dot,
      ROUND(v[1] / sqrt(list_dot_product(v, v)), 6) AS unit0,
      ROUND(v[1] + v[len(v)], 6) AS addrev1,
      ROUND(v[2] + v[len(v) - 1], 6) AS addrev2,
      ROUND(v[3] + v[len(v) - 2], 6) AS addrev3,
      ROUND(v[4] + v[len(v) - 3], 6) AS addrev4
    FROM e ORDER BY vec_id
  """

  val sqlCorrelatedScalar: String = """
    SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
    FROM orders o
    WHERE o_totalprice = (SELECT max(o2.o_totalprice)
                          FROM orders o2
                          WHERE o2.o_custkey = o.o_custkey)
    ORDER BY o_custkey, o_orderkey
  """

  val joinLateralAgg: String = """
    SELECT c.c_custkey, l.n_orders, CAST(l.max_total AS DOUBLE) AS max_total
    FROM customer c,
    LATERAL (SELECT count(*) AS n_orders, max(o_totalprice) AS max_total
             FROM orders o WHERE o.o_custkey = c.c_custkey) l
    WHERE l.n_orders > 0
    ORDER BY c.c_custkey
  """

  val winRangeInterval: String = """
    SELECT o_custkey, o_orderkey,
      count(*) OVER w AS n_last7d,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE) AS rev_last7d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
  """

  val aggRegr: String = """
    SELECT l_returnflag, count(*) AS n,
      ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
      ROUND(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
      ROUND(regr_r2(l_extendedprice, l_quantity), 4) AS r2
    FROM lineitem GROUP BY 1 ORDER BY 1
  """

  // unsalted mirror — the salt must not change results
  val skewSaltedJoin: String = s"""
    WITH dim(event_type, category) AS (VALUES
      ('click', 'engagement'), ('view', 'engagement'),
      ('purchase', 'revenue'), ('signup', 'growth'), ('error', 'ops'))
    SELECT d.category, count(*) AS n_events,
      CAST(sum(${m("e.value")}) AS DOUBLE) AS total_value
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY 1 ORDER BY 1
  """

  val aggBool: String = """
    SELECT o_orderstatus,
      bool_and(o_totalprice > 1000.0) AS all_over_1k,
      bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
      count(*) FILTER (WHERE o_totalprice > 100000.0) AS n_over_100k
    FROM orders GROUP BY 1 ORDER BY 1
  """

  val sqlInSubquery: String = """
    SELECT o_orderstatus, count(*) AS n
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderstatus ORDER BY o_orderstatus
  """

  val fnTrig: String = """
    SELECT o_orderkey,
      ROUND(sin(o_totalprice / 1000.0), 6) AS sin_v,
      ROUND(cos(o_totalprice / 1000.0), 6) AS cos_v,
      ROUND(atan2(o_totalprice, o_custkey + 1), 6) AS atan2_v,
      ROUND(degrees(atan(o_custkey / 100.0)), 6) AS deg_atan,
      ROUND(exp(o_custkey / -1000.0), 6) AS exp_v
    FROM orders WHERE o_orderkey < 4000 ORDER BY o_orderkey
  """

  // same gaps-and-islands as streamSessionWindow, with the running
  // session id exposed as the 1-based index
  val typedFlatmapSessions: String = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, ts,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id, CAST(sid AS INTEGER) AS session_idx,
      min(ts) AS session_start, max(ts) AS last_event, count(*) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    ORDER BY user_id, session_idx
  """

  // connected components via transitive closure (recursive CTE): the
  // UNION-dedup makes the recursion terminate; cluster = min reachable
  val dedupConnectedComponents: String = """
    WITH RECURSIVE
    t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
          FROM documents),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
            (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
            >= 0.8),
    und AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION ALL SELECT id_b, id_a FROM edges),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
    lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            FROM reach GROUP BY a)
    SELECT doc_id, cluster_id,
      count(*) OVER (PARTITION BY cluster_id) AS n_members
    FROM lbl ORDER BY cluster_id, doc_id
  """

  val fnGenerateSeries: String = """
    WITH b AS (SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
               FROM orders WHERE o_custkey < 50 GROUP BY 1)
    SELECT o_custkey,
      CAST(unnest(generate_series(CAST(date_trunc('month', f) AS DATE),
                                  CAST(date_trunc('month', l) AS DATE),
                                  INTERVAL 1 MONTH)) AS DATE) AS month
    FROM b ORDER BY o_custkey, month
  """

  // ---- round-4 widening ----

  val joinRightOuter: String = """
    SELECT c.c_custkey, o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS total
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY c.c_custkey, o.o_orderkey
  """

  val sqlCteChain: String = """
    WITH co AS (
      SELECT o_custkey, count(*) AS n,
             sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey),
    hi AS (SELECT * FROM co WHERE n >= 12)
    SELECT c.c_mktsegment, count(*) AS n_cust,
           CAST(sum(co.rev) AS DOUBLE) AS segment_rev
    FROM co JOIN customer c ON co.o_custkey = c.c_custkey
    WHERE co.n >= (SELECT min(n) FROM hi)
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
  """

  val sqlRecursiveCte: String = """
    WITH RECURSIVE months(m) AS (
      SELECT TIMESTAMP '1995-01-01 00:00:00'
      UNION ALL
      SELECT m + INTERVAL 1 MONTH FROM months
      WHERE m < TIMESTAMP '1995-12-01 00:00:00')
    SELECT m, count(o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS rev
    FROM months LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m ORDER BY m
  """

  val sqlValuesInline: String = """
    SELECT t.tier, count(*) AS n,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM orders o
    JOIN (VALUES ('1-URGENT', 'hot'), ('2-HIGH', 'hot'),
                 ('3-MEDIUM', 'warm'), ('4-NOT SPECIFIED', 'cold'),
                 ('5-LOW', 'cold')) AS t(pri, tier)
      ON o.o_orderpriority = t.pri
    GROUP BY t.tier ORDER BY t.tier
  """

  val aggFilterClause: String = """
    SELECT l_returnflag,
      count(*) AS n_all,
      count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
      CAST(coalesce(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
        FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE) AS rev_discounted,
      count(*) FILTER (WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00') AS n_recent
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
  """

  val aggDistinctMulti: String = """
    SELECT event_type,
      count(DISTINCT user_id) AS n_users,
      count(DISTINCT date_trunc('day', ts)) AS n_days,
      count(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
  """

  val limitOffset: String = """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
    FROM orders ORDER BY total DESC, o_orderkey LIMIT 20 OFFSET 40
  """

  // same result as join_theta_range: the bucketed plan is a pure
  // execution-strategy change, so the oracle IS the theta-join SQL
  val joinRangeBucketed: String = joinThetaRange

  val simCentroidDistance: String = """
    WITH ex AS (
      SELECT vec_id, label,
             unnest(range(len(embedding))) AS pos,
             unnest(embedding::DOUBLE[]) AS v
      FROM embeddings),
    cent AS (SELECT label, pos, avg(v) AS c FROM ex GROUP BY label, pos)
    SELECT e.vec_id, e.label, ROUND(sum(e.v * cent.c), 4) + 0.0 AS dot_centroid
    FROM ex e JOIN cent ON e.label = cent.label AND e.pos = cent.pos
    WHERE e.vec_id < 200
    GROUP BY e.vec_id, e.label
    ORDER BY e.vec_id
  """

  val pipelineContaminationCheck: String = """
    WITH sh AS (
      SELECT doc_id, lang,
        list_distinct(list_transform(
          range(1, len(string_split(text, ' ')) - 1),
          i -> array_to_string(string_split(text, ' ')[i:i+2], ' '))) AS g3
      FROM documents)
    SELECT a.doc_id, b.doc_id AS bench_id,
           len(list_intersect(a.g3, b.g3)) AS n_shared
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.doc_id >= 20 AND b.doc_id < 20
    WHERE len(list_intersect(a.g3, b.g3)) > 0
    ORDER BY a.doc_id, bench_id
  """

  val pipelineTokenBudgetPack: String = """
    SELECT doc_id, lang,
      len(string_split(text, ' '))::BIGINT AS n_tokens,
      CAST(floor((sum(len(string_split(text, ' '))::BIGINT)
          OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        - len(string_split(text, ' '))::BIGINT) / 8192.0) AS BIGINT) AS shard
    FROM documents ORDER BY doc_id
  """

  val textContainment: String = """
    WITH t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
               FROM documents)
    SELECT a.doc_id AS id_small, b.doc_id AS id_big,
      ROUND(len(list_intersect(a.toks, b.toks))::DOUBLE / len(a.toks), 6)
        AS containment
    FROM t a JOIN t b
      ON a.lang = b.lang
     AND (len(a.toks) < len(b.toks)
          OR (len(a.toks) = len(b.toks) AND a.doc_id < b.doc_id))
    WHERE len(list_intersect(a.toks, b.toks)) * 10 >= len(a.toks) * 9
    ORDER BY id_small, id_big
  """

  val streamTopkPerWindow: String = """
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS win_start, event_type, count(*) AS n
      FROM events GROUP BY 1, 2),
    ranked AS (
      SELECT win_start, event_type, n,
        row_number() OVER (PARTITION BY win_start
                           ORDER BY n DESC, event_type ASC) AS rn
      FROM counts)
    SELECT win_start, event_type, n FROM ranked WHERE rn = 1
    ORDER BY win_start
  """

  // ---- round-4 widening, second batch ----

  val textEditDistance: String = """
    WITH t AS (SELECT doc_id, lang, substring(text, 1, 32) AS prefix
               FROM documents WHERE doc_id < 200)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           levenshtein(a.prefix, b.prefix) AS dist
    FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE levenshtein(a.prefix, b.prefix) <= 20
    ORDER BY id_a, id_b
  """

  val textKeywordsTopk: String = """
    WITH terms AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
        row_number() OVER (PARTITION BY tf.doc_id
                           ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS rn
      FROM tf JOIN df USING (term) WHERE tf.doc_id < 50)
    SELECT doc_id, rn, term, tf, df,
      ROUND(tf * ln(n_docs / df), 6) AS score
    FROM ranked, n WHERE rn <= 3
    ORDER BY doc_id, rn
  """

  val fnTryArith: String = """
    SELECT event_id,
      TRY_CAST(event_type AS INT) AS bad_int,
      TRY_CAST(CAST(value AS VARCHAR) AS DOUBLE) AS roundtrip,
      ROUND(value / NULLIF(user_id % 3, 0), 6) AS safe_div
    FROM events WHERE event_id < 2000 ORDER BY event_id
  """

  val aggWeightedAvg: String = """
    SELECT event_type,
      ROUND(sum(((user_id % 7) + 1) * value) / sum((user_id % 7) + 1), 4) AS wavg,
      ROUND(avg(value), 4) AS avg_plain,
      count(*) AS n
    FROM events GROUP BY event_type ORDER BY event_type
  """

  val multimodalChunkManifest: String = """
    SELECT doc_id,
      unnest(range((len(text) + 255) // 256)) AS chunk_idx,
      unnest([least(256, len(text) - 256 * i)::BIGINT
              FOR i IN range((len(text) + 255) // 256)]) AS chunk_len,
      unnest([md5(substring(text, 256 * i + 1, 256))
              FOR i IN range((len(text) + 255) // 256)]) AS chunk_md5
    FROM documents WHERE doc_id < 200
    ORDER BY doc_id, chunk_idx
  """

  val scanMergeSchema: String = """
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total,
           NULL AS priority
    FROM orders WHERE o_orderkey < 100
    UNION ALL
    SELECT o_orderkey, NULL, o_orderpriority
    FROM orders WHERE o_orderkey >= 100 AND o_orderkey < 200
    ORDER BY o_orderkey
  """

  val aggHaving: String = """
    SELECT o_custkey, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12 AND sum(CAST(o_totalprice AS DECIMAL(18,2))) > 1000000
    ORDER BY o_custkey
  """

  val winFirstLastIgnoreNulls: String = """
    WITH s AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
        CASE WHEN o_orderkey % 3 = 0 THEN NULL
             ELSE CAST(o_totalprice AS DOUBLE) END AS sparse
      FROM orders)
    SELECT o_custkey, o_orderkey, sparse,
      last_value(sparse IGNORE NULLS) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
      first_value(sparse IGNORE NULLS) OVER
        (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_obs
    FROM s ORDER BY o_custkey, o_orderkey
  """

  val pipelineIncrementalDedup: String = """
    WITH hashed AS (SELECT doc_id, md5(text) AS hash FROM documents)
    SELECT n.doc_id, n.hash
    FROM hashed n
    WHERE n.doc_id >= 300
      AND NOT EXISTS (SELECT 1 FROM hashed c
                      WHERE c.doc_id < 300 AND c.hash = n.hash)
    ORDER BY n.doc_id
  """

  val winMovingAvg: String = s"""
    SELECT o_custkey, o_orderkey,
      CAST(sum(${m("o_totalprice")}) OVER w AS DOUBLE) AS sum3,
      count(*) OVER w AS n3,
      ROUND(CAST(sum(${m("o_totalprice")}) OVER w AS DOUBLE)
            / (count(*) OVER w), 4) AS avg3
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    ORDER BY o_custkey, o_orderkey
  """

  // ---- round-5 widening ----

  val pipelineUpsert: String = """
    WITH t AS (SELECT o_orderkey AS key,
                      CAST(o_totalprice AS DECIMAL(12,2)) AS price,
                      o_orderstatus AS status
               FROM orders),
    upd AS (
      SELECT key AS u_key, CAST(price + 100.00 AS DECIMAL(12,2)) AS u_price,
             'U' AS u_status
      FROM t WHERE key % 97 = 0
      UNION ALL
      SELECT key + 1000000000, price, 'N' FROM t WHERE key % 101 = 0)
    SELECT coalesce(key, u_key) AS o_orderkey,
           CAST(coalesce(u_price, price) AS DOUBLE) AS o_totalprice,
           coalesce(u_status, status) AS o_orderstatus
    FROM t FULL OUTER JOIN upd ON key = u_key
    ORDER BY o_orderkey
  """

  val skewAqeJoin: String = """
    WITH fact AS (
      SELECT CASE WHEN l_orderkey % 4 < 3 THEN 0
                  ELSE l_orderkey % 16 + 1 END AS k,
             CAST(l_quantity AS DECIMAL(12,2)) AS qty
      FROM lineitem CROSS JOIN range(2) r),
    dim AS (SELECT range AS dk, 'g' || range AS grp FROM range(17))
    SELECT grp, count(*) AS n, CAST(sum(qty) AS DOUBLE) AS sum_qty
    FROM fact JOIN dim ON k = dk
    GROUP BY grp ORDER BY grp
  """

  // ---- round-7 widening ----

  // mirrors the corruption rule (event_id % 10 == 0 rows get a
  // non-numeric value field) arithmetically on the parquet source
  val sourceCsvMalformed: String = """
    SELECT count(*) AS n_total,
           count(*) FILTER (WHERE event_id % 10 = 0) AS n_corrupt,
           count(*) FILTER (WHERE event_id % 10 <> 0) AS n_dropmalformed,
           CAST(sum(CAST(value AS DECIMAL(12,2)))
                  FILTER (WHERE event_id % 10 <> 0) AS DOUBLE) AS sum_value_good
    FROM events
  """

  // the messy derivation + normalizer are the identical expression
  // tree on both engines; regexp_replace needs the 'g' flag here
  // (Spark replaces all matches by default)
  val textNormalize: String = """
    WITH messy AS (
      SELECT doc_id, text,
        CASE CAST(doc_id % 3 AS INTEGER)
          WHEN 0 THEN upper(text)
          WHEN 1 THEN ' ' || replace(text, ' ', '  ') || ' '
          ELSE text || ' !!! *** ??? '
        END AS m
      FROM documents),
    n AS (
      SELECT doc_id, text,
        trim(regexp_replace(regexp_replace(lower(m), '[^a-z0-9 ]', '', 'g'),
                            ' +', ' ', 'g')) AS norm
      FROM messy)
    SELECT doc_id, md5(norm) AS norm_hash,
           CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens,
           (norm = text) AS roundtrip
    FROM n ORDER BY doc_id
  """

  // final upserted state == full per-user totals (batch 1 carries the
  // even-event totals, batch 2 the cumulative totals for users with
  // odd events; replace-by-key makes the re-delivered batch a no-op)
  val streamForeachBatchUpsert: String = """
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
  """

  // ---- round-7 widening, part 2 ----

  // the alpha=0.5 temperature threshold is integer arithmetic over a
  // correctly-rounded IEEE sqrt/divide, so printf('%04x', ...) here and
  // lpad(lower(hex(...))) in Spark render the identical 4 hex digits
  val pipelineMixtureSample: String = """
    WITH rates AS (
      SELECT lang, count(*) AS n_docs,
             least(1.0, 6.0 / sqrt(count(*))) AS rate
      FROM documents GROUP BY lang),
    t AS (
      SELECT lang, n_docs, rate,
             CASE WHEN rate >= 1.0 THEN 'zzzz'
                  ELSE printf('%04x', CAST(floor(rate * 65536) AS BIGINT)) END
               AS threshold
      FROM rates),
    picked AS (
      SELECT d.lang, t.n_docs, t.rate, d.doc_id,
             substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < t.threshold AS p
      FROM documents d JOIN t USING (lang))
    SELECT lang, first(n_docs) AS n_docs, round(first(rate), 6) AS rate,
           CAST(sum(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN p THEN doc_id END) AS BIGINT) AS id_checksum
    FROM picked GROUP BY lang ORDER BY lang
  """

  // same explode-count-reaggregate shape; DuckDB lists are 1-based like
  // Spark element_at, and range(1, len) matches sequence(1, len - 1)
  val textRepetitionFilter: String = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    top AS (
      SELECT doc_id, sum(c) AS n_tokens, max(c) AS top_token_n FROM (
        SELECT doc_id, term, count(*) AS c FROM (
          SELECT doc_id, unnest(t) AS term FROM toks)
        GROUP BY doc_id, term)
      GROUP BY doc_id),
    bg AS (
      SELECT doc_id, sum(c) AS n_bigrams, sum(c) - count(*) AS dup_bigram_n
      FROM (
        SELECT doc_id, bigram, count(*) AS c FROM (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i + 1])) AS bigram
          FROM toks WHERE len(t) >= 2)
        GROUP BY doc_id, bigram)
      GROUP BY doc_id)
    SELECT top.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           round(CAST(top_token_n AS DOUBLE) / n_tokens, 6) AS top_token_frac,
           round(CAST(dup_bigram_n AS DOUBLE) / n_bigrams, 6) AS dup_bigram_frac,
           (CAST(top_token_n AS DOUBLE) / n_tokens < 0.2
             AND CAST(dup_bigram_n AS DOUBLE) / n_bigrams < 0.3) AS keep
    FROM top JOIN bg ON top.doc_id = bg.doc_id
    ORDER BY top.doc_id
  """

  // gaps-and-islands: identical lag-boundary + running-sum island id
  // (single-partitioning form), event_id in the ordering so ties
  // cannot reorder across engines
  val pipelineScd2: String = """
    WITH b AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS boundary
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, event_type, ts, event_id,
             sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
      FROM b),
    runs AS (
      SELECT user_id, event_type, island,
             min(ts) AS valid_from, count(*) AS n_events
      FROM r GROUP BY user_id, event_type, island)
    SELECT user_id, event_type AS status, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           (lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             IS NULL) AS is_current,
           n_events
    FROM runs ORDER BY user_id, valid_from
  """

  // each stage's min ts is constrained STRICTLY AFTER the previous
  // stage's entry and within the 48 h conversion window, mirroring the
  // chained-join construction
  val analyticFunnel: String = """
    WITH u AS (SELECT DISTINCT user_id FROM events),
    v AS (
      SELECT user_id, min(ts) AS view_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.view_ts
        AND e.ts <= v.view_ts + INTERVAL 48 HOUR
      GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
        AND e.ts <= c.click_ts + INTERVAL 48 HOUR
      GROUP BY e.user_id)
    SELECT u.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           (CASE WHEN v.view_ts IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END
             + CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END) AS stage
    FROM u LEFT JOIN v ON u.user_id = v.user_id
           LEFT JOIN c ON u.user_id = c.user_id
           LEFT JOIN p ON u.user_id = p.user_id
    ORDER BY u.user_id
  """

  // identical deterministic v2 derivation; the +10% reprice is the same
  // IEEE double multiply, so changed-detection is an exact compare
  val pipelineDatasetDiff: String = """
    WITH v1 AS (
      SELECT o_orderkey AS key, o_totalprice AS price FROM orders),
    kept AS (SELECT * FROM v1 WHERE key % 13 <> 0),
    v2 AS (
      SELECT key,
             CASE WHEN key % 7 = 0 THEN price * 1.1 ELSE price END AS price
      FROM kept
      UNION ALL
      SELECT key + 2000000000, price FROM kept WHERE key % 17 = 0)
    SELECT coalesce(a.key, b.key) AS key,
           CASE WHEN a.key IS NULL THEN 'added'
                WHEN b.key IS NULL THEN 'removed'
                WHEN a.price <> b.price THEN 'changed'
                ELSE 'unchanged' END AS change_type,
           a.price AS old_price, b.price AS new_price
    FROM v1 a FULL OUTER JOIN v2 b ON a.key = b.key
    WHERE CASE WHEN a.key IS NULL THEN 'added'
               WHEN b.key IS NULL THEN 'removed'
               WHEN a.price <> b.price THEN 'changed'
               ELSE 'unchanged' END <> 'unchanged'
    ORDER BY key
  """

  // percent_rank/cume_dist are tie-aware (value-ordered window); ntile
  // splits by position, so it takes the key-tiebroken ordering
  val winCumeDist: String = """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           ntile(10) OVER wt AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice),
           wt AS (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderkey
  """

  // ---- round-7 widening, part 3 ----

  // same deterministic probe nulling; NOT IN three-valued logic means
  // NULL probes are excluded on both engines
  val joinNullAwareAnti: String = """
    SELECT o_orderstatus, count(*) AS n_orders
    FROM (SELECT o_orderstatus,
                 CASE WHEN o_orderkey % 97 = 0 THEN NULL
                      ELSE o_custkey END AS probe_custkey
          FROM orders)
    WHERE probe_custkey NOT IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderstatus ORDER BY o_orderstatus
  """

  // the bloom prefilter is a pure reduction: the exact join removes
  // every false positive, so the oracle is the plain join
  val scaleBloomPrefilter: String = s"""
    SELECT s_suppkey, count(*) AS n_items,
           CAST(sum(${m("l_quantity")}) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_acctbal >= 5000.0
    GROUP BY s_suppkey ORDER BY s_suppkey
  """

  // the merged base+delta state must equal a full recompute exactly
  // (count and decimal sum are associative)
  val pipelineIncrementalAgg: String = s"""
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(${m("o_totalprice")}) AS DOUBLE) AS revenue
    FROM orders GROUP BY o_custkey ORDER BY o_custkey
  """

  // identical spine construction (per-user min..max day) and fill
  // semantics (last non-null over unbounded-preceding rows)
  val tsGapFill: String = """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             count(*) AS n_events, max(value) AS day_max
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, CAST(min(day) AS TIMESTAMP) AS d0,
             CAST(max(day) AS TIMESTAMP) AS d1
      FROM daily GROUP BY user_id),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds)
    SELECT s.user_id, s.day, coalesce(d.n_events, 0) AS n_events,
           last_value(d.day_max IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day
                   ROWS UNBOUNDED PRECEDING) AS filled_max
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    ORDER BY s.user_id, s.day
  """

  // one row per profiled column; exact distincts
  val pipelineProfileColumns: String = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count($c) AS n_nonnull,
             count(DISTINCT $c) AS n_distinct,
             min($c) AS min_val, max($c) AS max_val FROM lineitem"""
    }.mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  // exact decimal moments → single double conversion → identical
  // double-op sequence: the raw z the filter sees is bit-identical,
  // so no |z| > 2 boundary row can flip between engines
  val analyticZscoreOutliers: String = """
    WITH q AS (
      SELECT event_id, user_id, CAST(value AS DECIMAL(12,2)) AS qv
      FROM events),
    mo AS (
      SELECT user_id, count(*) AS n, sum(qv) AS s1, sum(qv * qv) AS s2
      FROM q GROUP BY user_id),
    st AS (
      SELECT user_id, mean,
             sqrt((s2d - n * mean * mean) / (n - 1)) AS std
      FROM (SELECT user_id, n, CAST(s1 AS DOUBLE) / n AS mean,
                   CAST(s2 AS DOUBLE) AS s2d
            FROM mo))
    SELECT q.event_id, q.user_id, CAST(q.qv AS DOUBLE) AS value_q,
           round((CAST(q.qv AS DOUBLE) - st.mean) / st.std, 4) AS z
    FROM q JOIN st ON q.user_id = st.user_id
    WHERE abs((CAST(q.qv AS DOUBLE) - st.mean) / st.std) > 2.0
    ORDER BY q.event_id
  """

  // same 1-based inclusive 20-element slice of the sorted distinct
  // posting list on both engines
  val textInvertedIndex: String = """
    SELECT term, count(DISTINCT doc_id) AS df,
           array_to_string(list_sort(list(DISTINCT doc_id))[1:20], ',')
             AS postings
    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents)
    GROUP BY term ORDER BY term
  """

  // identical 16-term shift-and-mask interleave in DuckDB's operator
  // dialect
  // the serial window formulation of the op's distributed
  // fold-selection; both pick the UPPER median (rank n//2 + 1)
  val analyticMadOutliers: String = """
    WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) c
               FROM orders),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM c),
    m AS (SELECT c med FROM
      (SELECT c, ROW_NUMBER() OVER (ORDER BY c) rn FROM c), nn
      WHERE rn = n // 2 + 1),
    d AS (SELECT abs(c.c - m.med) d FROM c, m),
    md AS (SELECT d mad FROM
      (SELECT d, ROW_NUMBER() OVER (ORDER BY d) rn FROM d), nn
      WHERE rn = n // 2 + 1)
    SELECT nn.n, m.med AS med_cents, md.mad AS mad_cents,
      CAST((SELECT COUNT(*) FROM d, md WHERE d.d > 3 * md.mad) AS BIGINT)
        AS n_outliers,
      ROUND(CAST((SELECT COUNT(*) FROM d, md WHERE d.d > 3 * md.mad)
              AS DOUBLE) / nn.n, 6) AS outlier_rate
    FROM nn, m, md
  """

  val mlImputeMissing: String = """
    WITH t AS (SELECT event_type,
        CASE WHEN event_id % 7 = 0 THEN NULL
             ELSE CAST(value AS DECIMAL(12,2)) END x
      FROM events),
    g AS (SELECT event_type, COUNT(*) n_total, COUNT(x) n_present,
                 CAST(SUM(x) AS DOUBLE) s
          FROM t GROUP BY 1)
    SELECT event_type, CAST(n_total AS BIGINT) n_total,
      CAST(n_total - n_present AS BIGINT) n_missing,
      ROUND(s / n_present, 6) imputed_mean,
      ROUND(s + (n_total - n_present) * (s / n_present), 4) filled_total
    FROM g ORDER BY event_type
  """

  val sourceSchemaEvolution: String = """
    WITH base AS (SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders)
    SELECT 1 AS gen, CAST(COUNT(*) AS BIGINT) n,
      CAST(SUM(cents) AS BIGINT) sum_cents, CAST(0 AS BIGINT) n_with_channel
    FROM base WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT 2, CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT),
      CAST(COUNT(*) AS BIGINT)
    FROM base WHERE o_orderkey % 2 = 1
    ORDER BY gen
  """

  val tsLttbDownsample: String = """
    WITH daily AS (SELECT event_type,
        date_diff('day', DATE '1995-01-01', CAST(ts AS DATE)) x,
        CAST(COUNT(*) AS BIGINT) y
      FROM events GROUP BY 1, 2),
    rng AS (SELECT event_type, MIN(x) xmin, MAX(x) xmax
            FROM daily GROUP BY 1),
    b AS (SELECT d.event_type, ((d.x - xmin) * 16) // (xmax - xmin + 1) bkt,
                 d.x, d.y
          FROM daily d JOIN rng USING (event_type)),
    agg AS (SELECT event_type, bkt, SUM(x) sx, SUM(y) sy, COUNT(*) n
            FROM b GROUP BY 1, 2),
    cand AS (SELECT b.event_type, b.bkt, b.x, b.y,
        abs((l.sx - l.n * b.x) * (r.sy - r.n * b.y) -
            (r.sx - r.n * b.x) * (l.sy - l.n * b.y)) a2
      FROM b
      JOIN agg l ON l.event_type = b.event_type AND l.bkt = b.bkt - 1
      JOIN agg r ON r.event_type = b.event_type AND r.bkt = b.bkt + 1),
    mid AS (SELECT event_type, bkt, x, y FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type, bkt
          ORDER BY a2 DESC, x) rn FROM cand) WHERE rn = 1),
    fst AS (SELECT event_type, bkt, x, y FROM (
        SELECT b.*, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) rn
        FROM b) WHERE rn = 1),
    lst AS (SELECT event_type, bkt, x, y FROM (
        SELECT b.*, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x DESC) rn
        FROM b) WHERE rn = 1)
    SELECT event_type, CAST(bkt AS BIGINT) bkt, CAST(x AS INTEGER) x, y
    FROM (SELECT * FROM fst UNION ALL SELECT * FROM mid
          UNION ALL SELECT * FROM lst)
    ORDER BY event_type, x
  """

  val analyticKruskalWallis: String = """
    WITH cnt AS (SELECT l_returnflag g,
        CAST(l_quantity AS INTEGER) v,
        CAST(COUNT(*) AS BIGINT) ngv
      FROM lineitem GROUP BY 1, 2),
    tv AS (SELECT v, CAST(SUM(ngv) AS BIGINT) t FROM cnt GROUP BY 1),
    cum AS (SELECT v, t, CAST(COALESCE(SUM(t) OVER (ORDER BY v
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) cb
      FROM tv),
    grp AS (SELECT g, CAST(SUM(ngv) AS BIGINT) n_g,
        CAST(SUM(ngv * (2 * cb + t + 1)) AS BIGINT) r2
      FROM cnt JOIN cum USING (v) GROUP BY 1),
    ties AS (SELECT CAST(SUM(t*t*t - t) AS BIGINT) tie3,
        CAST(SUM(t) AS BIGINT) n FROM tv),
    scal AS (SELECT SUM(CAST(ROUND(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) /
        (4.0 * n_g), 6) AS DECIMAL(38,6))) sr FROM grp),
    hrow AS (SELECT n, ROUND(
        12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) *
          CAST(sr AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) h_stat,
      ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) *
          CAST(sr AS DOUBLE) - 3.0 * (CAST(n AS DOUBLE) + 1.0)) /
        (1.0 - CAST(tie3 AS DOUBLE) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE) -
           CAST(n AS DOUBLE))), 6) h_tie_corrected
      FROM scal, ties)
    SELECT g AS return_flag, n_g, r2 AS rank_sum_x2,
      ROUND(CAST(r2 AS DOUBLE) / (2.0 * n_g), 6) AS mean_rank,
      n AS n_total, h_stat, h_tie_corrected
    FROM grp, hrow
    ORDER BY return_flag
  """

  val analyticRunsTest: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(COUNT(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    diff AS (SELECT a.event_type, a.d,
        CASE WHEN b.c - a.c > 0 THEN 1 ELSE -1 END sgn
      FROM daily a JOIN daily b ON b.event_type = a.event_type
        AND b.d = a.d + 1
      WHERE b.c - a.c <> 0),
    lagged AS (SELECT event_type, sgn,
        lag(sgn) OVER (PARTITION BY event_type ORDER BY d) prev
      FROM diff),
    runs AS (SELECT event_type,
        CAST(SUM(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT) n_pos,
        CAST(SUM(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT) n_neg,
        CAST(SUM(CASE WHEN prev IS NULL OR prev <> sgn THEN 1 ELSE 0 END)
          AS BIGINT) runs
      FROM lagged GROUP BY 1)
    SELECT event_type, n_pos, n_neg, runs,
      ROUND(2.0 * n_pos * n_neg / (CAST(n_pos AS DOUBLE) + n_neg) + 1.0, 6)
        AS expected_runs,
      ROUND((CAST(runs AS DOUBLE) -
          (2.0 * n_pos * n_neg / (CAST(n_pos AS DOUBLE) + n_neg) + 1.0)) /
        sqrt(2.0 * n_pos * n_neg *
            (2.0 * n_pos * n_neg - (CAST(n_pos AS DOUBLE) + n_neg)) /
          ((CAST(n_pos AS DOUBLE) + n_neg) * (CAST(n_pos AS DOUBLE) + n_neg) *
           ((CAST(n_pos AS DOUBLE) + n_neg) - 1.0))), 6) AS z_score
    FROM runs ORDER BY event_type
  """

  val analyticCramersV: String = """
    WITH cells AS (SELECT c_mktsegment segment,
        CAST(c_nationkey AS INTEGER) nation, COUNT(*) obs
      FROM customer GROUP BY 1, 2),
    rt AS (SELECT segment, SUM(obs) row_n FROM cells GROUP BY 1),
    ct AS (SELECT nation, SUM(obs) col_n FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(obs) AS BIGINT) n_total FROM cells),
    dims AS (SELECT CAST(COUNT(DISTINCT segment) AS BIGINT) r,
        CAST(COUNT(DISTINCT nation) AS BIGINT) c FROM cells),
    chi AS (SELECT SUM(CAST(ROUND(
        (obs - CAST(row_n * col_n AS DOUBLE) / n_total) *
        (obs - CAST(row_n * col_n AS DOUBLE) / n_total) /
        (CAST(row_n * col_n AS DOUBLE) / n_total), 6) AS DECIMAL(38,6))) chi2
      FROM cells JOIN rt USING (segment) JOIN ct USING (nation), tot)
    SELECT n_total, r AS n_rows, c AS n_cols,
      CAST(chi2 AS DOUBLE) AS chi2,
      ROUND(sqrt(CAST(chi2 AS DOUBLE) /
        (CAST(n_total AS DOUBLE) *
         CAST(least(r, c) - 1 AS DOUBLE))), 6) AS cramers_v
    FROM chi, tot, dims
  """

  // shared ACF scaffold (the tsAcfTable recipe + n_days), lags 1..maxLag
  private def acfCte(maxLag: Int): String = s"""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    mu AS (SELECT event_type et,
        CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) mu
      FROM daily GROUP BY 1),
    dev AS (SELECT event_type, d, CAST(c AS DOUBLE) - mu dv
            FROM daily JOIN mu ON event_type = et),
    den AS (SELECT event_type et2,
        sum(CAST(ROUND(dv * dv, 6) AS DECIMAL(28,6))) den
      FROM dev GROUP BY 1),
    nd AS (SELECT event_type et3, CAST(count(*) AS BIGINT) n_days
           FROM daily GROUP BY 1),
    pairs AS (SELECT a.event_type, k,
        sum(CAST(ROUND(a.dv * b.dv, 6) AS DECIMAL(28,6))) num
      FROM dev a CROSS JOIN (SELECT unnest(range(1, ${maxLag + 1})) k)
        JOIN dev b ON b.event_type = a.event_type
          AND b.d = a.d + CAST(k AS INTEGER)
      GROUP BY 1, 2),
    acf AS (SELECT p.event_type, CAST(k AS INTEGER) k, n_days,
        ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) acf
      FROM pairs p JOIN den ON p.event_type = et2
        JOIN nd ON p.event_type = et3)"""

  val tsLjungBox: String = acfCte(7) + """,
    t AS (SELECT event_type, n_days,
        CAST(ROUND(acf * acf / (n_days - k), 12) AS DECIMAL(28,12)) term
      FROM acf)
    SELECT event_type, n_days, CAST(COUNT(*) AS BIGINT) df,
      ROUND(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2.0) *
        CAST(SUM(term) AS DOUBLE), 4) q_stat
    FROM t GROUP BY 1, 2 ORDER BY event_type
  """

  val tsSpectralEntropy: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    span AS (SELECT event_type et, min(d) d0,
        CAST(count(*) AS BIGINT) n_days FROM daily GROUP BY 1),
    idx AS (SELECT event_type, c, n_days,
        CAST(date_diff('day', d0, d) AS BIGINT) i
      FROM daily JOIN span ON event_type = et),
    terms AS (SELECT event_type, k, n_days, c,
        2.0 * pi() * k * i / CAST(n_days AS DOUBLE) ang
      FROM idx CROSS JOIN (SELECT unnest(range(1, 9)) k)),
    q AS (SELECT event_type, k, n_days, c,
        CAST(ROUND(cos(ang), 6) AS DECIMAL(12,6)) cosq,
        CAST(ROUND(sin(ang), 6) AS DECIMAL(12,6)) sinq FROM terms),
    pw AS (SELECT event_type, k, max(n_days) n_days,
        CAST(ROUND(CAST(sum(cosq * c) AS DOUBLE) * CAST(sum(cosq * c) AS DOUBLE)
          + CAST(sum(sinq * c) AS DOUBLE) * CAST(sum(sinq * c) AS DOUBLE), 4)
          AS DECIMAL(28,4)) pow
      FROM q GROUP BY 1, 2),
    tot AS (SELECT event_type et2, sum(pow) totp FROM pw GROUP BY 1),
    tm AS (SELECT event_type, n_days,
        CAST(CASE WHEN pow > 0 THEN ROUND(
            -(CAST(pow AS DOUBLE) / CAST(totp AS DOUBLE)) *
            log2(CAST(pow AS DOUBLE) / CAST(totp AS DOUBLE)), 8)
          ELSE 0.0 END AS DECIMAL(28,8)) term
      FROM pw JOIN tot ON event_type = et2)
    SELECT event_type, n_days,
      ROUND(CAST(SUM(term) AS DOUBLE) / 3.0, 6) spectral_entropy
    FROM tm GROUP BY 1, 2 ORDER BY event_type
  """

  val tsPacf: String = acfCte(3) + """,
    r AS (SELECT event_type,
        MAX(CASE WHEN k = 1 THEN acf END) r1,
        MAX(CASE WHEN k = 2 THEN acf END) r2,
        MAX(CASE WHEN k = 3 THEN acf END) r3
      FROM acf GROUP BY 1),
    s2 AS (SELECT *, ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) p22 FROM r),
    s3 AS (SELECT *, ROUND(r1 - p22 * r1, 6) p21 FROM s2),
    s4 AS (SELECT *, ROUND((r3 - p21 * r2 - p22 * r1) /
        (1.0 - p21 * r1 - p22 * r2), 6) p33 FROM s3)
    SELECT event_type, r1 AS pacf1, p22 AS pacf2, p33 AS pacf3
    FROM s4 ORDER BY event_type
  """

  val textKneserNeyBigram: String = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bi AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) c12 FROM (
        SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
               unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
        FROM toks WHERE len(t) >= 2)
      GROUP BY w1, w2),
    ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) c1,
        CAST(count(*) AS BIGINT) n1f FROM bi GROUP BY 1),
    hist AS (SELECT w2, CAST(count(*) AS BIGINT) n1b FROM bi GROUP BY 1),
    types AS (SELECT CAST(count(*) AS BIGINT) t_types FROM bi),
    top AS (SELECT * FROM bi JOIN ctx USING (w1) JOIN hist USING (w2), types
            ORDER BY c12 DESC, w1, w2 LIMIT 25)
    SELECT w1, w2, c12, c1,
      ROUND(GREATEST(c12 - 0.75, 0.0) / c1 +
        0.75 * (CAST(n1f AS DOUBLE) / c1) *
          (CAST(n1b AS DOUBLE) / t_types), 6) AS p_kn
    FROM top ORDER BY c12 DESC, w1, w2
  """

  val mlRidgeClosedForm: String = """
    WITH per AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) x1,
        CAST(SUM(CAST(l_quantity AS INTEGER)) AS BIGINT) x2,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) y
      FROM lineitem GROUP BY 1),
    p AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(x1) AS BIGINT) sx1, CAST(SUM(x2) AS BIGINT) sx2,
        CAST(SUM(y) AS BIGINT) sy,
        CAST(SUM(x1 * x1) AS BIGINT) s11, CAST(SUM(x1 * x2) AS BIGINT) s12,
        CAST(SUM(x2 * x2) AS BIGINT) s22,
        CAST(SUM(x1 * y) AS BIGINT) s1y, CAST(SUM(x2 * y) AS BIGINT) s2y
      FROM per),
    m AS (SELECT *,
        CAST(s11 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) /
          CAST(n AS DOUBLE) + 1000.0 a,
        CAST(s12 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE) /
          CAST(n AS DOUBLE) b,
        CAST(s22 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) /
          CAST(n AS DOUBLE) + 1000.0 c,
        CAST(s1y AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE) /
          CAST(n AS DOUBLE) d,
        CAST(s2y AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE) /
          CAST(n AS DOUBLE) e
      FROM p),
    w AS (SELECT *,
        ROUND((c * d - b * e) / (a * c - b * b), 6) w1,
        ROUND((a * e - b * d) / (a * c - b * b), 6) w2
      FROM m)
    SELECT n, w1, w2,
      ROUND((CAST(sy AS DOUBLE) - w1 * sx1 - w2 * sx2) /
        CAST(n AS DOUBLE), 4) AS intercept,
      CAST(1000.0 AS DOUBLE) AS lambda
    FROM w
  """

  val mlKmeansSqlExact: String = """
    WITH pts AS (SELECT l_orderkey okey, l_linenumber lnum,
        CAST(l_quantity AS INTEGER) x,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) y
      FROM lineitem),
    seeds AS (SELECT * FROM (VALUES
        (1, CAST(10.0 AS DECIMAL(18,6)), CAST(1500000.0 AS DECIMAL(18,6))),
        (2, CAST(25.0 AS DECIMAL(18,6)), CAST(3000000.0 AS DECIMAL(18,6))),
        (3, CAST(40.0 AS DECIMAL(18,6)), CAST(6000000.0 AS DECIMAL(18,6))))
      AS s(cid, cx, cy)),
    a1 AS (SELECT okey, lnum, x, y, cid, d2 FROM (
        SELECT p.*, s.cid,
          (x - CAST(cx AS DOUBLE)) * (x - CAST(cx AS DOUBLE)) +
          (y - CAST(cy AS DOUBLE)) * (y - CAST(cy AS DOUBLE)) d2,
          ROW_NUMBER() OVER (PARTITION BY okey, lnum, x, y
            ORDER BY (x - CAST(cx AS DOUBLE)) * (x - CAST(cx AS DOUBLE)) +
              (y - CAST(cy AS DOUBLE)) * (y - CAST(cy AS DOUBLE)), s.cid) rn
        FROM pts p CROSS JOIN seeds s) WHERE rn = 1),
    c1 AS (SELECT cid,
        CAST(ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6)
          AS DECIMAL(18,6)) cx,
        CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6)
          AS DECIMAL(18,6)) cy
      FROM a1 GROUP BY 1),
    a2 AS (SELECT okey, lnum, x, y, cid, d2 FROM (
        SELECT p.*, s.cid,
          (x - CAST(cx AS DOUBLE)) * (x - CAST(cx AS DOUBLE)) +
          (y - CAST(cy AS DOUBLE)) * (y - CAST(cy AS DOUBLE)) d2,
          ROW_NUMBER() OVER (PARTITION BY okey, lnum, x, y
            ORDER BY (x - CAST(cx AS DOUBLE)) * (x - CAST(cx AS DOUBLE)) +
              (y - CAST(cy AS DOUBLE)) * (y - CAST(cy AS DOUBLE)), s.cid) rn
        FROM pts p CROSS JOIN c1 s) WHERE rn = 1)
    SELECT cid, CAST(COUNT(*) AS BIGINT) n_points,
      ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 6) cx,
      ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) cy,
      ROUND(CAST(SUM(CAST(ROUND(d2, 4) AS DECIMAL(28,4))) AS DOUBLE), -6)
        inertia
    FROM a2 GROUP BY 1 ORDER BY cid
  """

  // layout clauses don't change results: the oracle is the plain agg
  val sqlDistributeClusterBy: String = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) total_cents
    FROM orders GROUP BY 1 ORDER BY 1
  """

  val pipelineLateArrivingDim: String = """
    WITH dim AS (SELECT c_custkey, CAST(c_nationkey AS INTEGER) nation,
        c_custkey % 10 = 0 late FROM customer),
    f AS (SELECT o_custkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders)
    SELECT nation, CAST(COUNT(*) AS BIGINT) n_orders,
      CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) n_late,
      CAST(SUM(CASE WHEN late THEN cents ELSE 0 END) AS BIGINT) late_cents,
      ROUND(CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS DOUBLE) /
        COUNT(*), 6) late_share
    FROM f JOIN dim ON o_custkey = c_custkey
    GROUP BY 1 ORDER BY 1
  """

  val fnRoundingModes: String = """
    WITH b AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        AS BIGINT) c FROM orders),
    m AS (SELECT c, c // 100 q, c % 100 r FROM b)
    SELECT CAST(COUNT(*) AS BIGINT) n,
      CAST(SUM((c + 50) // 100) AS BIGINT) sum_half_up,
      CAST(SUM(q + CASE WHEN r > 50 OR (r = 50 AND q % 2 = 1)
        THEN 1 ELSE 0 END) AS BIGINT) sum_half_even,
      CAST(SUM(q) AS BIGINT) sum_floor,
      CAST(SUM((c + 99) // 100) AS BIGINT) sum_ceil
    FROM m
  """

  val simMatryoshkaPrefixRecall: String = """
    WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings
               WHERE vec_id < 8),
    p AS (SELECT qid, b.vec_id vid,
        list_dot_product(qe::DOUBLE[], b.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(qe::DOUBLE[], qe::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding::DOUBLE[],
                                 b.embedding::DOUBLE[]))) cosf,
        list_dot_product(qe[1:8]::DOUBLE[], b.embedding[1:8]::DOUBLE[]) /
          (sqrt(list_dot_product(qe[1:8]::DOUBLE[], qe[1:8]::DOUBLE[])) *
           sqrt(list_dot_product(b.embedding[1:8]::DOUBLE[],
                                 b.embedding[1:8]::DOUBLE[]))) cos8
      FROM q JOIN embeddings b ON b.vec_id <> qid),
    r AS (SELECT qid, vid,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosf DESC, vid) rf,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos8 DESC, vid) r8
      FROM p)
    SELECT qid, CAST(SUM(CASE WHEN rf <= 10 AND r8 <= 10 THEN 1 ELSE 0 END)
        AS BIGINT) n_overlap,
      ROUND(CAST(SUM(CASE WHEN rf <= 10 AND r8 <= 10 THEN 1 ELSE 0 END)
        AS DOUBLE) / 10.0, 2) recall_at_10
    FROM r GROUP BY 1 ORDER BY qid
  """

  val pipelineEmbeddingDrift: String = """
    WITH comps AS (SELECT label % 2 grp, CAST(i AS INTEGER) dim,
        CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(18,6)) x
      FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) i)),
    g AS (SELECT dim,
        CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) na,
        SUM(CASE WHEN grp = 0 THEN x END) sa,
        SUM(CASE WHEN grp = 0 THEN x * x END) qa,
        CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) nb,
        SUM(CASE WHEN grp = 1 THEN x END) sb,
        SUM(CASE WHEN grp = 1 THEN x * x END) qb
      FROM comps GROUP BY 1)
    SELECT dim, na, nb,
      ROUND(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
            CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 6) mean_shift,
      ROUND((CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) -
             CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE)) /
        sqrt(((CAST(qa AS DOUBLE) * CAST(na AS DOUBLE) -
               CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE)) /
              (CAST(na AS DOUBLE) * CAST(na AS DOUBLE))) / CAST(na AS DOUBLE)
            + ((CAST(qb AS DOUBLE) * CAST(nb AS DOUBLE) -
                CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) /
               (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE))) /
              CAST(nb AS DOUBLE)), 4) z_score
    FROM g ORDER BY dim
  """

  // the bloom-filter layout doesn't change content: derive both
  // aggregates from the source table
  val sourceParquetBloomRoundtrip: String = """
    WITH b AS (SELECT o_orderkey, o_custkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM b) n_rows,
      (SELECT CAST(SUM(cents) AS BIGINT) FROM b) sum_cents,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM b WHERE o_custkey = 7) n_probe,
      (SELECT CAST(COALESCE(SUM(cents), 0) AS BIGINT) FROM b
        WHERE o_custkey = 7) probe_cents
  """

  val mlStratifiedAte: String = """
    WITH per AS (SELECT c_mktsegment segment,
        CAST(SUM(CASE WHEN t THEN 1 ELSE 0 END) AS BIGINT) nt,
        CAST(SUM(CASE WHEN t THEN y ELSE 0 END) AS BIGINT) st,
        CAST(SUM(CASE WHEN NOT t THEN 1 ELSE 0 END) AS BIGINT) nc,
        CAST(SUM(CASE WHEN NOT t THEN y ELSE 0 END) AS BIGINT) sc
      FROM (SELECT o_custkey,
          o_orderpriority IN ('1-URGENT', '2-HIGH') t,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) y
        FROM orders) o JOIN customer ON o_custkey = c_custkey
      GROUP BY 1),
    tot AS (SELECT CAST(SUM(nt + nc) AS BIGINT) n,
        CAST(SUM(nt) AS BIGINT) tnt, CAST(SUM(st) AS BIGINT) tst,
        CAST(SUM(nc) AS BIGINT) tnc, CAST(SUM(sc) AS BIGINT) tsc
      FROM per),
    strat AS (SELECT segment, nt, nc,
        ROUND(CAST(st AS DOUBLE) / nt, 6) mean_treated,
        ROUND(CAST(sc AS DOUBLE) / nc, 6) mean_control,
        CAST(ROUND((CAST(nt + nc AS DOUBLE) / n) *
          (CAST(st AS DOUBLE) / nt - CAST(sc AS DOUBLE) / nc), 6)
          AS DECIMAL(28,6)) term
      FROM per, tot),
    ate AS (SELECT CAST(SUM(term) AS DOUBLE) ate_stratified FROM strat)
    SELECT segment, nt, nc, mean_treated, mean_control,
      CAST(term AS DOUBLE) stratum_term, ate_stratified,
      ROUND(CAST(tst AS DOUBLE) / tnt - CAST(tsc AS DOUBLE) / tnc, 6)
        ate_naive
    FROM strat, ate, tot ORDER BY segment
  """

  val fnArrayHofs: String = """
    WITH arrs AS (SELECT list_sort(list(CAST(l_quantity AS INTEGER))) arr
      FROM lineitem GROUP BY l_orderkey),
    d AS (SELECT list_sum(arr) qsum,
        len(list_filter(arr, x -> x % 2 = 0)) n_even,
        list_sum(list_transform(range(1, len(arr) + 1),
          i -> arr[i] + arr[len(arr) + 1 - i])) pairsum,
        len(list_filter(arr, x -> x >= 45)) > 0 any_big,
        len(list_filter(arr, x -> x <= 0)) = 0 all_pos
      FROM arrs)
    SELECT CAST(COUNT(*) AS BIGINT) n_orders,
      CAST(SUM(qsum) AS BIGINT) sum_qty,
      CAST(SUM(n_even) AS BIGINT) sum_even,
      CAST(SUM(pairsum) AS BIGINT) sum_pairs,
      CAST(SUM(CASE WHEN any_big THEN 1 ELSE 0 END) AS BIGINT) n_any_big,
      CAST(SUM(CASE WHEN all_pos THEN 1 ELSE 0 END) AS BIGINT) n_all_pos
    FROM d
  """

  // the struct layout is a write-side artifact: the oracle aggregates
  // the flat source
  val scanNestedPruning: String = """
    SELECT o_orderpriority priority, CAST(COUNT(*) AS BIGINT) n,
      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) total_cents
    FROM orders GROUP BY 1 ORDER BY 1
  """

  val sortNullsOrdering: String = """
    SELECT o_orderkey, nullif(o_orderstatus, 'F') status_or_null,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
    FROM orders
    ORDER BY nullif(o_orderstatus, 'F') ASC NULLS LAST,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) DESC,
      o_orderkey
    LIMIT 40
  """

  // the typed lexicographic (cents, okey) reduce is a per-key argmax
  val typedReduceGroups: String = """
    WITH b AS (SELECT o_custkey cust, o_orderkey okey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders),
    r AS (SELECT cust, okey, cents, ROW_NUMBER() OVER (PARTITION BY cust
        ORDER BY cents DESC, okey DESC) rn FROM b)
    SELECT CAST(COUNT(*) AS BIGINT) n_customers,
      CAST(SUM(cents) AS BIGINT) sum_top_cents,
      CAST(SUM(okey) AS BIGINT) sum_top_keys
    FROM r WHERE rn = 1
  """

  // withField/dropFields are projections: the oracle works on the flat
  // source
  val projectStructRewrite: String = """
    SELECT o_orderpriority priority, CAST(COUNT(*) AS BIGINT) n,
      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) * 2)
        AS BIGINT) sum_cents_x2,
      CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
        AS BIGINT) n_urgent
    FROM orders GROUP BY 1 ORDER BY 1
  """

  val filterPushdownOr: String = """
    SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(cents) AS BIGINT) sum_cents
    FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        cents
      FROM orders
      WHERE o_totalprice > 400000.0 OR o_orderpriority = '1-URGENT')
  """

  val analyticTopPaths: String = """
    WITH e AS (SELECT user_id, CAST(ts AS DATE) d, ts, event_id, event_type,
        ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
          ORDER BY ts, event_id) rn
      FROM events),
    seqs AS (SELECT user_id, d,
        string_agg(event_type, '>' ORDER BY rn) path
      FROM e WHERE rn <= 4 GROUP BY 1, 2)
    SELECT path, CAST(COUNT(*) AS BIGINT) n_journeys
    FROM seqs GROUP BY 1
    ORDER BY n_journeys DESC, path LIMIT 15
  """

  val textCodeScore: String = """
    WITH d AS (SELECT lang,
        CAST(len(regexp_extract_all(text, '[{}()\[\];=<>]')) AS BIGINT) sym,
        CAST(len(regexp_extract_all(text,
          '\b(def|class|return|import|void|int)\b')) AS BIGINT) kw,
        CAST(len(regexp_extract_all(text, '\n(    |\t)')) AS BIGINT) ind
      FROM documents),
    s AS (SELECT lang, 3 * kw + sym // 4 + 2 * ind score FROM d)
    SELECT lang, CAST(COUNT(*) AS BIGINT) n_docs,
      ROUND(CAST(SUM(score) AS DOUBLE) / COUNT(*), 6) mean_score,
      CAST(SUM(CASE WHEN score >= 20 THEN 1 ELSE 0 END) AS BIGINT) n_codey
    FROM s GROUP BY 1 ORDER BY 1
  """

  val scaleJoinStrategySwitch: String = """
    SELECT n_name, CAST(COUNT(*) AS BIGINT) n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1 ORDER BY 1
  """

  val tsPiecewiseTrend: String = """
    WITH daily AS (SELECT o_orderdate d, CAST(COUNT(*) AS BIGINT) c
      FROM orders GROUP BY 1),
    b AS (SELECT CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) x,
        c, (month(d) - 1) // 4 seg FROM daily),
    p AS (SELECT seg, CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(x) AS BIGINT) sx, CAST(SUM(c) AS BIGINT) sy,
        CAST(SUM(x * x) AS BIGINT) sxx, CAST(SUM(x * c) AS BIGINT) sxy
      FROM b GROUP BY 1),
    s AS (SELECT *, ROUND(
        (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) /
          CAST(n AS DOUBLE)) /
        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
          CAST(n AS DOUBLE)), 6) slope
      FROM p)
    SELECT CAST(seg AS BIGINT) seg, n AS n_days, slope,
      ROUND((CAST(sy AS DOUBLE) - slope * sx) / CAST(n AS DOUBLE), 4)
        intercept
    FROM s ORDER BY seg
  """

  val fnIpv4Octets: String = """
    WITH ips AS (SELECT (event_id * 2654435761) % 4294967296 ip FROM events),
    o AS (SELECT ip, ip // 16777216 o1, (ip // 65536) % 256 o2,
        (ip // 256) % 256 o3, ip % 256 o4 FROM ips)
    SELECT CAST(o1 AS BIGINT) o1, CAST(o2 AS BIGINT) o2,
      CAST(COUNT(*) AS BIGINT) n_events,
      CAST(COUNT(DISTINCT ip) AS BIGINT) n_ips,
      MIN(concat_ws('.', o1, o2, o3, o4)) sample_ip
    FROM o GROUP BY 1, 2
    ORDER BY n_events DESC, o1, o2 LIMIT 20
  """

  val pipelineRowLevelSecurity: String = """
    WITH policy AS (SELECT * FROM (VALUES
        ('analyst_emea', 0, 9), ('analyst_apac', 10, 19),
        ('admin_global', 0, 24)) p(role, nation_lo, nation_hi)),
    c AS (SELECT c_custkey, CAST(c_nationkey AS INTEGER) nk,
        CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) bal_cents
      FROM customer)
    SELECT role, CAST(COUNT(*) AS BIGINT) n_visible,
      CAST(COUNT(DISTINCT nk) AS BIGINT) n_nations,
      CAST(SUM(bal_cents) AS BIGINT) sum_bal_cents
    FROM c JOIN policy ON nk >= nation_lo AND nk <= nation_hi
    GROUP BY 1 ORDER BY 1
  """

  val streamRateLimitTokens: String = """
    WITH e AS (SELECT user_id, event_id, ts, event_type,
        date_trunc('hour', ts) hr FROM events),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, hr
        ORDER BY ts, event_id) rn FROM e)
    SELECT event_type,
      CAST(SUM(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) n_allowed,
      CAST(SUM(CASE WHEN rn > 3 THEN 1 ELSE 0 END) AS BIGINT) n_denied,
      CAST(COUNT(DISTINCT CASE WHEN rn > 3 THEN user_id END) AS BIGINT)
        n_throttled_users
    FROM r GROUP BY 1 ORDER BY 1
  """

  val joinLookupWaterfall: String = """
    WITH bp1 AS (SELECT * FROM (VALUES ('1-URGENT', 250), ('2-HIGH', 150))
      t(pri, bp1)),
    bp2 AS (SELECT * FROM (VALUES ('F', 50)) t(st, bp2)),
    o AS (SELECT o_orderpriority, o_orderstatus,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders),
    j AS (SELECT o_orderpriority, cents, COALESCE(bp1, bp2, 25) bp
      FROM o LEFT JOIN bp1 ON o_orderpriority = pri
        LEFT JOIN bp2 ON o_orderstatus = st)
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) n,
      CAST(MAX(bp) AS BIGINT) bp_max,
      CAST(SUM((cents * bp) // 10000) AS BIGINT) sum_rebate_cents
    FROM j GROUP BY 1 ORDER BY 1
  """

  // duplicates are byte-identical replays, so the silver min-dedup is
  // field-wise MIN
  val pipelineMedallionRollup: String = """
    WITH base AS (SELECT event_id, event_type,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM events),
    bronze AS (SELECT * FROM base
               UNION ALL SELECT * FROM base WHERE event_id % 97 = 0),
    silver AS (SELECT event_id, MIN(event_type) event_type,
        MIN(cents) cents FROM bronze GROUP BY 1),
    gold AS (SELECT event_type, COUNT(*) n, SUM(cents) s
             FROM silver GROUP BY 1)
    SELECT '1_bronze' layer, CAST(COUNT(*) AS BIGINT) n_rows,
      CAST(SUM(cents) AS BIGINT) checksum FROM bronze
    UNION ALL SELECT '2_silver', CAST(COUNT(*) AS BIGINT),
      CAST(SUM(cents) AS BIGINT) FROM silver
    UNION ALL SELECT '3_gold', CAST(COUNT(*) AS BIGINT),
      CAST(SUM(s) AS BIGINT) FROM gold
    ORDER BY layer
  """

  // run1 commits chunks 0-1, the restart picks up only chunk 2
  val pipelineOffsetResume: String = """
    WITH c AS (SELECT CAST(event_id % 3 AS INTEGER) batch_id,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM events)
    SELECT batch_id, CAST(COUNT(*) AS BIGINT) n_rows,
      CAST(SUM(cents) AS BIGINT) sum_cents,
      CASE WHEN batch_id < 2 THEN 'run1' ELSE 'run2' END processed_by
    FROM c GROUP BY 1 ORDER BY 1
  """

  val sqlSelectStarExcept: String = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) sum_cents,
      CAST(count(DISTINCT o_orderpriority) AS BIGINT) n_priorities
    FROM (SELECT * EXCLUDE (o_custkey, o_orderdate) FROM orders)
    GROUP BY 1 ORDER BY 1
  """

  val tsWmaTriangular: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    lagged AS (SELECT event_type, d + CAST(k AS INTEGER) d2,
        CAST(7 - k AS BIGINT) w, c
      FROM daily CROSS JOIN (SELECT unnest(range(0, 7)) k)),
    j AS (SELECT l.event_type, l.d2 d, CAST(SUM(w * l.c) AS BIGINT) num,
        CAST(COUNT(*) AS BIGINT) nw
      FROM lagged l JOIN daily t ON t.event_type = l.event_type
        AND t.d = l.d2
      GROUP BY 1, 2)
    SELECT event_type, d, ROUND(CAST(num AS DOUBLE) / 28.0, 6) wma7
    FROM j WHERE nw = 7 ORDER BY event_type, d
  """

  val analyticSampleSizePower: String = """
    WITH g AS (SELECT c_mktsegment segment, CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(y) AS BIGINT) s, SUM(CAST(y AS DECIMAL(38,0)) * y) ss
      FROM (SELECT o_custkey,
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) y
        FROM orders) o JOIN customer ON o_custkey = c_custkey
      GROUP BY 1)
    SELECT segment, n AS n_observed,
      ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) mean_cents,
      ROUND(sqrt((CAST(ss AS DOUBLE) * CAST(n AS DOUBLE) -
        CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 4) sd_cents,
      CAST(ceil(2.0 * (1.959964 + 0.841621) * (1.959964 + 0.841621) *
        ((CAST(ss AS DOUBLE) * CAST(n AS DOUBLE) -
          CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
         (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
        ((0.01 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) *
         (0.01 * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))))) AS BIGINT)
        n_required_per_arm
    FROM g ORDER BY segment
  """

  val textVocabCoverage: String = """
    WITH c AS (SELECT w, CAST(COUNT(*) AS BIGINT) c FROM (
        SELECT unnest(string_split(text, ' ')) w FROM documents)
      WHERE len(w) > 0 GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) t,
        CAST(COUNT(*) AS BIGINT) v FROM c),
    pts AS (
      SELECT 100 vocab_k, CAST(SUM(c) AS BIGINT) covered FROM
        (SELECT c FROM c ORDER BY c DESC, w LIMIT 100)
      UNION ALL
      SELECT 1000, CAST(SUM(c) AS BIGINT) FROM
        (SELECT c FROM c ORDER BY c DESC, w LIMIT 1000)
      UNION ALL
      SELECT 4000, CAST(SUM(c) AS BIGINT) FROM
        (SELECT c FROM c ORDER BY c DESC, w LIMIT 4000))
    SELECT CAST(vocab_k AS BIGINT) vocab_k, covered,
      v AS n_distinct_words,
      ROUND(CAST(covered AS DOUBLE) / t, 6) coverage
    FROM pts, tot ORDER BY vocab_k
  """

  val textFreqSpectrum: String = """
    WITH w AS (SELECT unnest(string_split(text, ' ')) w FROM documents),
    c AS (SELECT w, COUNT(*) c FROM w WHERE len(w) > 0 GROUP BY 1)
    SELECT CAST(length(bin(c)) AS BIGINT) band,
      CAST(COUNT(*) AS BIGINT) n_words,
      CAST(MIN(c) AS BIGINT) min_count, CAST(MAX(c) AS BIGINT) max_count
    FROM c GROUP BY 1 ORDER BY band
  """

  // one file per doc: content equality via md5 + length of the source
  val sourceWholetext: String = """
    SELECT md5(text) text_md5, CAST(length(text) AS INTEGER) n_chars
    FROM documents WHERE doc_id < 16 ORDER BY text_md5
  """

  // partition sizing changes parallelism, never results
  val scaleScanPartitionTuning: String = """
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) n,
      CAST(SUM(CAST(l_quantity AS INTEGER)) AS BIGINT) sum_qty
    FROM lineitem GROUP BY 1 ORDER BY 1
  """

  // the same anti-diagonal wavefront as the Spark fold, replayed as a
  // recursive CTE — every cell is BIGINT so equality is exact
  val tsDtwDistance: String = """
    WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    p AS (SELECT x.event_type ta, y.event_type tb, x.d, x.c ca, y.c cb
      FROM daily x JOIN daily y ON x.d = y.d
        AND x.event_type < y.event_type),
    base AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) n,
        list(ca ORDER BY d) a, list(cb ORDER BY d) b
      FROM p GROUP BY 1, 2),
    dp AS (
      SELECT ta, tb, n, a, b, CAST(2 AS BIGINT) dg,
        list_transform(range(1, n + 1), i -> CASE WHEN i = 1
          THEN abs(a[1] - b[1])
          ELSE CAST(1000000000000000 AS BIGINT) END) prev,
        list_transform(range(1, n + 1),
          i -> CAST(1000000000000000 AS BIGINT)) pp
      FROM base
      UNION ALL
      SELECT ta, tb, n, a, b, dg + 1,
        list_transform(range(1, n + 1), i ->
          CASE WHEN dg + 1 - i >= 1 AND dg + 1 - i <= n THEN
            abs(a[i] - b[dg + 1 - i]) + least(
              CASE WHEN i > 1 THEN prev[i - 1]
                ELSE CAST(1000000000000000 AS BIGINT) END,
              prev[i],
              CASE WHEN i > 1 THEN pp[i - 1]
                ELSE CAST(1000000000000000 AS BIGINT) END)
          ELSE CAST(1000000000000000 AS BIGINT) END),
        prev
      FROM dp WHERE dg < 2 * n)
    SELECT ta type_a, tb type_b, n n_days,
      CAST(prev[n] AS BIGINT) dtw_cost,
      ROUND(CAST(prev[n] AS DOUBLE) / (2.0 * n), 4) dtw_per_step
    FROM dp WHERE dg = 2 * n ORDER BY type_a, type_b
  """

  val tsHierarchicalReconcile: String = """
    WITH o AS (SELECT CAST(c_nationkey AS INTEGER) nation,
        CAST(o_orderdate AS DATE) od
      FROM orders JOIN customer ON o_custkey = c_custkey),
    dmax AS (SELECT MAX(od) dmax FROM o),
    bu AS (SELECT nation, CAST(COUNT(*) AS BIGINT) bottom_up
      FROM o, dmax WHERE od > dmax - 7 GROUP BY 1),
    tot14 AS (SELECT CAST(COUNT(*) AS BIGINT) n14 FROM o, dmax
      WHERE od > dmax - 14),
    but AS (SELECT CAST(SUM(bottom_up) AS BIGINT) bu_total FROM bu)
    SELECT nation, bottom_up,
      ROUND(CAST(bottom_up AS DOUBLE) / bu_total, 6) AS share,
      CAST(n14 // 2 AS BIGINT) total_forecast,
      ROUND((CAST(bottom_up AS DOUBLE) / bu_total) *
        CAST(n14 // 2 AS DOUBLE), 4) top_down
    FROM bu, tot14, but ORDER BY nation
  """

  val graphWeightedPagerank: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "r0" else s"r${i - 1}"
      s"""c$i AS (SELECT e.dst, CAST(SUM((r.rr * e.w) // s.wsum) AS BIGINT) sm
        FROM edges e JOIN ws s ON s.src = e.src
          JOIN $prev r ON r.node = e.src GROUP BY 1),
      r$i AS (SELECT dst node,
        CAST(150000000000 // nn + (85 * sm) // 100 AS BIGINT) rr
        FROM c$i, nc)"""
    }
    s"""
    WITH pairs AS (SELECT l_partkey p, l_suppkey + 10000000 s,
        CAST(COUNT(*) AS BIGINT) w FROM lineitem GROUP BY 1, 2),
    edges AS MATERIALIZED (SELECT p src, s dst, w FROM pairs
              UNION ALL SELECT s, p, w FROM pairs),
    ws AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) wsum
                        FROM edges GROUP BY 1),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) nn FROM ws),
    r0 AS (SELECT src node, CAST(1000000000000 // nn AS BIGINT) rr
           FROM ws, nc),
    ${round(1)}, ${round(2)}, ${round(3)}
    SELECT node, CAST((rr * nn) // 1000000 AS DOUBLE) / 1000000.0
      rank_scaled
    FROM r3, nc ORDER BY node
    """
  }

  val sourceGenerateRange: String = """
    SELECT bucket, CAST(COUNT(*) AS BIGINT) n, CAST(SUM(v) AS BIGINT) sum_v,
      CAST(MIN(v) AS BIGINT) min_v, CAST(MAX(v) AS BIGINT) max_v
    FROM (SELECT range id, range % 7 bucket,
        (range * 2654435761) % 1000 v
      FROM range(0, 100000))
    GROUP BY 1 ORDER BY 1
  """

  val tsDowMedianProfile: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    k AS (SELECT event_type, CAST(isodow(d) AS INTEGER) isodow, c
          FROM daily)
    SELECT event_type, isodow, CAST(count(*) AS BIGINT) n_days,
      CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY c) AS DOUBLE)
        median_daily,
      CAST(min(c) AS BIGINT) min_daily, CAST(max(c) AS BIGINT) max_daily
    FROM k GROUP BY 1, 2 ORDER BY 1, 2
  """

  val fnHaversineNearestHub: String = """
    WITH cust AS (SELECT c_custkey,
        CAST((c_custkey * 2654435761) % 14000 AS DOUBLE) / 100.0 - 70.0 lat,
        CAST((c_custkey * 40503) % 36000 AS DOUBLE) / 100.0 - 180.0 lon
      FROM customer),
    hubs AS (SELECT * FROM (VALUES (1, 40.7, -74.0), (2, 51.5, -0.1),
        (3, 35.7, 139.7), (4, -33.9, 151.2), (5, 19.4, -99.1))
      h(hub, hlat, hlon)),
    d AS (SELECT c_custkey, hub, ROUND(12742.0 * asin(sqrt(
        sin((hlat - lat) * (pi() / 180.0) / 2.0) *
          sin((hlat - lat) * (pi() / 180.0) / 2.0) +
        cos(lat * (pi() / 180.0)) * cos(hlat * (pi() / 180.0)) *
          sin((hlon - lon) * (pi() / 180.0) / 2.0) *
          sin((hlon - lon) * (pi() / 180.0) / 2.0))), 4) d
      FROM cust CROSS JOIN hubs),
    best AS (SELECT c_custkey, hub, d FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
          ORDER BY d, hub) rn FROM d) WHERE rn = 1)
    SELECT hub, CAST(COUNT(*) AS BIGINT) n_customers,
      ROUND(CAST(SUM(CAST(d AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 2)
        avg_km,
      MAX(d) max_km
    FROM best GROUP BY 1 ORDER BY 1
  """

  val tsTradingDayAdjust: String = """
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
        CAST(COUNT(*) AS BIGINT) c FROM orders GROUP BY 1),
    dd AS (SELECT d, c, CAST(isodow(d) AS INTEGER) dow FROM daily),
    wk AS (SELECT dow dw, CAST(SUM(c) AS BIGINT) sc,
        CAST(COUNT(*) AS BIGINT) nd FROM dd GROUP BY 1),
    tot AS (SELECT CAST(SUM(sc) AS BIGINT) ts2,
        CAST(SUM(nd) AS BIGINT) td FROM wk),
    m AS (SELECT CAST(date_trunc('month', d) AS DATE) AS month,
        CAST(SUM(c) AS BIGINT) actual, CAST(COUNT(*) AS BIGINT) n_days,
        SUM(CAST(ROUND(CAST(sc AS DOUBLE) / nd, 6) AS DECIMAL(28,6))) expw,
        MAX(CAST(ts2 AS DOUBLE) / td) avg_day
      FROM dd JOIN wk ON dow = dw, tot GROUP BY 1)
    SELECT month, actual, n_days,
      ROUND(CAST(expw AS DOUBLE) / (n_days * avg_day), 6) td_index,
      ROUND(CAST(actual AS DOUBLE) /
        (CAST(expw AS DOUBLE) / (n_days * avg_day)), 4) adjusted
    FROM m ORDER BY month
  """

  // the range layout never changes the aggregate
  val scaleRangePartitionSort: String = """
    SELECT CAST(COUNT(*) AS BIGINT) n, CAST(MIN(cents) AS BIGINT) min_cents,
      CAST(MAX(cents) AS BIGINT) max_cents,
      CAST(SUM(cents) AS BIGINT) sum_cents
    FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        cents FROM orders)
  """

  private val markovTransCte = """
    tr AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) c FROM (
      SELECT event_type a,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) b
      FROM events) WHERE b IS NOT NULL GROUP BY 1, 2)"""

  lazy val tsMarkovEntropyRate: String = s"""
    WITH $markovTransCte,
    outs AS (SELECT a a2, CAST(SUM(c) AS BIGINT) outc FROM tr GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) n,
        CAST(COUNT(DISTINCT a) AS BIGINT) k FROM tr),
    terms AS (SELECT n, k, CAST(ROUND(
        -((CAST(c AS DOUBLE) / n) * log2(CAST(c AS DOUBLE) / outc)), 9)
        AS DECIMAL(28,9)) tm
      FROM tr JOIN outs ON a = a2, tot)
    SELECT n n_transitions, k n_states,
      ROUND(CAST(SUM(tm) AS DOUBLE), 6) entropy_rate_bits,
      ROUND(log2(CAST(k AS DOUBLE)), 6) max_entropy_bits
    FROM terms GROUP BY 1, 2
  """

  lazy val mlMarkovNextEventAcc: String = s"""
    WITH $markovTransCte,
    pred AS (SELECT a, b predicted, c, CAST(SUM(c) OVER (PARTITION BY a)
        AS BIGINT) out_total,
        ROW_NUMBER() OVER (PARTITION BY a ORDER BY c DESC, b) rn
      FROM tr)
    SELECT a state, predicted, out_total, CAST(c AS BIGINT) best_count,
      ROUND(CAST(c AS DOUBLE) / out_total, 6) in_sample_accuracy
    FROM pred WHERE rn = 1 ORDER BY state
  """

  private val dailyRevCte = """
    daily AS (SELECT CAST(o_orderdate AS DATE) d,
      SUM(CAST(o_totalprice AS DECIMAL(12,2))) sv
    FROM orders GROUP BY 1)"""

  lazy val tsSaxSymbols: String = s"""
    WITH $dailyRevCte,
    idx AS (SELECT d, sv, ROW_NUMBER() OVER (ORDER BY d) - 1 i FROM daily),
    segs AS (SELECT CAST(FLOOR(i / 7) AS BIGINT) seg,
        CAST(COUNT(*) AS BIGINT) n_days, SUM(sv) ssum
      FROM idx GROUP BY 1),
    q AS (SELECT seg, n_days, CAST(ssum AS DOUBLE) / n_days paa,
        NTILE(4) OVER (ORDER BY CAST(ssum AS DOUBLE) / n_days, seg) qt
      FROM segs)
    SELECT seg, n_days, ROUND(paa, 6) paa_value,
      CASE qt WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c'
        ELSE 'd' END symbol
    FROM q ORDER BY seg
  """

  lazy val analyticCochranArmitage: String = """
    WITH g AS (SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) w,
        CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
          AS BIGINT) r
      FROM orders GROUP BY 1),
    s AS (SELECT CAST(SUM(n) AS BIGINT) nn, CAST(SUM(r) AS BIGINT) rr,
        CAST(SUM(w * n) AS BIGINT) swn, CAST(SUM(w * r) AS BIGINT) swr,
        CAST(SUM(w * w * n) AS BIGINT) sw2n FROM g)
    SELECT nn n_total, rr n_success, swn sum_wn, swr sum_wr,
      ROUND(CAST(rr AS DOUBLE) / nn, 6) pooled_rate,
      ROUND(sqrt(CAST(nn AS DOUBLE)) *
        (CAST(nn AS DOUBLE) * swr - CAST(rr AS DOUBLE) * swn) /
        sqrt((CAST(rr AS DOUBLE) * (nn - rr)) *
          (CAST(nn AS DOUBLE) * sw2n - CAST(swn AS DOUBLE) * swn)), 6)
        z_trend
    FROM s
  """

  lazy val tsTurningPoints: String = s"""
    WITH $dailyRevCte,
    w AS (SELECT sv, LAG(sv) OVER (ORDER BY d) pv,
        LEAD(sv) OVER (ORDER BY d) nv FROM daily),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
          AND ((sv > pv AND sv > nv) OR (sv < pv AND sv < nv))
          THEN 1 ELSE 0 END) AS BIGINT) t FROM w)
    SELECT n n_days, t n_turning,
      ROUND(CAST(2 * (n - 2) AS DOUBLE) / 3, 6) expected_turning,
      ROUND((CAST(t AS DOUBLE) - CAST(2 * (n - 2) AS DOUBLE) / 3) /
        sqrt(CAST(16 * n - 29 AS DOUBLE) / 90), 6) z_score
    FROM c
  """

  lazy val textLcsRougel: String = """
    WITH RECURSIVE t AS (SELECT doc_id, string_split(text, ' ')[1:24] tk
      FROM documents WHERE doc_id < 60),
    t2 AS (SELECT doc_id, tk FROM t WHERE len(tk) >= 2),
    p AS (SELECT x.doc_id da, y.doc_id dbk, x.tk a, y.tk b,
        CAST(len(x.tk) AS BIGINT) na, CAST(len(y.tk) AS BIGINT) nb
      FROM t2 x JOIN t2 y ON y.doc_id = x.doc_id + 1),
    dp AS (
      SELECT da, dbk, a, b, na, nb, CAST(2 AS BIGINT) dg,
        list_transform(range(1, CAST(na + 1 AS INTEGER)), i ->
          CASE WHEN i = 1 AND a[1] = b[1] THEN CAST(1 AS BIGINT)
            ELSE CAST(0 AS BIGINT) END) prev,
        list_transform(range(1, CAST(na + 1 AS INTEGER)),
          i -> CAST(0 AS BIGINT)) pp
      FROM p
      UNION ALL
      SELECT da, dbk, a, b, na, nb, dg + 1,
        list_transform(range(1, CAST(na + 1 AS INTEGER)), i ->
          CASE WHEN dg + 1 - i >= 1 AND dg + 1 - i <= nb THEN
            CASE WHEN a[i] = b[dg + 1 - i] THEN
              (CASE WHEN i > 1 THEN pp[i - 1]
                ELSE CAST(0 AS BIGINT) END) + 1
            ELSE greatest(
              CASE WHEN i > 1 THEN prev[i - 1]
                ELSE CAST(0 AS BIGINT) END,
              prev[i])
            END
          ELSE CAST(0 AS BIGINT) END),
        prev
      FROM dp WHERE dg < na + nb)
    SELECT da doc_a, dbk doc_b, na n_a, nb n_b,
      CAST(prev[CAST(na AS INTEGER)] AS BIGINT) lcs_len,
      ROUND(2.0 * prev[CAST(na AS INTEGER)] / (na + nb), 6) rouge_l_f1
    FROM dp WHERE dg = na + nb ORDER BY doc_a
  """

  lazy val tsPageHinkley: String = """
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c
      FROM orders GROUP BY 1),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) t_cents,
        CAST(COUNT(*) AS BIGINT) n FROM daily),
    ph AS (SELECT d, c, t_cents, n,
        n * SUM(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
          AND CURRENT ROW)
          - ROW_NUMBER() OVER (ORDER BY d) * t_cents phv
      FROM daily, tot),
    r AS (SELECT d, c, t_cents, n, phv,
        least(CAST(0 AS BIGINT), MIN(phv) OVER (ORDER BY d
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) runmin
      FROM ph)
    SELECT d, c day_cents, CAST(phv AS BIGINT) ph_stat,
      CAST(phv - runmin AS BIGINT) excess,
      CAST(CASE WHEN (phv - runmin) * 50 > t_cents * n
        THEN 1 ELSE 0 END AS BIGINT) alarm
    FROM r ORDER BY d
  """

  // Exact-AdaBoost CTE chain shared by the two ml_adaboost_* oracles:
  // integer weights (wrong ×(q−p), right ×p, renormalized by
  // greatest(1, Σ div 1e9)) and 9dp-frozen DECIMAL vote coefficients,
  // unrolled for 3 rounds exactly like the Spark side.
  private val adaboostCte: String = {
    def roundCte(t: Int): String = {
      val prev = if (t == 1) "base" else s"b${t - 1}"
      s"""e$t AS (SELECT CAST(SUM(w) AS BIGINT) q,
        CAST(SUM(CASE WHEN h1 <> y THEN w ELSE 0 END) AS BIGINT) p1,
        CAST(SUM(CASE WHEN h2 <> y THEN w ELSE 0 END) AS BIGINT) p2,
        CAST(SUM(CASE WHEN h3 <> y THEN w ELSE 0 END) AS BIGINT) p3,
        CAST(SUM(CASE WHEN h4 <> y THEN w ELSE 0 END) AS BIGINT) p4
      FROM $prev),
    s$t AS (SELECT q, least(p1, p2, p3, p4) p,
        CASE WHEN p1 <= p2 AND p1 <= p3 AND p1 <= p4 THEN 1
          WHEN p2 <= p3 AND p2 <= p4 THEN 2
          WHEN p3 <= p4 THEN 3 ELSE 4 END kk
      FROM e$t),
    u$t AS (SELECT $prev.*, q, p, kk,
        CASE kk WHEN 1 THEN h1 WHEN 2 THEN h2 WHEN 3 THEN h3
          ELSE h4 END ch,
        CAST(ROUND(ln(CAST(q - p AS DOUBLE) / p), 9)
          AS DECIMAL(22,9)) alpha
      FROM $prev, s$t),
    v$t AS (SELECT k, y, h1, h2, h3, h4,
        CASE WHEN ch <> y THEN w * (q - p) ELSE w * p END wu,
        CAST(vote + alpha * ch AS DECIMAL(24,9)) vote
      FROM u$t),
    d$t AS (SELECT greatest(CAST(1 AS BIGINT),
        CAST(CAST(SUM(wu) AS BIGINT) // 1000000000 AS BIGINT)) d
      FROM v$t),
    b$t AS (SELECT k, y, h1, h2, h3, h4,
        CAST(wu // d AS BIGINT) w, vote
      FROM v$t, d$t)"""
    }
    s"""
    WITH base AS (SELECT o_orderkey k,
      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE -1 END y,
      CASE WHEN CAST(o_totalprice AS DECIMAL(12,2)) > 150000
        THEN 1 ELSE -1 END h1,
      CASE WHEN CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) <= 2
        THEN 1 ELSE -1 END h2,
      CASE WHEN month(o_orderdate) <= 6 THEN 1 ELSE -1 END h3,
      CASE WHEN o_custkey % 2 = 0 THEN 1 ELSE -1 END h4,
      CAST(1 AS BIGINT) w,
      CAST(0 AS DECIMAL(24,9)) vote
    FROM orders WHERE o_orderkey < 500),
    ${roundCte(1)},
    ${roundCte(2)},
    ${roundCte(3)}"""
  }

  lazy val mlAdaboostStumps: String = s"""
    $adaboostCte
    SELECT CAST(1 AS BIGINT) boost_round, CAST(kk AS BIGINT) stump,
      p err_num, q total_w,
      ROUND(CAST(p AS DOUBLE) / q, 6) err_rate,
      ROUND(ln(CAST(q - p AS DOUBLE) / p), 6) + 0 log_odds_factor FROM s1
    UNION ALL
    SELECT CAST(2 AS BIGINT), CAST(kk AS BIGINT), p, q,
      ROUND(CAST(p AS DOUBLE) / q, 6),
      ROUND(ln(CAST(q - p AS DOUBLE) / p), 6) + 0 FROM s2
    UNION ALL
    SELECT CAST(3 AS BIGINT), CAST(kk AS BIGINT), p, q,
      ROUND(CAST(p AS DOUBLE) / q, 6),
      ROUND(ln(CAST(q - p AS DOUBLE) / p), 6) + 0 FROM s3
    ORDER BY boost_round
  """

  lazy val mlAdaboostVoteAcc: String = s"""
    $adaboostCte
    SELECT CAST(COUNT(*) AS BIGINT) n,
      CAST(SUM(CASE WHEN (vote > 0 AND y = 1) OR (vote <= 0 AND y = -1)
        THEN 1 ELSE 0 END) AS BIGINT) n_correct,
      ROUND(CAST(SUM(CASE WHEN (vote > 0 AND y = 1)
          OR (vote <= 0 AND y = -1) THEN 1 ELSE 0 END) AS DOUBLE)
        / COUNT(*), 6) accuracy
    FROM b3
  """

  lazy val tsHurstExponent: String = """
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c
      FROM orders GROUP BY 1),
    idx AS (SELECT d, c, ROW_NUMBER() OVER (ORDER BY d) - 1 i FROM daily),
    cells AS (SELECT m, i // m b, c, i,
        ROW_NUMBER() OVER (PARTITION BY m, i // m ORDER BY i) j,
        SUM(c) OVER (PARTITION BY m, i // m ORDER BY i
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum,
        COUNT(*) OVER (PARTITION BY m, i // m) cnt,
        CAST(SUM(c) OVER (PARTITION BY m, i // m) AS BIGINT) t,
        CAST(SUM(CAST(c AS DECIMAL(38,0)) * c)
          OVER (PARTITION BY m, i // m) AS DECIMAL(38,0)) ssq
      FROM idx, (VALUES (CAST(64 AS BIGINT)), (CAST(128 AS BIGINT)),
        (CAST(256 AS BIGINT)), (CAST(512 AS BIGINT))) s(m)),
    blocks AS (SELECT m, b,
        CAST(MAX(m * cum - j * t) - MIN(m * cum - j * t) AS BIGINT) rnum,
        CAST(MAX(ssq) * CAST(MAX(m) AS DECIMAL(38,0)) -
          CAST(MAX(t) AS DECIMAL(38,0)) * MAX(t) AS DECIMAL(38,0)) s2
      FROM cells WHERE cnt = m GROUP BY 1, 2),
    rs AS (SELECT m, b, CAST(ROUND(CAST(rnum AS DOUBLE) /
        sqrt(CAST(s2 AS DOUBLE)), 9) AS DECIMAL(22,9)) rs9 FROM blocks),
    persize AS (SELECT m, CAST(COUNT(*) AS BIGINT) n_blocks,
        CAST(SUM(rs9) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) avg_rs
      FROM rs GROUP BY 1),
    py AS (SELECT m, n_blocks, avg_rs,
        CAST(ROUND(log2(avg_rs), 9) AS DECIMAL(22,9)) y,
        CAST(log2(CAST(m AS DOUBLE)) AS BIGINT) x
      FROM persize),
    slope AS (SELECT ROUND(
        CAST(COUNT(*) * SUM(y * x) - SUM(x) * SUM(y) AS DOUBLE) /
        CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE), 6) hurst
      FROM py)
    SELECT m block_size, n_blocks, ROUND(avg_rs, 6) avg_rs, hurst
    FROM py, slope ORDER BY block_size
  """

  lazy val textBurrowsDelta: String = """
    WITH toks AS (SELECT source,
        unnest(regexp_extract_all(text, '[a-z0-9]+')) tok
      FROM documents),
    top20 AS (SELECT tok FROM (SELECT tok, COUNT(*) gc FROM toks
      GROUP BY 1 ORDER BY gc DESC, tok LIMIT 20)),
    totals AS (SELECT source, CAST(COUNT(*) AS BIGINT) ns
      FROM toks GROUP BY 1),
    counts AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) c
      FROM toks JOIN top20 USING (tok) GROUP BY 1, 2),
    kc AS (SELECT CAST(COUNT(*) AS BIGINT) kk FROM totals),
    grid AS (SELECT t.source, tt.tok,
        CAST(ROUND(CAST(COALESCE(c.c, 0) AS DOUBLE) / t.ns, 9)
          AS DECIMAL(12,9)) f
      FROM totals t CROSS JOIN top20 tt
      LEFT JOIN counts c ON c.source = t.source AND c.tok = tt.tok),
    g2 AS (SELECT source, tok, kk,
        CAST(f * CAST(kk AS DECIMAL(3,0)) -
          SUM(f) OVER (PARTITION BY tok) AS DECIMAL(18,9)) dev
      FROM grid, kc),
    g3 AS (SELECT source, tok, kk, dev,
        SUM(CAST(dev * dev AS DECIMAL(38,18)))
          OVER (PARTITION BY tok) ssq
      FROM g2),
    z AS (SELECT source, tok,
        CAST(ROUND(CAST(dev AS DOUBLE) * sqrt(CAST(kk AS DOUBLE)) /
          sqrt(CAST(ssq AS DOUBLE)), 9) AS DECIMAL(22,9)) z
      FROM g3)
    SELECT a.source source_a, b.source source_b,
      CAST(COUNT(*) AS BIGINT) n_tokens,
      ROUND(CAST(SUM(CAST(abs(a.z - b.z) AS DECIMAL(24,9)))
        AS DOUBLE) / COUNT(*), 6) delta
    FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2 ORDER BY source_a, source_b
  """

  lazy val tsPermutationEntropy: String = """
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c
      FROM orders GROUP BY 1),
    tri AS (SELECT c, LEAD(c, 1) OVER (ORDER BY d) b,
        LEAD(c, 2) OVER (ORDER BY d) cc FROM daily),
    codes AS (SELECT CAST(
        (CASE WHEN c < b THEN 4 ELSE 0 END) +
        (CASE WHEN b < cc THEN 2 ELSE 0 END) +
        (CASE WHEN c < cc THEN 1 ELSE 0 END) AS BIGINT) code
      FROM tri WHERE cc IS NOT NULL),
    cnts AS (SELECT code, CAST(COUNT(*) AS BIGINT) cnt
      FROM codes GROUP BY 1),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) n FROM cnts),
    wt AS (SELECT code, cnt,
        ROUND(CAST(cnt AS DOUBLE) / n, 6) freq,
        CAST(ROUND(-(CAST(cnt AS DOUBLE) / n) *
          log2(CAST(cnt AS DOUBLE) / n), 9) AS DECIMAL(20,9)) tm
      FROM cnts, tot),
    h AS (SELECT ROUND(CAST(SUM(tm) AS DOUBLE), 6) entropy_bits,
        ROUND(CAST(SUM(tm) AS DOUBLE) / log2(6.0), 6) norm_entropy
      FROM wt)
    SELECT code, cnt, freq, entropy_bits, norm_entropy
    FROM wt, h ORDER BY code
  """

  lazy val analyticAnovaF: String = """
    WITH x AS (SELECT o_orderpriority g,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) v
      FROM orders),
    per AS (SELECT g, CAST(COUNT(*) AS BIGINT) ng,
        CAST(SUM(v) AS BIGINT) sg,
        CAST(SUM(CAST(v AS DECIMAL(38,0)) * v) AS DECIMAL(38,0)) qg
      FROM x GROUP BY 1),
    per2 AS (SELECT g, ng, sg, qg,
        CAST(ROUND((CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) /
          CAST(ng AS DOUBLE), 6) AS DECIMAL(38,6)) tg
      FROM per),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) k, CAST(SUM(ng) AS BIGINT) n,
        CAST(SUM(sg) AS BIGINT) s, CAST(SUM(qg) AS DECIMAL(38,0)) q,
        CAST(SUM(tg) AS DECIMAL(38,6)) st FROM per2),
    ss AS (SELECT k, n,
        CAST(st AS DOUBLE) - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
          CAST(n AS DOUBLE) ssb,
        CAST(q AS DOUBLE) - CAST(st AS DOUBLE) ssw
      FROM tot)
    SELECT k k_groups, n n_total,
      ROUND((ssb / CAST(k - 1 AS DOUBLE)) /
        (ssw / CAST(n - k AS DOUBLE)), 6) f_stat,
      ROUND(ssb / (ssb + ssw), 6) eta_sq
    FROM ss
  """

  lazy val simBordaFusion: String = """
    WITH probe AS (SELECT embedding::DOUBLE[] pe FROM embeddings
      WHERE vec_id = 0),
    scored AS (SELECT vec_id,
        list_dot_product(embedding::DOUBLE[], pe) /
          (sqrt(list_dot_product(embedding::DOUBLE[],
            embedding::DOUBLE[])) * sqrt(list_dot_product(pe, pe))) cos,
        list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) -
          2.0 * list_dot_product(embedding::DOUBLE[], pe) +
          list_dot_product(pe, pe) dist2
      FROM embeddings, probe WHERE vec_id <> 0),
    bycos AS (SELECT vec_id, CAST(21 - r AS BIGINT) pc FROM
      (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) r
       FROM scored) WHERE r <= 20),
    byeuc AS (SELECT vec_id, CAST(21 - r AS BIGINT) pe2 FROM
      (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY dist2 ASC, vec_id) r
       FROM scored) WHERE r <= 20)
    SELECT COALESCE(a.vec_id, b.vec_id) vec_id,
      COALESCE(a.pc, 0) + COALESCE(b.pe2, 0) borda_score,
      COALESCE(a.pc, 0) cosine_points,
      COALESCE(b.pe2, 0) euclid_points
    FROM bycos a FULL OUTER JOIN byeuc b ON a.vec_id = b.vec_id
    ORDER BY borda_score DESC, vec_id LIMIT 10
  """

  lazy val mlMcnemarTest: String = """
    WITH t AS (SELECT (o_orderstatus = 'F') y,
        (month(o_orderdate) <= 6) pa,
        (CAST(o_totalprice AS DECIMAL(12,2)) > 150000) pb
      FROM orders WHERE o_orderkey < 2000),
    r AS (SELECT (pa = y) ra, (pb = y) rb FROM t),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END)
          AS BIGINT) b,
        CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END)
          AS BIGINT) c2
      FROM r)
    SELECT n, b a_only_right, c2 b_only_right,
      ROUND(CAST((b - c2) * (b - c2) AS DOUBLE) /
        CAST(b + c2 AS DOUBLE), 6) chi2,
      ROUND(CAST((abs(b - c2) - 1) * (abs(b - c2) - 1) AS DOUBLE) /
        CAST(b + c2 AS DOUBLE), 6) chi2_cc
    FROM c
  """

  lazy val analyticKendallTau: String = """
    WITH t AS (SELECT o_orderkey k,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) x,
        CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) y
      FROM orders WHERE o_orderkey < 300),
    p AS (SELECT CAST(sign(a.x - b.x) AS BIGINT) sx,
        CAST(sign(a.y - b.y) AS BIGINT) sy
      FROM t a JOIN t b ON a.k < b.k),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) n0,
        CAST(SUM(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END) AS BIGINT) cc,
        CAST(SUM(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END) AS BIGINT) dd,
        CAST(SUM(CASE WHEN sx = 0 THEN 1 ELSE 0 END) AS BIGINT) n1,
        CAST(SUM(CASE WHEN sy = 0 THEN 1 ELSE 0 END) AS BIGINT) n2
      FROM p)
    SELECT n0 n_pairs, cc concordant, dd discordant,
      n1 ties_x, n2 ties_y,
      ROUND(CAST(cc - dd AS DOUBLE) /
        sqrt(CAST((n0 - n1) * (n0 - n2) AS DOUBLE)), 6) tau_b
    FROM c
  """

  lazy val mlBootstrapCiHash: String = """
    WITH cells AS (SELECT o_orderkey k,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) v, b,
        substr(md5(o_orderkey || '_' || b), 1, 1) h
      FROM orders, range(1, 51) r(b) WHERE o_orderkey < 5000),
    w AS (SELECT b, v, CASE WHEN h <= '5' THEN 0 WHEN h <= 'b' THEN 1
        WHEN h <= 'e' THEN 2 ELSE 3 END w FROM cells),
    reps AS (SELECT b, CAST(ROUND(CAST(SUM(w * v) AS DOUBLE) /
        SUM(w), 6) AS DECIMAL(24,6)) m FROM w GROUP BY 1),
    ranked AS (SELECT b, m, ROW_NUMBER() OVER (ORDER BY m, b) r
      FROM reps),
    bounds AS (SELECT CAST(COUNT(*) AS BIGINT) n_reps,
        CAST(SUM(m) AS DECIMAL(38,6)) sm,
        SUM(CASE WHEN r = 2 THEN m END) lo,
        SUM(CASE WHEN r = 49 THEN m END) hi
      FROM ranked)
    SELECT n_reps,
      ROUND(CAST(sm AS DOUBLE) / n_reps, 6) mean_of_means,
      ROUND(CAST(lo AS DOUBLE), 6) ci_low,
      ROUND(CAST(hi AS DOUBLE), 6) ci_high
    FROM bounds
  """

  lazy val mlInteractionInfoGain: String = """
    WITH base AS (SELECT substr(o_orderpriority, 1, 1) a,
        CAST(o_custkey % 3 AS VARCHAR) bb, o_orderstatus l FROM orders),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM base),
    hl AS (SELECT CAST(SUM(tm) AS DOUBLE) hl FROM (
      SELECT CAST(ROUND(-(CAST(nc AS DOUBLE) / n) *
          log2(CAST(nc AS DOUBLE) / ng), 9) AS DECIMAL(20,9)) tm
      FROM (SELECT l, CAST(COUNT(*) AS BIGINT) nc,
          CAST(SUM(COUNT(*)) OVER () AS BIGINT) ng
        FROM base GROUP BY l), nn)),
    hla AS (SELECT CAST(SUM(tm) AS DOUBLE) hla FROM (
      SELECT CAST(ROUND(-(CAST(nc AS DOUBLE) / n) *
          log2(CAST(nc AS DOUBLE) / ng), 9) AS DECIMAL(20,9)) tm
      FROM (SELECT a, l, CAST(COUNT(*) AS BIGINT) nc,
          CAST(SUM(COUNT(*)) OVER (PARTITION BY a) AS BIGINT) ng
        FROM base GROUP BY a, l), nn)),
    hlb AS (SELECT CAST(SUM(tm) AS DOUBLE) hlb FROM (
      SELECT CAST(ROUND(-(CAST(nc AS DOUBLE) / n) *
          log2(CAST(nc AS DOUBLE) / ng), 9) AS DECIMAL(20,9)) tm
      FROM (SELECT bb, l, CAST(COUNT(*) AS BIGINT) nc,
          CAST(SUM(COUNT(*)) OVER (PARTITION BY bb) AS BIGINT) ng
        FROM base GROUP BY bb, l), nn)),
    hlab AS (SELECT CAST(SUM(tm) AS DOUBLE) hlab FROM (
      SELECT CAST(ROUND(-(CAST(nc AS DOUBLE) / n) *
          log2(CAST(nc AS DOUBLE) / ng), 9) AS DECIMAL(20,9)) tm
      FROM (SELECT a, bb, l, CAST(COUNT(*) AS BIGINT) nc,
          CAST(SUM(COUNT(*)) OVER (PARTITION BY a, bb) AS BIGINT) ng
        FROM base GROUP BY a, bb, l), nn))
    SELECT ROUND(hl, 6) h_label,
      ROUND(hl - hla, 6) ig_a,
      ROUND(hl - hlb, 6) ig_b,
      ROUND(hl - hlab, 6) ig_ab,
      ROUND((hl - hlab) - (hl - hla) - (hl - hlb), 6) synergy
    FROM hl, hla, hlb, hlab
  """

  lazy val graphBoruvkaRound: String = """
    WITH e AS (SELECT l_partkey p, l_suppkey + 10000000 s,
        CAST(MIN(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) w
      FROM lineitem GROUP BY 1, 2),
    d AS (SELECT p AS node, s AS other, w FROM e
      UNION ALL SELECT s, p, w FROM e),
    pick AS (SELECT node, other, w FROM (
        SELECT node, other, w,
          ROW_NUMBER() OVER (PARTITION BY node ORDER BY w, other) rn
        FROM d) WHERE rn = 1),
    ch AS (SELECT DISTINCT least(node, other) lo,
        greatest(node, other) hi, w FROM pick),
    c AS (SELECT CAST(COUNT(*) AS BIGINT) n_chosen,
        CAST(SUM(w) AS BIGINT) fw FROM ch),
    nn AS (SELECT CAST(COUNT(DISTINCT node) AS BIGINT) n_nodes FROM d),
    ne AS (SELECT CAST(COUNT(*) AS BIGINT) n_edges FROM e)
    SELECT n_nodes, n_edges, n_chosen n_chosen_edges,
      n_nodes - n_chosen n_components_after, fw forest_weight_cents
    FROM nn, ne, c
  """

  lazy val tsHoltWintersAdditive: String = """
    WITH RECURSIVE daily AS (SELECT CAST(o_orderdate AS DATE) d,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c
      FROM orders GROUP BY 1),
    arr AS (SELECT list(c ORDER BY d) cs, CAST(COUNT(*) AS BIGINT) n
      FROM daily),
    init AS (SELECT cs, n,
        CAST(list_sum(cs[1:7]) // 7 AS BIGINT) l,
        CAST((list_sum(cs[8:14]) - list_sum(cs[1:7])) // 49 AS BIGINT) t,
        list_transform(range(1, 8), j -> CAST(cs[j] -
          (list_sum(cs[1:7]) // 7) AS BIGINT)) s,
        CAST(7 AS BIGINT) i
      FROM arr),
    rec AS (SELECT cs, n, l, t, s, i FROM init
      UNION ALL
      SELECT cs, n,
        CAST((cs[i + 1] - s[(i % 7) + 1] + 4 * (l + t)) // 5 AS BIGINT),
        CAST(((((cs[i + 1] - s[(i % 7) + 1] + 4 * (l + t)) // 5) - l)
          + 9 * t) // 10 AS BIGINT),
        list_transform(range(1, 8), j -> CASE WHEN j = (i % 7) + 1
          THEN CAST((cs[i + 1] -
            ((cs[i + 1] - s[(i % 7) + 1] + 4 * (l + t)) // 5)
            + 4 * s[j]) // 5 AS BIGINT)
          ELSE s[j] END),
        i + 1
      FROM rec WHERE i < n),
    fin AS (SELECT * FROM rec WHERE i = n)
    SELECT CAST(h AS BIGINT) h,
      CAST(l + h * t + s[CAST(((n + h - 1) % 7) + 1 AS INTEGER)]
        AS BIGINT) forecast_cents,
      l level_cents, t trend_cents
    FROM fin, range(1, 8) r(h) ORDER BY h
  """

  lazy val tsCrostonIntermittent: String = """
    WITH grid AS (SELECT DISTINCT CAST(l_shipdate AS DATE) d
      FROM lineitem),
    demand AS (SELECT CAST(l_shipdate AS DATE) d,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) q
      FROM lineitem WHERE l_partkey = 1 GROUP BY 1),
    arr AS (SELECT list(COALESCE(q, 0) ORDER BY g.d) qs,
        CAST(COUNT(*) AS BIGINT) n
      FROM grid g LEFT JOIN demand USING (d)),
    fin AS (SELECT n, list_reduce(
        list_prepend({'z': CAST(0 AS BIGINT), 'p': CAST(0 AS BIGINT),
          'last': CAST(0 AS BIGINT), 'cnt': CAST(0 AS BIGINT)},
          list_transform(range(1, CAST(n + 1 AS INTEGER)),
            i -> {'z': CAST(i AS BIGINT), 'p': CAST(0 AS BIGINT),
              'last': CAST(0 AS BIGINT), 'cnt': CAST(0 AS BIGINT)})),
        (st, ix) -> CASE
          WHEN qs[CAST(ix.z AS INTEGER)] = 0 THEN st
          WHEN st.cnt = 0 THEN {'z': qs[CAST(ix.z AS INTEGER)] * 1000000,
            'p': ix.z * 1000000, 'last': ix.z, 'cnt': CAST(1 AS BIGINT)}
          ELSE {'z': (qs[CAST(ix.z AS INTEGER)] * 1000000 + 4 * st.z) // 5,
            'p': ((ix.z - st.last) * 1000000 + 4 * st.p) // 5,
            'last': ix.z, 'cnt': st.cnt + 1}
          END) f
      FROM arr)
    SELECT n n_days, CAST(f.cnt AS BIGINT) n_demand_days,
      CAST(f.z AS BIGINT) size_smoothed_1e6,
      CAST(f.p AS BIGINT) interval_smoothed_1e6,
      ROUND(CAST(f.z AS DOUBLE) / f.p, 6) demand_rate
    FROM fin
  """

  lazy val analyticWilcoxonSignedRank: String = """
    WITH p AS (SELECT user_id, CAST(ts AS DATE) d,
        CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT) v
      FROM events WHERE event_type = 'purchase'),
    d0 AS (SELECT MIN(d) d0 FROM p),
    halves AS (SELECT user_id,
        CAST(SUM(CASE WHEN d < d0 + 15 THEN v ELSE 0 END) AS BIGINT) pre,
        CAST(SUM(CASE WHEN d >= d0 + 15 THEN v ELSE 0 END) AS BIGINT) post,
        CAST(SUM(CASE WHEN d < d0 + 15 THEN 1 ELSE 0 END) AS BIGINT) npre,
        CAST(SUM(CASE WHEN d >= d0 + 15 THEN 1 ELSE 0 END) AS BIGINT) npost
      FROM p, d0 GROUP BY 1),
    diffs AS (SELECT user_id, post - pre diff, abs(post - pre) ad
      FROM halves WHERE npre > 0 AND npost > 0 AND post - pre <> 0),
    pos AS (SELECT user_id, diff, ad,
        ROW_NUMBER() OVER (ORDER BY ad, user_id) r FROM diffs),
    rr AS (SELECT diff,
        MIN(r) OVER (PARTITION BY ad) + MAX(r) OVER (PARTITION BY ad) rr
      FROM pos),
    agg AS (SELECT CAST(COUNT(*) AS BIGINT) m,
        CAST(SUM(CASE WHEN diff > 0 THEN rr ELSE 0 END) AS BIGINT) wp2,
        CAST(SUM(CASE WHEN diff < 0 THEN rr ELSE 0 END) AS BIGINT) wm2
      FROM rr)
    SELECT m n_pairs, wp2 w_plus_x2, wm2 w_minus_x2,
      ROUND((CAST(wp2 AS DOUBLE) / 2.0 -
        CAST(m * (m + 1) AS DOUBLE) / 4.0) /
        sqrt(CAST(m * (m + 1) * (2 * m + 1) AS DOUBLE) / 24.0), 6) z_score
    FROM agg
  """

  // Exact-GBM CTE chain shared by the two ml_gbm_* oracles: integer
  // cent residuals, truncating-division leaf means and lr=1/2 update,
  // double split scores with the same operation order as the Spark
  // side, 3 rounds unrolled.
  private val gbmCuts: Seq[(Int, String)] = Seq(
    1 -> "m <= 3", 2 -> "m <= 6", 3 -> "m <= 9",
    4 -> "p <= 2", 5 -> "p <= 3", 6 -> "c <= 3")

  private val gbmCte: String = {
    def roundCte(t: Int): String = {
      val prev = if (t == 1) "b0" else s"b${t - 1}"
      val aggs = gbmCuts.map { case (i, cond) =>
        s"""CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) nl$i,
        CAST(SUM(CASE WHEN $cond THEN r ELSE 0 END) AS BIGINT) sl$i"""
      }.mkString(",\n        ")
      val caseCut = gbmCuts.map { case (i, cond) =>
        s"WHEN $i THEN ($cond)" }.mkString(" ")
      val ids = gbmCuts.map(_._1)
      val scoreCols = ids.map { i =>
        s"""CASE WHEN nl$i = 0 OR nl$i = n THEN -1.0 ELSE
          (CAST(n AS DOUBLE) * sl$i - CAST(nl$i AS DOUBLE) * s) *
          (CAST(n AS DOUBLE) * sl$i - CAST(nl$i AS DOUBLE) * s) /
          (CAST(nl$i AS DOUBLE) * CAST(n - nl$i AS DOUBLE) *
            CAST(n AS DOUBLE)) END sc$i"""
      }.mkString(",\n        ")
      val cutChain = ids.init.map { i =>
        val beats = ids.filter(_ > i).map(j => s"sc$i >= sc$j")
          .mkString(" AND ")
        s"WHEN $beats THEN $i"
      }.mkString(" ")
      def ofCut(p: String) = ids.init.map { i =>
        s"WHEN cut = $i THEN $p$i" }.mkString(" ") +
        s" ELSE $p${ids.last}"
      s"""e$t AS (SELECT CAST(SUM(r) AS BIGINT) s,
        CAST(COUNT(*) AS BIGINT) n,
        $aggs
      FROM $prev),
    sc$t AS (SELECT *,
        $scoreCols
      FROM e$t),
    k$t AS (SELECT *, CAST(CASE $cutChain
        ELSE ${ids.last} END AS BIGINT) cut FROM sc$t),
    p$t AS (SELECT cut, n, s,
        CASE ${ofCut("nl")} END nl,
        CASE ${ofCut("sl")} END sl,
        CASE ${ofCut("sc")} END score
      FROM k$t),
    b$t AS (SELECT k, m, p, c,
        r - ((CASE WHEN (CASE cut $caseCut END)
          THEN sl // nl ELSE (s - sl) // (n - nl) END) // 2) r
      FROM $prev, p$t)"""
    }
    s"""
    WITH t AS (SELECT o_orderkey k,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) y,
      month(o_orderdate) m,
      CAST(SUBSTR(o_orderpriority, 1, 1) AS INTEGER) p,
      CAST(o_custkey % 7 AS INTEGER) c
    FROM orders WHERE o_orderkey < 2000),
    g AS (SELECT CAST(SUM(y) AS BIGINT) sy, CAST(COUNT(*) AS BIGINT) ny
      FROM t),
    b0 AS (SELECT k, m, p, c, y - (sy // ny) r FROM t, g),
    ${roundCte(1)},
    ${roundCte(2)},
    ${roundCte(3)}"""
  }

  lazy val mlGbmStumpRounds: String = s"""
    $gbmCte
    SELECT CAST(1 AS BIGINT) boost_round, cut, nl n_left,
      CAST(sl // nl AS BIGINT) pred_left_cents,
      CAST((s - sl) // (n - nl) AS BIGINT) pred_right_cents,
      ROUND(score / 1e12, 6) score_e12 FROM p1
    UNION ALL
    SELECT CAST(2 AS BIGINT), cut, nl, CAST(sl // nl AS BIGINT),
      CAST((s - sl) // (n - nl) AS BIGINT),
      ROUND(score / 1e12, 6) FROM p2
    UNION ALL
    SELECT CAST(3 AS BIGINT), cut, nl, CAST(sl // nl AS BIGINT),
      CAST((s - sl) // (n - nl) AS BIGINT),
      ROUND(score / 1e12, 6) FROM p3
    ORDER BY boost_round
  """

  lazy val mlGbmResidualMse: String = s"""
    $gbmCte,
    s0 AS (SELECT CAST(SUM(CAST(r AS DECIMAL(38,0)) * r)
        AS DECIMAL(38,0)) sse0, CAST(COUNT(*) AS BIGINT) n FROM b0),
    s3 AS (SELECT CAST(SUM(CAST(r AS DECIMAL(38,0)) * r)
        AS DECIMAL(38,0)) sse3 FROM b3)
    SELECT n,
      ROUND(sqrt(CAST(sse0 AS DOUBLE) / n), 2) rmse0_cents,
      ROUND(sqrt(CAST(sse3 AS DOUBLE) / n), 2) rmse3_cents,
      ROUND(CAST(sse3 AS DOUBLE) / CAST(sse0 AS DOUBLE), 6) sse_ratio
    FROM s0, s3
  """

  lazy val analyticCaptureRecapture: String = """
    WITH e AS (SELECT user_id, CAST(ts AS DATE) d FROM events),
    d0 AS (SELECT MIN(d) d0 FROM e),
    caps AS (SELECT user_id,
        CAST(MAX(CASE WHEN d < d0 + 15 THEN 1 ELSE 0 END) AS BIGINT) w1,
        CAST(MAX(CASE WHEN d >= d0 + 15 THEN 1 ELSE 0 END) AS BIGINT) w2
      FROM e, d0 GROUP BY 1),
    c AS (SELECT CAST(SUM(w1) AS BIGINT) n1, CAST(SUM(w2) AS BIGINT) n2,
        CAST(SUM(w1 * w2) AS BIGINT) m,
        CAST(COUNT(*) AS BIGINT) observed FROM caps)
    SELECT n1, n2, m recaptured, observed,
      ROUND(CAST(n1 AS DOUBLE) * n2 / m, 2) lincoln_petersen,
      CAST((n1 + 1) * (n2 + 1) // (m + 1) - 1 AS BIGINT) chapman,
      ROUND(CAST(observed AS DOUBLE) /
        ((CAST(n1 AS DOUBLE) * n2) / m), 6) coverage
    FROM c
  """

  lazy val pipelineCandidateKeyProfile: String = """
    WITH c AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) d1,
        CAST(COUNT(DISTINCT o_custkey) AS BIGINT) d2,
        CAST(COUNT(DISTINCT (o_custkey, o_orderdate)) AS BIGINT) d3,
        CAST(COUNT(DISTINCT (o_orderdate, o_orderpriority,
          o_orderstatus)) AS BIGINT) d4
      FROM orders)
    SELECT 'o_orderkey' candidate_key, n, d1 n_distinct,
      CAST(CASE WHEN d1 = n THEN 1 ELSE 0 END AS BIGINT) is_unique,
      ROUND(1.0 - CAST(d1 AS DOUBLE) / n, 6) dup_ratio FROM c
    UNION ALL
    SELECT 'o_custkey', n, d2,
      CAST(CASE WHEN d2 = n THEN 1 ELSE 0 END AS BIGINT),
      ROUND(1.0 - CAST(d2 AS DOUBLE) / n, 6) FROM c
    UNION ALL
    SELECT 'o_custkey,o_orderdate', n, d3,
      CAST(CASE WHEN d3 = n THEN 1 ELSE 0 END AS BIGINT),
      ROUND(1.0 - CAST(d3 AS DOUBLE) / n, 6) FROM c
    UNION ALL
    SELECT 'o_orderdate,o_orderpriority,o_orderstatus', n, d4,
      CAST(CASE WHEN d4 = n THEN 1 ELSE 0 END AS BIGINT),
      ROUND(1.0 - CAST(d4 AS DOUBLE) / n, 6) FROM c
    ORDER BY candidate_key
  """

  lazy val analyticSprtConversion: String = """
    WITH daily AS (SELECT CAST(ts AS DATE) d,
        CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) x
      FROM events GROUP BY 1),
    terms AS (SELECT d, n, x,
        CAST(ROUND(CAST(x AS DOUBLE) * ln(0.25 / 0.15) +
          CAST(n - x AS DOUBLE) * ln(0.75 / 0.85), 9)
          AS DECIMAL(24,9)) tm
      FROM daily),
    walk AS (SELECT d, n, x, SUM(tm) OVER (ORDER BY d
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) llr
      FROM terms)
    SELECT d, n, x, ROUND(CAST(llr AS DOUBLE), 6) llr,
      CASE WHEN CAST(llr AS DOUBLE) >= ln(19.0) THEN 'accept_h1'
        WHEN CAST(llr AS DOUBLE) <= -ln(19.0) THEN 'accept_h0'
        ELSE 'continue' END decision
    FROM walk ORDER BY d
  """

  lazy val analyticRecencyDecayScore: String = """
    WITH e AS (SELECT user_id, CAST(ts AS DATE) d,
        CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT) v
      FROM events),
    mx AS (SELECT MAX(d) dmax FROM e),
    scored AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) n_events,
        SUM(CAST(ROUND(CAST(v AS DOUBLE) *
          exp((-(CAST(dmax - d AS DOUBLE) * ln(2.0))) / 7.0), 6)
          AS DECIMAL(28,6))) s
      FROM e, mx GROUP BY 1),
    ranked AS (SELECT user_id, n_events, s,
        ROW_NUMBER() OVER (ORDER BY s DESC, user_id) rk
      FROM scored)
    SELECT CAST(rk AS BIGINT) rank, user_id, n_events,
      ROUND(CAST(s AS DOUBLE), 2) decay_score_cents
    FROM ranked WHERE rk <= 20 ORDER BY rank
  """

  lazy val graphPseudoDiameter: String = s"""
    WITH RECURSIVE $thinnedGraphCte,
    adj AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    seed AS (SELECT min(node) s FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und)),
    bfs1(node, d) AS (
      SELECT s, 0 FROM seed
      UNION ALL
      SELECT adj.b, bfs1.d + 1 FROM bfs1 JOIN adj ON adj.a = bfs1.node
      WHERE bfs1.d < 4),
    d1 AS (SELECT node, CAST(MIN(d) AS BIGINT) dist FROM bfs1 GROUP BY 1),
    far AS (SELECT node, dist ecc1 FROM d1
      ORDER BY dist DESC, node LIMIT 1),
    bfs2(node, d) AS (
      SELECT node, 0 FROM far
      UNION ALL
      SELECT adj.b, bfs2.d + 1 FROM bfs2 JOIN adj ON adj.a = bfs2.node
      WHERE bfs2.d < 4),
    d2 AS (SELECT node, CAST(MIN(d) AS BIGINT) dist FROM bfs2 GROUP BY 1),
    fin AS (SELECT node end_node, dist pseudo_diameter FROM d2
      ORDER BY dist DESC, node LIMIT 1),
    reach AS (SELECT CAST(COUNT(*) AS BIGINT) n_reached FROM d2)
    SELECT seed.s start_node, far.node far_node,
      CAST(far.ecc1 AS BIGINT) sweep1_ecc, fin.end_node,
      CAST(fin.pseudo_diameter AS BIGINT) pseudo_diameter, n_reached
    FROM seed, far, fin, reach
  """

  lazy val tsRollingPercentileBands: String = """
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c
      FROM orders GROUP BY 1),
    wins AS (SELECT d, c, list_sort(list(c) OVER (ORDER BY d
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) win
      FROM daily)
    SELECT d, c day_cents,
      win[1] p10_cents, win[4] p50_cents, win[7] p90_cents,
      CAST(CASE WHEN c = win[7] OR c = win[1] THEN 1 ELSE 0 END
        AS BIGINT) at_band_edge
    FROM wins WHERE len(win) = 7 ORDER BY d
  """

  lazy val pipelineFfdBinPacking: String = """
    WITH items AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(SUM(len(props) + 64) AS BIGINT) w
      FROM events GROUP BY 1, 2),
    arr AS (SELECT list(w ORDER BY w DESC) ws FROM items),
    packed AS (SELECT ws,
        list_reduce(
          list_prepend(CAST([] AS BIGINT[]),
            list_transform(ws, w -> [w])),
          (bins, x) -> CASE
            WHEN len(list_filter(range(1, len(bins) + 1),
                j -> bins[j] + x[1] <= 262144)) > 0
            THEN list_transform(range(1, len(bins) + 1), j ->
              CASE WHEN j = list_filter(range(1, len(bins) + 1),
                  jj -> bins[jj] + x[1] <= 262144)[1]
                THEN bins[j] + x[1] ELSE bins[j] END)
            ELSE list_append(bins, x[1]) END) bins
      FROM arr)
    SELECT CAST(len(ws) AS BIGINT) n_items,
      CAST(list_sum(ws) AS BIGINT) total_bytes,
      CAST(len(bins) AS BIGINT) n_bins,
      CAST(list_max(bins) AS BIGINT) max_bin_bytes,
      CAST((list_sum(ws) + 262143) // 262144 AS BIGINT) lower_bound_bins,
      ROUND(CAST(list_sum(ws) AS DOUBLE) /
        (CAST(len(bins) AS DOUBLE) * 262144), 6) avg_fill
    FROM packed
  """

  lazy val analyticTopShareConcentration: String = """
    WITH o AS (SELECT
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) c,
        ROW_NUMBER() OVER (ORDER BY
          CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
          DESC, o_orderkey) rn
      FROM orders),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(c) AS BIGINT) t
      FROM o),
    s AS (SELECT MAX(n) n, MAX(t) total_cents,
        CAST(SUM(CASE WHEN rn <= greatest(1, n // 100) THEN c ELSE 0
          END) AS BIGINT) s1,
        CAST(SUM(CASE WHEN rn <= greatest(1, n // 20) THEN c ELSE 0
          END) AS BIGINT) s5,
        CAST(SUM(CASE WHEN rn <= greatest(1, n // 10) THEN c ELSE 0
          END) AS BIGINT) s10
      FROM o, tot)
    SELECT n, total_cents,
      ROUND(CAST(s1 AS DOUBLE) / total_cents, 6) top1_share,
      ROUND(CAST(s5 AS DOUBLE) / total_cents, 6) top5_share,
      ROUND(CAST(s10 AS DOUBLE) / total_cents, 6) top10_share
    FROM s
  """

  lazy val tsSeasonalMannKendall: String = """
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c
      FROM orders GROUP BY 1),
    sd AS (SELECT d, c,
        (d - DATE '1970-01-01') % 7 season FROM daily),
    pairs AS (SELECT a.season, CAST(sign(b.c - a.c) AS BIGINT) sg
      FROM sd a JOIN sd b ON a.season = b.season AND a.d < b.d),
    per AS (SELECT season, CAST(SUM(sg) AS BIGINT) sw
      FROM pairs GROUP BY 1),
    cnt AS (SELECT season, CAST(COUNT(*) AS BIGINT) nw
      FROM sd GROUP BY 1),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) n_seasons,
        CAST(SUM(sw) AS BIGINT) s_total,
        CAST(SUM(nw * (nw - 1) * (2 * nw + 5)) AS BIGINT) var18
      FROM per JOIN cnt USING (season))
    SELECT n_seasons, s_total, var18 var_num_x18,
      ROUND((CAST(s_total AS DOUBLE) -
        sign(CAST(s_total AS DOUBLE))) /
        sqrt(CAST(var18 AS DOUBLE) / 18.0), 6) z_score
    FROM tot
  """

  lazy val fnNameSimilarityProfile: String = """
    WITH p AS (SELECT p_partkey k, p_name nm FROM part
      WHERE p_partkey < 40),
    pairs AS (SELECT x.k key_a, x.nm name_a, y.nm name_b
      FROM p x JOIN p y ON y.k = x.k + 1)
    SELECT key_a, name_a, name_b,
      CAST(levenshtein(name_a, name_b) AS BIGINT) lev_dist,
      ROUND(CAST(len(list_intersect(
          list_distinct(string_split(name_a, '')),
          list_distinct(string_split(name_b, '')))) AS DOUBLE) /
        len(list_distinct(list_concat(
          list_distinct(string_split(name_a, '')),
          list_distinct(string_split(name_b, ''))))), 6) char_jaccard,
      CAST(len(list_filter(
          range(1, least(len(name_a), len(name_b)) + 1),
          i -> name_a[1:i] = name_b[1:i])) AS BIGINT) lcp_len
    FROM pairs ORDER BY key_a
  """

  lazy val pipelineSloBurnAlert: String = """
    WITH hourly AS (SELECT date_trunc('hour', ts) h,
        CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
          AS BIGINT) e
      FROM events GROUP BY 1),
    win AS (SELECT h, n, e,
        SUM(n) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING AND
          CURRENT ROW) n6,
        SUM(e) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING AND
          CURRENT ROW) e6,
        COUNT(*) OVER (ORDER BY h ROWS BETWEEN 5 PRECEDING AND
          CURRENT ROW) nw
      FROM hourly)
    SELECT h, n, e,
      ROUND(CAST(e AS DOUBLE) * 4.0 / n, 4) burn_1h,
      ROUND(CAST(e6 AS DOUBLE) * 4.0 / n6, 4) burn_6h,
      CAST(CASE WHEN CAST(e AS DOUBLE) * 4.0 / n > 1.0
        AND CAST(e6 AS DOUBLE) * 4.0 / n6 > 1.0
        THEN 1 ELSE 0 END AS BIGINT) page
    FROM win WHERE nw = 6 ORDER BY h
  """

  lazy val fnHumanizeBytes: String = """
    WITH t AS (SELECT event_type,
        CAST(SUM(len(props) + 64) AS BIGINT) b
      FROM events GROUP BY 1),
    k AS (SELECT event_type, b,
        CASE WHEN b >= 1073741824 THEN 3 WHEN b >= 1048576 THEN 2
          WHEN b >= 1024 THEN 1 ELSE 0 END k
      FROM t),
    s AS (SELECT event_type, b,
        CAST(b * 10 // (CASE k WHEN 0 THEN 1 WHEN 1 THEN 1024
          WHEN 2 THEN 1048576 ELSE 1073741824 END) AS BIGINT) s10, k
      FROM k)
    SELECT event_type, b bytes,
      CAST(s10 // 10 AS VARCHAR) || '.' ||
        CAST(s10 % 10 AS VARCHAR) || ' ' ||
        (['B','KiB','MiB','GiB'])[k + 1] human
    FROM s ORDER BY event_type
  """

  lazy val simSphericalAssignRound: String = """
    WITH seeds AS (SELECT vec_id seed_id, embedding::DOUBLE[] se
      FROM embeddings WHERE vec_id <= 4),
    scored AS (SELECT e.vec_id, s.seed_id,
        list_dot_product(e.embedding::DOUBLE[], s.se) /
          (sqrt(list_dot_product(e.embedding::DOUBLE[],
            e.embedding::DOUBLE[])) * sqrt(list_dot_product(s.se, s.se)))
          cos
      FROM embeddings e, seeds s WHERE e.vec_id > 4),
    assigned AS (SELECT vec_id, seed_id, cos FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY cos DESC, seed_id) rn FROM scored) WHERE rn = 1)
    SELECT seed_id, CAST(COUNT(*) AS BIGINT) n_assigned,
      ROUND(CAST(SUM(CAST(ROUND(cos, 9) AS DECIMAL(20,9))) AS DOUBLE)
        / COUNT(*), 6) avg_cos,
      ROUND(MIN(cos), 6) min_cos,
      ROUND(MAX(cos), 6) max_cos
    FROM assigned GROUP BY 1 ORDER BY seed_id
  """

  lazy val mlUpliftTwoModel: String = """
    WITH o AS (SELECT SUBSTR(o_orderpriority, 1, 1) segment,
        CASE WHEN substr(md5(CAST(o_custkey AS VARCHAR)), 1, 1) <= '7'
          THEN 1 ELSE 0 END trt,
        CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END y
      FROM orders),
    g AS (SELECT segment,
        CAST(SUM(CASE WHEN trt = 1 THEN 1 ELSE 0 END) AS BIGINT) n_t,
        CAST(SUM(CASE WHEN trt = 1 THEN y ELSE 0 END) AS BIGINT) y_t,
        CAST(SUM(CASE WHEN trt = 0 THEN 1 ELSE 0 END) AS BIGINT) n_c,
        CAST(SUM(CASE WHEN trt = 0 THEN y ELSE 0 END) AS BIGINT) y_c
      FROM o GROUP BY 1)
    SELECT segment, n_t, y_t, n_c, y_c,
      ROUND(CAST(y_t AS DOUBLE) / n_t, 6) rate_treat,
      ROUND(CAST(y_c AS DOUBLE) / n_c, 6) rate_control,
      ROUND(CAST(y_t AS DOUBLE) / n_t -
        CAST(y_c AS DOUBLE) / n_c, 6) uplift
    FROM g ORDER BY segment
  """

  lazy val analyticLorenzAsymmetry: String = """
    WITH o AS (SELECT
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) c
      FROM orders),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) n, CAST(SUM(c) AS BIGINT) t
      FROM o),
    agg AS (SELECT MAX(n) n, MAX(t) total_cents,
        CAST(SUM(CASE WHEN c * n < t THEN 1 ELSE 0 END) AS BIGINT) m,
        CAST(SUM(CASE WHEN c * n < t THEN c ELSE 0 END) AS BIGINT) sb
      FROM o, tot)
    SELECT n, total_cents, m n_below_mean,
      ROUND(CAST(m AS DOUBLE) / n, 6) f_mu,
      ROUND(CAST(sb AS DOUBLE) / total_cents, 6) l_mu,
      ROUND(CAST(m AS DOUBLE) / n +
        CAST(sb AS DOUBLE) / total_cents, 6) asymmetry_s
    FROM agg
  """

  lazy val graphRichClub: String = s"""
    WITH $thinnedGraphCte,
    deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) dg FROM (
        SELECT u AS node FROM und UNION ALL SELECT v FROM und)
      GROUP BY 1),
    ks AS (SELECT CAST(k AS BIGINT) k FROM (VALUES (2), (4), (8),
      (16)) t(k)),
    nodesk AS (SELECT k, CAST(COUNT(*) AS BIGINT) n_k
      FROM deg, ks WHERE dg > k GROUP BY 1),
    edgesk AS (SELECT k, CAST(COUNT(*) AS BIGINT) e_k
      FROM und JOIN deg du ON und.u = du.node
        JOIN deg dv ON und.v = dv.node, ks
      WHERE du.dg > k AND dv.dg > k GROUP BY 1)
    SELECT k, n_k, COALESCE(e_k, 0) e_k,
      CASE WHEN n_k < 2 THEN 0.0 ELSE
        ROUND(2.0 * COALESCE(e_k, 0) /
          CAST(n_k * (n_k - 1) AS DOUBLE), 6) END phi
    FROM nodesk LEFT JOIN edgesk USING (k) ORDER BY k
  """

  lazy val mlConformalInterval: String = """
    WITH o AS (SELECT SUBSTR(o_orderpriority, 1, 1) segment,
        o_orderkey k,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) y,
        CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) <= '7'
          THEN 1 ELSE 0 END cal
      FROM orders),
    means AS (SELECT segment, CAST(COUNT(*) AS BIGINT) n_cal,
        CAST(SUM(y) // COUNT(*) AS BIGINT) mean_cents
      FROM o WHERE cal = 1 GROUP BY 1),
    wr AS (SELECT o.segment, o.k, o.cal, abs(o.y - m.mean_cents) r,
        m.n_cal, m.mean_cents
      FROM o JOIN means m ON o.segment = m.segment),
    ranked AS (SELECT segment, r, n_cal,
        ROW_NUMBER() OVER (PARTITION BY segment ORDER BY r, k) rn,
        (9 * n_cal + 9) // 10 kq
      FROM wr WHERE cal = 1),
    q90 AS (SELECT segment, CAST(r AS BIGINT) q90_resid FROM ranked
      WHERE rn = kq),
    test AS (SELECT wr.segment, CAST(COUNT(*) AS BIGINT) n_test,
        CAST(SUM(CASE WHEN wr.r <= q.q90_resid THEN 1 ELSE 0 END)
          AS BIGINT) covered
      FROM wr JOIN q90 q ON wr.segment = q.segment
      WHERE wr.cal = 0 GROUP BY 1)
    SELECT m.segment, m.n_cal, t.n_test, m.mean_cents, q.q90_resid,
      ROUND(CAST(t.covered AS DOUBLE) / t.n_test, 6) coverage
    FROM means m JOIN q90 q ON m.segment = q.segment
      JOIN test t ON m.segment = t.segment
    ORDER BY m.segment
  """

  lazy val textMattrDiversity: String = """
    WITH t AS (SELECT doc_id, string_split(text, ' ')[1:200] tk
      FROM documents WHERE doc_id < 100),
    n AS (SELECT doc_id, tk, CAST(len(tk) AS BIGINT) n FROM t
      WHERE len(tk) >= 50),
    s AS (SELECT doc_id, n,
        CAST(list_sum(list_transform(range(1, CAST(n - 48 AS INTEGER)),
          i -> len(list_distinct(tk[i:i+49])))) AS BIGINT) sd
      FROM n)
    SELECT doc_id, n n_tokens, n - 49 n_windows,
      ROUND(CAST(sd AS DOUBLE) /
        (CAST(n - 49 AS DOUBLE) * 50.0), 6) mattr
    FROM s ORDER BY doc_id
  """

  lazy val multimodalTileEntropy: String = """
    WITH tiles AS (SELECT doc_id, ti,
        substr(text, (ti - 1) * 64 + 1, 64) tile
      FROM documents,
        LATERAL unnest(range(1, CAST(least(8, len(text) // 64) + 1
          AS INTEGER))) t(ti)
      WHERE doc_id < 100 AND len(text) >= 64),
    chars AS (SELECT doc_id, ti, ch, CAST(COUNT(*) AS BIGINT) c
      FROM (SELECT doc_id, ti, unnest(string_split(tile, '')) ch
        FROM tiles) GROUP BY 1, 2, 3),
    pertile AS (SELECT doc_id, ti,
        CAST(ROUND(CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / 64.0) *
          log2(CAST(c AS DOUBLE) / 64.0), 9) AS DECIMAL(20,9)))
          AS DOUBLE), 9) AS DECIMAL(20,9)) h9
      FROM chars GROUP BY 1, 2)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_tiles,
      ROUND(CAST(SUM(h9) AS DOUBLE) / COUNT(*), 6) avg_entropy,
      ROUND(CAST(MAX(h9) AS DOUBLE), 6) max_entropy
    FROM pertile GROUP BY 1 ORDER BY doc_id
  """

  lazy val tsRecordBreaks: String = """
    WITH daily AS (SELECT CAST(o_orderdate AS DATE) d,
        CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c
      FROM orders GROUP BY 1),
    r AS (SELECT d, c,
        MAX(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
          AND 1 PRECEDING) pmax,
        MIN(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
          AND 1 PRECEDING) pmin,
        ROW_NUMBER() OVER (ORDER BY d) i
      FROM daily),
    counts AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(CASE WHEN pmax IS NULL OR c > pmax THEN 1 ELSE 0 END)
          AS BIGINT) highs,
        CAST(SUM(CASE WHEN pmin IS NULL OR c < pmin THEN 1 ELSE 0 END)
          AS BIGINT) lows
      FROM r),
    harm AS (SELECT SUM(CAST(ROUND(CAST(1 AS DOUBLE) / i, 12)
        AS DECIMAL(20,12))) hn
      FROM r)
    SELECT n n_days, highs record_highs, lows record_lows,
      ROUND(CAST(hn AS DOUBLE), 6) expected_iid,
      ROUND(CAST(highs AS DOUBLE) / CAST(hn AS DOUBLE), 6) high_ratio,
      ROUND(CAST(lows AS DOUBLE) / CAST(hn AS DOUBLE), 6) low_ratio
    FROM counts, harm
  """

  lazy val analyticGiniDecomposition: String = """
    WITH o AS (SELECT SUBSTR(o_orderpriority, 1, 1) g,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) c,
        o_orderkey k
      FROM orders),
    ranked AS (SELECT g, c,
        ROW_NUMBER() OVER (PARTITION BY g ORDER BY c, k) i FROM o),
    per AS (SELECT g, CAST(COUNT(*) AS BIGINT) ng,
        CAST(SUM(c) AS BIGINT) sg,
        CAST(SUM(CAST(i * 2 AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) iw2
      FROM ranked GROUP BY 1),
    per2 AS (SELECT g, ng, sg,
        CAST(iw2 - CAST(ng + 1 AS DECIMAL(38,0)) * sg
          AS DECIMAL(38,0)) gnum
      FROM per),
    tot AS (SELECT CAST(SUM(ng) AS BIGINT) n, CAST(SUM(sg) AS BIGINT) t
      FROM per2),
    g0 AS (SELECT
        CAST(iw2 - CAST(n + 1 AS DECIMAL(38,0)) * t AS DOUBLE) /
          (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)) gini, n, t
      FROM (SELECT CAST(SUM(CAST(i * 2 AS DECIMAL(38,0)) * c)
          AS DECIMAL(38,0)) iw2, MAX(n) n, MAX(t) t
        FROM (SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) i FROM o),
          tot)),
    pairs AS (SELECT CAST(SUM(CAST(abs(a.sg * b.ng - b.sg * a.ng)
          AS DECIMAL(38,0))) AS DECIMAL(38,0)) bnum
      FROM per2 a JOIN per2 b ON a.g < b.g),
    wn AS (SELECT CAST(SUM(gnum) AS DECIMAL(38,0)) wnum FROM per2)
    SELECT ROUND(gini, 6) gini_total,
      ROUND(CAST(bnum AS DOUBLE) /
        (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6) gini_between,
      ROUND(CAST(wnum AS DOUBLE) /
        (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)), 6) gini_within,
      ROUND(gini -
        CAST(bnum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)) -
        CAST(wnum AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(t AS DOUBLE)),
        6) overlap_residual
    FROM g0, pairs, wn
  """

  lazy val aggTukeySummary: String = """
    WITH o AS (SELECT
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) c,
        o_orderkey k
      FROM orders),
    r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) i FROM o),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM o),
    q AS (SELECT MAX(n) n,
        CAST(SUM(CASE WHEN i = (n + 3) // 4 THEN c END) AS BIGINT) q1,
        CAST(SUM(CASE WHEN i = (n + 1) // 2 THEN c END) AS BIGINT) q2,
        CAST(SUM(CASE WHEN i = (3 * n + 3) // 4 THEN c END)
          AS BIGINT) q3
      FROM r, nn),
    fenced AS (SELECT CAST(SUM(CASE WHEN o.c * 2 > q.q3 * 5 - q.q1 * 3
          THEN 1 ELSE 0 END) AS BIGINT) n_high_outliers
      FROM o, q)
    SELECT n, q1 q1_cents, q2 median_cents, q3 q3_cents,
      q1 + q3 midhinge_x2_cents,
      q1 + q2 * 2 + q3 trimean_x4_cents,
      q3 - q1 iqr_cents, n_high_outliers
    FROM q, fenced
  """

  lazy val fnOrdinalSuffix: String = """
    SELECT o_orderkey k, CAST(o_orderkey AS VARCHAR) || CASE
        WHEN o_orderkey % 100 IN (11, 12, 13) THEN 'th'
        WHEN o_orderkey % 10 = 1 THEN 'st'
        WHEN o_orderkey % 10 = 2 THEN 'nd'
        WHEN o_orderkey % 10 = 3 THEN 'rd'
        ELSE 'th' END ordinal
    FROM orders WHERE o_orderkey <= 40 AND o_orderkey >= 1
    ORDER BY k
  """

  lazy val analyticCvByType: String = """
    WITH g AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS BIGINT) s,
        CAST(SUM(CAST(CAST(CAST("value" AS DECIMAL(12,2)) * 100
          AS BIGINT) AS DECIMAL(38,0)) *
          CAST(CAST("value" AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS DECIMAL(38,0)) q
      FROM events GROUP BY 1)
    SELECT event_type, n, CAST(s // n AS BIGINT) mean_cents,
      ROUND(sqrt((CAST(n AS DOUBLE) * CAST(q AS DOUBLE) -
        CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) /
        (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)), 6) cv
    FROM g ORDER BY event_type
  """

  lazy val fnBaseConv: String = """
    SELECT o_orderkey,
      hex(o_orderkey) hex_key,
      bin(o_orderkey) bin_key,
      to_base(o_orderkey, 7) base7_key,
      to_base(o_orderkey, 8) oct_key
    FROM orders WHERE o_orderkey <= 40 ORDER BY o_orderkey
  """

  val fnStringPaddingTranslate: String = """
    SELECT o_orderkey,
      lpad(CAST(o_orderkey AS VARCHAR), 10, '0') padded_key,
      translate(o_orderpriority, '12345', '#####') masked_priority,
      concat('*', substr(o_orderstatus, 2, 100)) masked_status,
      concat(o_orderstatus, '|', repeat('-', 5)) ruled
    FROM orders WHERE o_orderkey <= 30 ORDER BY o_orderkey
  """

  val aggBitXorParity: String = """
    WITH b AS (SELECT o_orderpriority priority,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders)
    SELECT priority, CAST(COUNT(*) AS BIGINT) n,
      CAST(bit_xor(cents) AS BIGINT) xor_cents,
      COUNT(*) % 2 = 0 even_count,
      CAST(bit_and(cents) AS BIGINT) and_cents,
      CAST(bit_or(cents) AS BIGINT) or_cents
    FROM b GROUP BY 1 ORDER BY 1
  """

  val aggMultiMode: String = """
    WITH counts AS (SELECT o_orderpriority priority,
        CAST(l_quantity AS INTEGER) q, CAST(COUNT(*) AS BIGINT) c
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    mx AS (SELECT priority p2, MAX(c) mc FROM counts GROUP BY 1)
    SELECT priority, CAST(MAX(mc) AS BIGINT) mode_count,
      array_to_string(list_sort(list(q)), ',') modes,
      CAST(COUNT(*) AS BIGINT) n_modes
    FROM counts JOIN mx ON priority = p2 AND c = mc
    GROUP BY 1 ORDER BY 1
  """

  val analyticSrmCheck: String = """
    WITH g AS (SELECT CAST(user_id % 2 AS INTEGER) arm,
        CAST(COUNT(*) AS BIGINT) n
      FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1),
    t AS (SELECT CAST(SUM(n) AS BIGINT) tn FROM g),
    terms AS (SELECT arm, n,
        ROUND(CAST(tn AS DOUBLE) / 2.0, 1) expected,
        ROUND((n - CAST(tn AS DOUBLE) / 2.0) *
          (n - CAST(tn AS DOUBLE) / 2.0) /
          (CAST(tn AS DOUBLE) / 2.0), 6) chi2_term
      FROM g, t),
    tot AS (SELECT ROUND(SUM(chi2_term), 6) chi2_total FROM terms)
    SELECT arm, n, expected, chi2_term, chi2_total,
      chi2_total > 3.841 srm_flag
    FROM terms, tot ORDER BY arm
  """

  val winRollingSlope: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, d, c,
        CAST(date_diff('day', DATE '1995-01-01', d) AS BIGINT) x
      FROM daily),
    w AS (SELECT event_type, d, c,
        COUNT(*) OVER fr nw, SUM(x) OVER fr sx, SUM(c) OVER fr sy,
        SUM(x * c) OVER fr sxy, SUM(x * x) OVER fr sxx
      FROM b WINDOW fr AS (PARTITION BY event_type ORDER BY x
        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
    SELECT event_type, d, c,
      ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) /
          CAST(nw AS DOUBLE)) /
        (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
          CAST(nw AS DOUBLE)), 6) slope14
    FROM w WHERE nw = 14 ORDER BY event_type, d
  """

  val pipelineLdpRandomizedResponse: String = """
    WITH g AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
          AS BIGINT) true_count,
        CAST(SUM(CASE WHEN
            CASE WHEN (c_custkey * 2654435761) % 100 < 75
              THEN c_mktsegment = 'BUILDING'
              ELSE (c_custkey * 40503) % 100 < 50 END
          THEN 1 ELSE 0 END) AS BIGINT) reported_count
      FROM customer)
    SELECT n, true_count, reported_count,
      ROUND(CAST(reported_count AS DOUBLE) / CAST(n AS DOUBLE), 6)
        reported_rate,
      ROUND((CAST(reported_count AS DOUBLE) / CAST(n AS DOUBLE) - 0.125) /
        0.75, 6) debiased_rate,
      ROUND(CAST(true_count AS DOUBLE) / CAST(n AS DOUBLE), 6) true_rate,
      ROUND(abs((CAST(reported_count AS DOUBLE) / CAST(n AS DOUBLE) - 0.125)
        / 0.75 - CAST(true_count AS DOUBLE) / CAST(n AS DOUBLE)), 6) abs_err
    FROM g
  """

  val filterPushdownIn: String = {
    val keys = (1 to 40).map(i => (i * 37L) % 1500).mkString(", ")
    s"""
    SELECT CAST(COUNT(*) AS BIGINT) n,
      CAST(COUNT(DISTINCT o_custkey) AS BIGINT) n_keys_hit,
      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) sum_cents
    FROM orders WHERE o_custkey IN ($keys)
  """
  }

  val textStyleSimilarity: String = {
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "that")
    val vec = stop.map(s =>
      s"CAST(SUM(CASE WHEN w = '$s' THEN 1 ELSE 0 END) AS BIGINT)")
      .mkString("[", ", ", "]")
    s"""
    WITH toks AS (SELECT source, unnest(string_split(text, ' ')) w
      FROM documents),
    prof AS (SELECT source, CAST(COUNT(*) AS BIGINT) n_tokens,
        $vec v
      FROM toks GROUP BY 1),
    pairs AS (SELECT a.source src, b.source neighbor,
        ROUND(CAST(list_sum(list_transform(range(1, 9),
            i -> a.v[i] * b.v[i])) AS DOUBLE) /
          (sqrt(CAST(list_sum(list_transform(range(1, 9),
            i -> a.v[i] * a.v[i])) AS DOUBLE)) *
           sqrt(CAST(list_sum(list_transform(range(1, 9),
            i -> b.v[i] * b.v[i])) AS DOUBLE))), 6) style_cos
      FROM prof a JOIN prof b ON a.source <> b.source)
    SELECT src AS source, neighbor, style_cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY src
        ORDER BY style_cos DESC, neighbor) rn FROM pairs)
    WHERE rn = 1 ORDER BY source
  """
  }

  val pipelineChecksumChain: String = """
    WITH base AS (SELECT event_id,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) cents FROM events),
    agg AS (SELECT CAST(event_id % 3 AS INTEGER) batch_id,
        CAST(COUNT(*) AS BIGINT) n_rows, CAST(SUM(cents) AS BIGINT) sum_cents,
        CAST(SUM((event_id * 31 + cents) % 1000000007) AS BIGINT) rhs
      FROM base GROUP BY 1),
    b AS (SELECT
        MAX(CASE WHEN batch_id = 0 THEN n_rows END) n0,
        MAX(CASE WHEN batch_id = 0 THEN sum_cents END) s0,
        MAX(CASE WHEN batch_id = 0 THEN rhs END) r0,
        MAX(CASE WHEN batch_id = 1 THEN n_rows END) n1,
        MAX(CASE WHEN batch_id = 1 THEN sum_cents END) s1,
        MAX(CASE WHEN batch_id = 1 THEN rhs END) r1,
        MAX(CASE WHEN batch_id = 2 THEN n_rows END) n2,
        MAX(CASE WHEN batch_id = 2 THEN sum_cents END) s2,
        MAX(CASE WHEN batch_id = 2 THEN rhs END) r2
      FROM agg),
    c0 AS (SELECT *, md5(concat_ws(':', 'genesis', n0, r0)) h0 FROM b),
    c1 AS (SELECT *, md5(concat_ws(':', h0, n1, r1)) h1 FROM c0),
    c2 AS (SELECT *, md5(concat_ws(':', h1, n2, r2)) h2 FROM c1)
    SELECT 0 batch_id, n0 n_rows, s0 sum_cents, h0 chain_md5 FROM c2
    UNION ALL SELECT 1, n1, s1, h1 FROM c2
    UNION ALL SELECT 2, n2, s2, h2 FROM c2
    ORDER BY batch_id
  """

  val winIntervalCoverage: String = """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) us FROM events),
    l AS (SELECT user_id, us, lead(us) OVER (PARTITION BY user_id
        ORDER BY us, event_id) nxt FROM e),
    pu AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) n_events,
        CAST(SUM(CASE WHEN nxt IS NOT NULL
          THEN least(nxt - us, 600000000) ELSE 0 END) + 600000000
          AS BIGINT) covered_us
      FROM l GROUP BY 1)
    SELECT CAST((covered_us // 1000000) // 3600 AS BIGINT) coverage_hours,
      CAST(COUNT(*) AS BIGINT) n_users,
      CAST(SUM(n_events) AS BIGINT) sum_events,
      CAST(MIN(covered_us // 1000000) AS BIGINT) min_covered_s,
      CAST(MAX(covered_us // 1000000) AS BIGINT) max_covered_s
    FROM pu GROUP BY 1 ORDER BY 1
  """

  val analyticCupedAdjustment: String = """
    WITH ev AS (SELECT user_id, epoch_us(ts) us FROM events
      WHERE event_type = 'purchase'),
    mid AS (SELECT (MIN(us) + MAX(us)) // 2 mid_us FROM ev),
    per0 AS (SELECT user_id,
        CAST(SUM(CASE WHEN us < mid_us THEN 1 ELSE 0 END) AS BIGINT) x,
        CAST(SUM(CASE WHEN us >= mid_us THEN 1 ELSE 0 END) AS BIGINT) y
      FROM ev, mid GROUP BY 1),
    g AS (SELECT CAST(user_id % 2 AS INTEGER) arm,
        CAST(COUNT(*) AS BIGINT) n, CAST(SUM(x) AS BIGINT) sx,
        CAST(SUM(y) AS BIGINT) sy, CAST(SUM(x * x) AS BIGINT) sxx,
        CAST(SUM(x * y) AS BIGINT) sxy, CAST(SUM(y * y) AS BIGINT) syy
      FROM per0 GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) tn, CAST(SUM(sx) AS BIGINT) tsx,
        CAST(SUM(sy) AS BIGINT) tsy, CAST(SUM(sxx) AS BIGINT) tsxx,
        CAST(SUM(sxy) AS BIGINT) tsxy FROM g),
    th AS (SELECT ROUND(
        (CAST(tsxy AS DOUBLE) - CAST(tsx AS DOUBLE) * CAST(tsy AS DOUBLE) /
          CAST(tn AS DOUBLE)) /
        (CAST(tsxx AS DOUBLE) - CAST(tsx AS DOUBLE) * CAST(tsx AS DOUBLE) /
          CAST(tn AS DOUBLE)), 6) th,
      ROUND(CAST(tsx AS DOUBLE) / CAST(tn AS DOUBLE), 6) xb FROM tot)
    SELECT arm, n,
      ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) mean_post,
      ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
        th * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - xb), 6) mean_cuped,
      ROUND((CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) -
        CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) var_post,
      ROUND((CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) -
          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) -
        2.0 * th * ((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE) -
          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) +
        th * th * ((CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE) -
          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) var_cuped,
      ROUND(((CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) -
          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) -
        2.0 * th * ((CAST(sxy AS DOUBLE) * CAST(n AS DOUBLE) -
          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) +
        th * th * ((CAST(sxx AS DOUBLE) * CAST(n AS DOUBLE) -
          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))) /
        ((CAST(syy AS DOUBLE) * CAST(n AS DOUBLE) -
          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) /
          (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) var_ratio
    FROM g, th ORDER BY arm
  """

  val analyticTheilDecomposition: String = """
    WITH rev AS (SELECT c_mktsegment segment, o_custkey,
        SUM(CAST(o_totalprice AS DECIMAL(12,2))) x
      FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
    segs AS (SELECT segment s2, SUM(x) tx, CAST(COUNT(*) AS BIGINT) ns
      FROM rev GROUP BY 1),
    tot AS (SELECT SUM(tx) gx, CAST(SUM(ns) AS BIGINT) gn FROM segs),
    w AS (SELECT segment, ns, CAST(ROUND(
        (CAST(x AS DOUBLE) / (CAST(tx AS DOUBLE) / CAST(ns AS DOUBLE))) *
        ln(CAST(x AS DOUBLE) / (CAST(tx AS DOUBLE) / CAST(ns AS DOUBLE))),
        9) AS DECIMAL(28,9)) term
      FROM rev JOIN segs ON segment = s2),
    wa AS (SELECT segment, MAX(ns) n_cust, SUM(term) st FROM w GROUP BY 1),
    wi AS (SELECT segment, n_cust, ROUND(CAST(st AS DOUBLE) /
        CAST(n_cust AS DOUBLE), 6) theil_within FROM wa)
    SELECT segment, n_cust, theil_within,
      ROUND(CAST(tx AS DOUBLE) / CAST(gx AS DOUBLE), 6) income_share,
      ROUND((CAST(tx AS DOUBLE) / CAST(gx AS DOUBLE)) *
        ln((CAST(tx AS DOUBLE) / CAST(ns AS DOUBLE)) /
           (CAST(gx AS DOUBLE) / CAST(gn AS DOUBLE))), 6) between_term
    FROM wi JOIN segs ON segment = s2, tot ORDER BY segment
  """

  val analyticShapleyAttribution: String = """
    WITH fp AS (SELECT user_id, MIN(ts) t0 FROM events
      WHERE event_type = 'purchase' GROUP BY 1),
    tm AS (SELECT e.user_id, bit_or(CASE e.event_type
        WHEN 'view' THEN 1 WHEN 'click' THEN 2 WHEN 'search' THEN 4
        WHEN 'cart' THEN 8 ELSE 0 END) mask
      FROM fp JOIN events e ON e.user_id = fp.user_id AND e.ts < fp.t0
      GROUP BY 1),
    am AS (SELECT COALESCE(mask, 0) mask, CAST(COUNT(*) AS BIGINT) m
      FROM fp LEFT JOIN tm ON fp.user_id = tm.user_id GROUP BY 1),
    lat AS (SELECT unnest(range(0, 16)) s),
    v AS (SELECT s, CAST(COALESCE(SUM(m), 0) AS BIGINT) v
      FROM lat LEFT JOIN am ON (mask & s) = mask GROUP BY 1),
    ch AS (SELECT * FROM (VALUES ('view', 1), ('click', 2),
        ('search', 4), ('cart', 8)) c(channel, cbit)),
    t AS (SELECT channel,
        (CASE bit_count(v1.s) WHEN 0 THEN 6 WHEN 1 THEN 2
          WHEN 2 THEN 2 WHEN 3 THEN 6 END) * (v2.v - v1.v) term
      FROM ch JOIN v v1 ON (v1.s & cbit) = 0
        JOIN v v2 ON v2.s = (v1.s | cbit))
    SELECT channel, CAST(SUM(term) AS BIGINT) phi_x24,
      ROUND(CAST(SUM(term) AS DOUBLE) / 24.0, 6) phi
    FROM t GROUP BY 1 ORDER BY 1
  """

  val mlViterbiScore: String = """
    WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    ob AS (SELECT a.event_type, a.d,
        CASE WHEN b.c > a.c THEN 1 ELSE 0 END o
      FROM daily a JOIN daily b ON b.event_type = a.event_type
        AND b.d = a.d + 1),
    arr AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) n_obs,
        list(o ORDER BY d) obs FROM ob GROUP BY 1),
    dp AS (
      SELECT event_type, n_obs, obs, CAST(0 AS BIGINT) i,
        CAST(0 AS BIGINT) s0, CAST(0 AS BIGINT) s1 FROM arr
      UNION ALL
      SELECT event_type, n_obs, obs, i + 1,
        (CASE WHEN obs[i + 1] = 0 THEN 2 ELSE -1 END) +
          greatest(s0 + 1, s1 - 1),
        (CASE WHEN obs[i + 1] = 1 THEN 2 ELSE -1 END) +
          greatest(s1 + 1, s0 - 1)
      FROM dp WHERE i < n_obs),
    fin AS (SELECT event_type, n_obs,
        CAST(greatest(s0, s1) AS BIGINT) viterbi_score
      FROM dp WHERE i = n_obs),
    up AS (SELECT event_type, CAST(list_sum(obs) AS BIGINT) n_up_days
      FROM arr)
    SELECT f.event_type, n_obs, n_up_days, viterbi_score,
      CAST(greatest(n_up_days, n_obs - n_up_days) * 2 +
        (n_obs - greatest(n_up_days, n_obs - n_up_days)) * -1 + n_obs
        AS BIGINT) baseline_score,
      CAST(viterbi_score -
        (greatest(n_up_days, n_obs - n_up_days) * 2 +
         (n_obs - greatest(n_up_days, n_obs - n_up_days)) * -1 + n_obs)
        AS BIGINT) regime_gain
    FROM fin f JOIN up ON f.event_type = up.event_type
    ORDER BY f.event_type
  """

  val fnFiscal445: String = """
    WITH b AS (SELECT
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents,
        date_diff('day', DATE '1995-02-01', CAST(o_orderdate AS DATE)) dd
      FROM orders),
    f AS (SELECT cents, CAST(1995 + dd // 364 AS BIGINT) fiscal_year,
        (dd % 364) // 7 wy FROM b WHERE dd >= 0)
    SELECT fiscal_year, CAST(wy // 13 + 1 AS BIGINT) fiscal_quarter,
      CASE WHEN wy % 13 < 4 THEN 1 WHEN wy % 13 < 8 THEN 2 ELSE 3 END
        period_in_quarter,
      CAST(COUNT(*) AS BIGINT) n_orders, CAST(SUM(cents) AS BIGINT) sum_cents
    FROM f GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
  """

  val tsRollingOriginBacktest: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    ends AS (SELECT event_type et, MAX(d) dmax FROM daily GROUP BY 1),
    h AS (SELECT d.event_type, d.d, d.c, o origin
      FROM daily d JOIN ends ON event_type = et
      CROSS JOIN (SELECT unnest([28, 21, 14]) o)
      WHERE d.d > dmax - CAST(o AS INTEGER)
        AND d.d <= dmax - CAST(o - 7 AS INTEGER)),
    j AS (SELECT h.event_type, h.origin,
        CAST(COUNT(*) AS BIGINT) n_days,
        CAST(SUM(abs(h.c - f.c)) AS BIGINT) abs_err
      FROM h JOIN daily f ON f.event_type = h.event_type
        AND f.d = h.d - 7
      GROUP BY 1, 2)
    SELECT event_type, CAST(origin AS BIGINT) origin_days_back, n_days,
      ROUND(CAST(abs_err AS DOUBLE) / n_days, 6) mae
    FROM j ORDER BY event_type, origin_days_back
  """

  // layout artifact: the oracle derives the same aggregate (with the
  // inferred-typed keys) from the source
  val sourcePartitionTypeInference: String = """
    SELECT CAST(o_orderdate AS DATE) d, CAST(o_orderkey % 4 AS INTEGER) bucket,
      CAST(COUNT(*) AS BIGINT) n,
      CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) sum_cents
    FROM orders WHERE o_orderdate < DATE '1995-01-10'
    GROUP BY 1, 2 ORDER BY 1, 2
  """

  lazy val graphKtruss2Round: String = s"""
    WITH $thinnedGraphCte,
    adj0 AS MATERIALIZED (SELECT u a, v b FROM und
                          UNION ALL SELECT v, u FROM und),
    t1 AS MATERIALIZED (SELECT e.u, e.v FROM und e
      JOIN adj0 x ON x.a = e.u
      JOIN adj0 y ON y.a = e.v AND y.b = x.b
      GROUP BY e.u, e.v),
    adj1 AS MATERIALIZED (SELECT u a, v b FROM t1
                          UNION ALL SELECT v, u FROM t1),
    t2 AS MATERIALIZED (SELECT e.u, e.v FROM t1 e
      JOIN adj1 x ON x.a = e.u
      JOIN adj1 y ON y.a = e.v AND y.b = x.b
      GROUP BY e.u, e.v)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM und) n_edges_initial,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t1) n_edges_round1,
      (SELECT CAST(COUNT(*) AS BIGINT) FROM t2) n_edges_round2,
      (SELECT CAST(COUNT(DISTINCT n) AS BIGINT) FROM
        (SELECT u n FROM t2 UNION ALL SELECT v FROM t2)) n_truss_nodes
  """

  // lazy: references thinnedGraphCte, declared further down the file
  lazy val graphRandomWalkVisits: String = {
    def step(prev: String, t: Int): String = s"""
    s$t AS (SELECT s, u FROM (
        SELECT $prev.s, adj.b u, ROW_NUMBER() OVER (PARTITION BY $prev.s
          ORDER BY (($prev.s * 1000003 + $t) * 31 + $prev.u * 17 + adj.b)
            % 1000000007, adj.b) rn
        FROM $prev JOIN adj ON $prev.u = adj.a) WHERE rn = 1)"""
    s"""
    WITH $thinnedGraphCte,
    adj AS MATERIALIZED (SELECT u a, v b FROM und
                         UNION ALL SELECT v, u FROM und),
    s0 AS (SELECT DISTINCT a s, a u FROM adj),
    ${step("s0", 1)},
    ${step("s1", 2)},
    ${step("s2", 3)}
    SELECT u AS node, CAST(COUNT(*) AS BIGINT) n_walks_ending
    FROM s3 GROUP BY 1 ORDER BY node
  """
  }

  val mlLinearShapExact: String = """
    WITH per AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) x1,
        CAST(SUM(CAST(l_quantity AS INTEGER)) AS BIGINT) x2,
        CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) y
      FROM lineitem GROUP BY 1),
    p AS (SELECT CAST(COUNT(*) AS BIGINT) n,
        CAST(SUM(x1) AS BIGINT) sx1, CAST(SUM(x2) AS BIGINT) sx2,
        CAST(SUM(y) AS BIGINT) sy,
        CAST(SUM(x1 * x1) AS BIGINT) s11, CAST(SUM(x1 * x2) AS BIGINT) s12,
        CAST(SUM(x2 * x2) AS BIGINT) s22,
        CAST(SUM(x1 * y) AS BIGINT) s1y, CAST(SUM(x2 * y) AS BIGINT) s2y
      FROM per),
    m AS (SELECT *,
        CAST(s11 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx1 AS DOUBLE) /
          CAST(n AS DOUBLE) + 1000.0 a,
        CAST(s12 AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sx2 AS DOUBLE) /
          CAST(n AS DOUBLE) b,
        CAST(s22 AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE) /
          CAST(n AS DOUBLE) + 1000.0 c,
        CAST(s1y AS DOUBLE) - CAST(sx1 AS DOUBLE) * CAST(sy AS DOUBLE) /
          CAST(n AS DOUBLE) d,
        CAST(s2y AS DOUBLE) - CAST(sx2 AS DOUBLE) * CAST(sy AS DOUBLE) /
          CAST(n AS DOUBLE) e
      FROM p),
    w AS (SELECT *,
        ROUND((c * d - b * e) / (a * c - b * b), 6) w1,
        ROUND((a * e - b * d) / (a * c - b * b), 6) w2
      FROM m),
    model AS (SELECT w1, w2,
        ROUND((CAST(sy AS DOUBLE) - w1 * sx1 - w2 * sx2) /
          CAST(n AS DOUBLE), 4) b0,
        ROUND(CAST(sx1 AS DOUBLE) / CAST(n AS DOUBLE), 6) m1,
        ROUND(CAST(sx2 AS DOUBLE) / CAST(n AS DOUBLE), 6) m2
      FROM w),
    top AS (SELECT * FROM per ORDER BY y DESC, l_orderkey LIMIT 10)
    SELECT l_orderkey, x1, x2, y,
      ROUND(w1 * (x1 - m1), 4) phi_lines,
      ROUND(w2 * (x2 - m2), 4) phi_qty,
      ROUND(b0 + w1 * m1 + w2 * m2, 4) base_value,
      ROUND(b0 + w1 * x1 + w2 * x2, 4) prediction
    FROM top, model ORDER BY y DESC, l_orderkey
  """

  // the delimiter is a layout artifact: the oracle aggregates the
  // source events directly
  val sourceCsvMulticharDelim: String = """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) n,
      CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) sum_cents,
      CAST(MIN(event_id) AS BIGINT) min_id,
      CAST(MAX(event_id) AS BIGINT) max_id
    FROM events GROUP BY 1 ORDER BY 1
  """

  // 3 unrolled synchronous LPA rounds: adopt the most frequent
  // neighbor label, ties to the smallest label — mirrors the Spark
  // loop. Shared by graphLabelPropagation and graphConductance.
  private def lpaCtes: String = {
    def round(i: Int): String = {
      val prev = if (i == 1) "l0" else s"l${i - 1}"
      s"""g$i AS (SELECT e.src node, l.lbl, COUNT(*) cnt
        FROM edges e JOIN $prev l ON e.dst = l.node GROUP BY 1, 2),
      l$i AS (SELECT node, lbl FROM (
        SELECT node, lbl, ROW_NUMBER() OVER (
          PARTITION BY node ORDER BY cnt DESC, lbl) rn FROM g$i)
        WHERE rn = 1)"""
    }
    s"""pairs AS (SELECT DISTINCT l_partkey p, l_suppkey + 10000000 s
                   FROM lineitem),
    edges AS MATERIALIZED (SELECT p src, s dst FROM pairs
              UNION ALL SELECT s, p FROM pairs),
    l0 AS (SELECT DISTINCT src node, src lbl FROM edges),
    ${round(1)}, ${round(2)}, ${round(3)}"""
  }

  val graphLabelPropagation: String = s"""
    WITH $lpaCtes
    SELECT node, lbl AS community FROM l3 ORDER BY node
    """

  val graphConductance: String = s"""
    WITH $lpaCtes,
    lab AS MATERIALIZED (SELECT node, lbl FROM l3),
    deg AS (SELECT src node, COUNT(*) dg FROM edges GROUP BY 1),
    vol AS (SELECT lbl, CAST(SUM(dg) AS BIGINT) volume,
        CAST(COUNT(*) AS BIGINT) n_nodes
      FROM deg JOIN lab USING (node) GROUP BY 1),
    tot AS (SELECT CAST(SUM(volume) AS BIGINT) m2 FROM vol),
    cut AS (SELECT a.lbl, CAST(COUNT(*) AS BIGINT) cut
      FROM edges e JOIN lab a ON e.src = a.node
        JOIN lab b ON e.dst = b.node
      WHERE a.lbl <> b.lbl GROUP BY 1)
    SELECT lbl AS community, n_nodes, volume,
      COALESCE(cut, 0) AS cut_edges,
      CASE WHEN least(volume, m2 - volume) = 0 THEN 0.0
        ELSE ROUND(CAST(COALESCE(cut, 0) AS DOUBLE) /
          least(volume, m2 - volume), 6) END conductance
    FROM vol LEFT JOIN cut USING (lbl), tot
    ORDER BY n_nodes DESC, community LIMIT 10
  """

  val scaleHilbertCluster: String = {
    // the 8 unrolled xy->d Hilbert stages, mirrored from
    // Round13Ops3.hilbertStage: quadrant bits, then flip+swap when
    // ry = 0
    val stages = (0 until 8).map { i =>
      val s = 1 << (7 - i)
      val prev = if (i == 0) "base" else s"h${i - 1}"
      s"""h$i AS (SELECT o_orderkey, xb, yb,
        CASE WHEN ry = 0 THEN yf ELSE x END AS x,
        CASE WHEN ry = 0 THEN xf ELSE y END AS y,
        d + ${s.toLong * s} * xor(3 * rx, ry) AS d
        FROM (SELECT o_orderkey, xb, yb, x, y, d, rx, ry,
          CASE WHEN rx = 1 THEN ${s - 1} - x ELSE x END AS xf,
          CASE WHEN rx = 1 THEN ${s - 1} - y ELSE y END AS yf
          FROM (SELECT o_orderkey, xb, yb, x, y, d,
            CASE WHEN (x & $s) > 0 THEN 1 ELSE 0 END AS rx,
            CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END AS ry
            FROM $prev)))"""
    }.mkString(",\n    ")
    s"""
    WITH base AS (SELECT o_orderkey, xb, yb, x, y, CAST(0 AS BIGINT) d
      FROM (SELECT o_orderkey,
              CAST(o_custkey % 256 AS INTEGER) AS xb,
              CAST(o_custkey % 256 AS INTEGER) AS x,
              CAST(date_diff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) % 256 AS INTEGER)
                AS yb,
              CAST(date_diff('day', DATE '1995-01-01',
                             CAST(o_orderdate AS DATE)) % 256 AS INTEGER)
                AS y
            FROM orders)),
    $stages
    SELECT o_orderkey, xb, yb, CAST(d AS BIGINT) AS hval
    FROM h7 ORDER BY hval, o_orderkey
    """
  }

  val scaleZorderCluster: String = {
    val morton = (0 until 8).map { i =>
      s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
    s"""
    SELECT o_orderkey, xb, yb, $morton AS zval
    FROM (SELECT o_orderkey,
                 CAST(o_custkey % 256 AS INTEGER) AS xb,
                 CAST(date_diff('day', DATE '1995-01-01',
                                CAST(o_orderdate AS DATE)) % 256 AS INTEGER)
                   AS yb
          FROM orders)
    ORDER BY zval, o_orderkey
    """
  }

  // same gaps-and-islands construction as the batch mirror; gap
  // strictly greater than 30 min opens a new session
  val streamStatefulSession: String = """
    WITH b AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS boundary
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, ts,
             sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM b)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start,
           max(ts) AS session_end, count(*) AS n_events
    FROM r GROUP BY user_id, session_id
    ORDER BY user_id, session_start
  """

  // identical rule set and bit weights
  val pipelineQuarantineRules: String = """
    SELECT violation_mask, count(*) AS n_rows
    FROM (SELECT (CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END
                + CASE WHEN l_tax >= 0.06 THEN 2 ELSE 0 END
                + CASE WHEN l_quantity >= 45.0 THEN 4 ELSE 0 END
                + CASE WHEN l_shipdate > TIMESTAMP '2001-06-01 00:00:00'
                       THEN 8 ELSE 0 END) AS violation_mask
          FROM lineitem)
    GROUP BY violation_mask ORDER BY violation_mask
  """

  // same count-desc, token-asc tie break; p is an identical single
  // double division
  val textTrigramLm: String = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    tri AS (
      SELECT ctx, nxt, count(*) AS n3 FROM (
        SELECT unnest(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i + 1])) AS ctx,
               unnest(list_transform(range(1, len(t) - 1),
                 i -> t[i + 2])) AS nxt
        FROM toks WHERE len(t) >= 3)
      GROUP BY ctx, nxt),
    cc AS (SELECT ctx, sum(n3) AS n_ctx FROM tri GROUP BY ctx),
    best AS (
      SELECT ctx, nxt, n3,
             row_number() OVER (PARTITION BY ctx
                                ORDER BY n3 DESC, nxt ASC) AS rk
      FROM tri)
    SELECT b.ctx, b.nxt, CAST(cc.n_ctx AS BIGINT) AS n_ctx,
           round(CAST(b.n3 AS DOUBLE) / cc.n_ctx, 6) AS p_next
    FROM best b JOIN cc ON b.ctx = cc.ctx
    WHERE b.rk = 1 AND cc.n_ctx >= 20
    ORDER BY b.ctx
  """

  // sessions rebuilt with the same gaps-and-islands construction, then
  // the same equi-key + containment join
  val joinIntervalContainment: String = """
    WITH b AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS boundary
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, ts,
             sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
      FROM b),
    sessions AS (
      SELECT user_id, session_id, min(ts) AS session_start,
             max(ts) AS session_end
      FROM r GROUP BY user_id, session_id)
    SELECT e.event_id, e.user_id,
           CAST(s.session_id AS BIGINT) AS session_id, s.session_start
    FROM events e JOIN sessions s
      ON e.user_id = s.user_id
     AND e.ts >= s.session_start AND e.ts <= s.session_end
    WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
  """

  // 5 unrolled iterations of the identical update rule; every node has
  // in-edges (undirected graph), so each step's join is total
  val graphPagerank: String = {
    val steps = (1 to 5).map { i =>
      s"""r$i AS (
        SELECT nd.node,
               0.15 / (SELECT n FROM nn) + 0.85 * c.contrib AS r
        FROM nodes nd JOIN (
          SELECT e.dst AS node, sum(p.r / d.deg) AS contrib
          FROM r${i - 1} p JOIN edges e ON p.node = e.src
                           JOIN deg d ON e.src = d.src
          GROUP BY e.dst) c ON nd.node = c.node)"""
    }.mkString(",\n")
    s"""
    WITH pairs AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey + 10000000 AS s
      FROM lineitem),
    edges AS (
      SELECT p AS src, s AS dst FROM pairs
      UNION ALL
      SELECT s AS src, p AS dst FROM pairs),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nodes AS (SELECT src AS node FROM deg),
    nn AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
    $steps
    SELECT node, round(r * (SELECT n FROM nn), 6) AS rank_scaled
    FROM r5 ORDER BY node
    """
  }

  // file counts are contract constants (64 explicit partitions written,
  // narrow coalesce to 4); content checksum re-derived from the table
  val pipelineCompactSmallFiles: String = s"""
    SELECT 64 AS n_files_small, 4 AS n_files_compacted,
           count(*) AS n_rows,
           CAST(sum(${m("o_totalprice")}) AS DOUBLE) AS revenue_checksum
    FROM orders
  """

  // order-free aggregates re-derived from the source table
  val sourceTextRoundtrip: String = """
    SELECT count(*) AS n_lines,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           min(text) AS min_line, max(text) AS max_line
    FROM documents
  """

  // identical exact-moment corr formula (single double conversion,
  // same operation order) — see analyticZscoreOutliers
  val aggCorrPairs: String = {
    def corrExpr(x: String, y: String): String = {
      val (nd, sx, sy, sxx, syy, sxy) =
        ("CAST(n AS DOUBLE)", s"CAST(s_$x AS DOUBLE)", s"CAST(s_$y AS DOUBLE)",
          s"CAST(s_$x$x AS DOUBLE)", s"CAST(s_$y$y AS DOUBLE)",
          s"CAST(s_$x$y AS DOUBLE)")
      s"round(($nd * $sxy - $sx * $sy) / " +
        s"sqrt(($nd * $sxx - $sx * $sx) * ($nd * $syy - $sy * $sy)), 6)"
    }
    val short = Map("l_quantity" -> "q", "l_extendedprice" -> "e",
      "l_discount" -> "d")
    val rows = Seq(("l_quantity", "l_extendedprice"),
      ("l_quantity", "l_discount"), ("l_extendedprice", "l_discount"))
      .map { case (x, y) =>
        s"SELECT '${x}__$y' AS pair, " +
          s"${corrExpr(short(x), short(y))} AS corr, n FROM mo"
      }.mkString("\nUNION ALL\n")
    s"""
    WITH b AS (
      SELECT ${m("l_quantity")} AS q, ${m("l_extendedprice")} AS e,
             ${m("l_discount")} AS d
      FROM lineitem),
    mo AS (
      SELECT count(*) AS n,
             sum(q) AS s_q, sum(q * q) AS s_qq,
             sum(e) AS s_e, sum(e * e) AS s_ee,
             sum(d) AS s_d, sum(d * d) AS s_dd,
             sum(q * e) AS s_qe, sum(q * d) AS s_qd, sum(e * d) AS s_ed
      FROM b)
    $rows
    ORDER BY pair
    """
  }

  // CASE aggregation form of the same rotate (0 where PIVOT's NULL is
  // coalesced)
  val sqlPivotClause: String = """
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
  """

  // aggregates recomputed from the base table over the same derived
  // field (chr(10) = the embedded newline)
  val sourceCsvQuotedMultiline: String = """
    SELECT count(*) AS n_rows,
           CAST(sum(length(t)) AS BIGINT) AS total_chars,
           count(DISTINCT t) AS n_distinct,
           min(doc_id) AS min_id, max(doc_id) AS max_id
    FROM (SELECT doc_id,
                 'l1' || chr(10) || lang || ',"q" end' AS t
          FROM documents)
  """

  // same union-window forward as-of; first_value IGNORE NULLS over the
  // following frame with the identical (ts, event_id) ordering
  val joinAsofForward: String = """
    SELECT event_id AS click_id, user_id, next_purchase_id
    FROM (
      SELECT event_id, user_id, event_type,
             first_value(CASE WHEN event_type = 'purchase'
                              THEN event_id END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_purchase_id
      FROM events
      WHERE event_type IN ('click', 'purchase'))
    WHERE event_type = 'click'
    ORDER BY click_id
  """

  // identical value-based frame; RANGE includes all ties on both engines
  val winRangeNumeric: String = """
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           count(*) OVER w AS n_in_band,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
             AS rev_in_band
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
                 RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW)
    ORDER BY o_orderkey
  """

  // ---- round-7 widening, part 4 ----

  // plain join over the raw table — proves DPP changes the scan, not
  // the answer
  val scaleDppJoin: String = """
    WITH dim(et, category) AS (VALUES
      ('click','engagement'), ('view','engagement'),
      ('purchase','conversion'), ('signup','conversion'),
      ('error','ops'))
    SELECT event_type, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events JOIN dim ON event_type = et
    WHERE category = 'conversion'
    GROUP BY event_type ORDER BY event_type
  """

  val analyticRetentionCohort: String = """
    WITH ev AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             min(CAST(date_trunc('day', ts) AS DATE))
               OVER (PARTITION BY user_id) AS cohort_day
      FROM events)
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, day) // 7 AS INT) AS week_offset,
           count(DISTINCT user_id) AS active_users,
           count(*) AS n_events
    FROM ev GROUP BY 1, 2 ORDER BY 1, 2
  """

  // open/close via row_number from both ends (same (ts, event_id)
  // total order as the Spark min_by/max_by struct)
  val tsDownsampleOhlc: String = """
    WITH e AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id,
             CAST(value AS DECIMAL(12,2)) AS v
      FROM events),
    r AS (
      SELECT *,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY ts, event_id) AS ra,
        row_number() OVER (PARTITION BY event_type, bucket
                           ORDER BY ts DESC, event_id DESC) AS rd
      FROM e)
    SELECT event_type, bucket,
      CAST(max(CASE WHEN ra = 1 THEN v END) AS DOUBLE) AS open,
      CAST(max(v) AS DOUBLE) AS high,
      CAST(min(v) AS DOUBLE) AS low,
      CAST(max(CASE WHEN rd = 1 THEN v END) AS DOUBLE) AS close,
      CAST(sum(v) AS DOUBLE) AS volume,
      count(*) AS n_events
    FROM r GROUP BY event_type, bucket ORDER BY event_type, bucket
  """

  // identical injected markup, identical strip chain: tags → &quot; →
  // whitespace squeeze → trim ('g' flag: DuckDB replaces first match
  // only by default, Spark replaces all)
  val textHtmlStrip: String = """
    WITH h AS (
      SELECT doc_id,
        '<html><body class="doc"><h1>' || source || '</h1><p>' ||
        replace(text, 'table', '&quot;table&quot;') ||
        '</p><br/></body></html>' AS html
      FROM documents),
    s AS (
      SELECT doc_id,
        trim(regexp_replace(
          replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                  '&quot;', '"'),
          '\s+', ' ', 'g')) AS clean
      FROM h)
    SELECT doc_id, clean, length(clean) AS n_chars_clean
    FROM s ORDER BY doc_id
  """

  val fnUrlParse: String = """
    WITH u AS (
      SELECT doc_id,
        'https://' || source || '.example.com/' || lang || '/doc/' ||
        CAST(doc_id AS VARCHAR) || '?q=' || CAST(n_chars AS VARCHAR) ||
        '&page=2' AS url
      FROM documents)
    SELECT doc_id,
      regexp_extract(url, 'https?://([^/?#]+)', 1) AS host,
      regexp_extract(url, 'https?://[^/?#]+([^?#]*)', 1) AS path,
      CAST(regexp_extract(url, '[?&]q=([^&#]*)', 1) AS BIGINT) AS q_chars,
      CAST(regexp_extract(url, '[?&]page=([^&#]*)', 1) AS INT) AS page
    FROM u ORDER BY doc_id
  """

  // threshold in integer math; lift is one identical double expression
  val aggHeavyHitters: String = """
    WITH t AS (SELECT count(*) AS total,
                      count(DISTINCT user_id) AS n_users FROM events),
    c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id)
    SELECT user_id, n,
      CAST(n AS DOUBLE) * CAST(n_users AS DOUBLE) / CAST(total AS DOUBLE)
        AS lift
    FROM c, t WHERE n * n_users * 10 >= total * 12
    ORDER BY n DESC, user_id
  """

  val sampleReservoirHash: String = """
    SELECT event_type, event_id, user_id, pick FROM (
      SELECT event_type, event_id, user_id,
        row_number() OVER (PARTITION BY event_type
          ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS pick
      FROM events)
    WHERE pick <= 4 ORDER BY event_type, pick
  """

  // exact integer counts; single identical double expression under
  // ROUND(ln(...), 6) — the repo's cross-engine log protocol
  val textCollocationPmi: String = """
    WITH toks AS (
      SELECT string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2),
    uni AS (SELECT unnest(t) AS w FROM toks),
    un AS (SELECT w, count(*) AS n_w FROM uni GROUP BY w),
    bp AS (
      SELECT unnest(list_transform(range(1, len(t)),
               i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
      FROM toks),
    bg AS (SELECT b.w1 AS w1, b.w2 AS w2 FROM bp),
    pc AS (SELECT w1, w2, count(*) AS n_xy FROM bg
           GROUP BY w1, w2 HAVING count(*) >= 5),
    tot AS (SELECT (SELECT sum(n_w) FROM un) AS nt,
                   (SELECT count(*) FROM bg) AS nb)
    SELECT pc.w1, pc.w2, n_xy,
      ROUND(LN(CAST(n_xy AS DOUBLE) * CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE) / (CAST(nb AS DOUBLE) * CAST(u1.n_w AS DOUBLE) * CAST(u2.n_w AS DOUBLE))), 6) AS pmi
    FROM pc
    JOIN un u1 ON pc.w1 = u1.w
    JOIN un u2 ON pc.w2 = u2.w, tot
    ORDER BY pc.w1, pc.w2
  """

  // same spine + two IGNORE NULLS window passes; the interpolation CASE
  // is textually identical modulo date_diff argument order
  val tsInterpolateLinear: String = """
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             max(value) AS day_max
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    bounds AS (
      SELECT user_id, CAST(min(day) AS TIMESTAMP) AS d0,
             CAST(max(day) AS TIMESTAMP) AS d1
      FROM daily GROUP BY user_id),
    spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM bounds),
    j AS (
      SELECT s.user_id, s.day, d.day_max,
        last_value(d.day_max IGNORE NULLS)
          OVER (PARTITION BY s.user_id ORDER BY s.day
                ROWS UNBOUNDED PRECEDING) AS pv,
        last_value(CASE WHEN d.day_max IS NOT NULL THEN s.day END IGNORE NULLS)
          OVER (PARTITION BY s.user_id ORDER BY s.day
                ROWS UNBOUNDED PRECEDING) AS pd,
        first_value(d.day_max IGNORE NULLS)
          OVER (PARTITION BY s.user_id ORDER BY s.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN d.day_max IS NOT NULL THEN s.day END IGNORE NULLS)
          OVER (PARTITION BY s.user_id ORDER BY s.day
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
      FROM spine s LEFT JOIN daily d
        ON s.user_id = d.user_id AND s.day = d.day)
    SELECT user_id, day, day_max IS NOT NULL AS is_actual,
      CASE WHEN pd = nd THEN pv
           WHEN pv IS NULL THEN nv
           WHEN nv IS NULL THEN pv
           ELSE pv + (nv - pv) * (CAST(date_diff('day', pd, day) AS DOUBLE) / CAST(date_diff('day', pd, nd) AS DOUBLE))
      END AS interp
    FROM j ORDER BY user_id, day
  """

  val sqlGroupByAll: String = """
    SELECT l_returnflag, l_linestatus, year(l_shipdate) AS ship_year,
      count(*) AS n_items,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
  """

  // ---- round-7 widening, part 5 ----

  val sqlExistsCorrelated: String = """
    SELECT o_orderstatus, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
      AND NOT EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = o.o_orderkey
                        AND l2.l_discount > 0.09)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
  """

  // within each (g_rf, g_ls) stratum the nullable grouping columns are
  // uniformly NULL or uniformly present, so no NULL-ordering divergence
  val aggGroupingId: String = """
    SELECT l_returnflag, l_linestatus,
      CAST(grouping(l_returnflag) AS INT) AS g_rf,
      CAST(grouping(l_linestatus) AS INT) AS g_ls,
      count(*) AS n_items,
      CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
  """

  val fnBinaryCodec: String = """
    SELECT doc_id,
      to_base64(encode(text)) AS b64,
      substring(hex(encode(text)), 1, 32) AS hex32,
      octet_length(encode(text)) AS n_bytes,
      decode(from_base64(to_base64(encode(text)))) = text AS roundtrip_ok
    FROM documents ORDER BY doc_id
  """

  // unmatched clicks keep a row with NULLs; NULLS FIRST matches the
  // Spark side's asc_nulls_first
  val streamIntervalJoinOuter: String = """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 10 MINUTE
    ORDER BY c.user_id, click_id, purchase_id NULLS FIRST
  """

  // identical deterministic injection; rates are one double division
  val pipelinePiiAudit: String = """
    WITH r AS (
      SELECT source, text ||
        CASE WHEN doc_id % 3 = 0
             THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
             ELSE '' END ||
        CASE WHEN doc_id % 5 = 0
             THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
             ELSE '' END AS raw
      FROM documents)
    SELECT source, count(*) AS n_docs,
      CAST(sum(CASE WHEN regexp_matches(raw, '[a-z0-9.]+@[a-z0-9.]+')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
      CAST(sum(CASE WHEN regexp_matches(raw, '\+[0-9][0-9-]{5,}')
               THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
      CAST(sum(CASE WHEN regexp_matches(raw, '[a-z0-9.]+@[a-z0-9.]+')
                    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        AS email_rate,
      CAST(sum(CASE WHEN regexp_matches(raw, '\+[0-9][0-9-]{5,}')
                    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        AS phone_rate
    FROM r GROUP BY source ORDER BY source
  """

  val sqlWindowClause: String = """
    SELECT o_orderkey, o_custkey, o_totalprice,
      rank() OVER w AS rnk,
      CAST(count(*) OVER w AS INT) AS n_seen,
      CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w2 AS DOUBLE)
        AS run_total
    FROM orders
    WINDOW
      w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
            ROWS UNBOUNDED PRECEDING),
      w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS UNBOUNDED PRECEDING)
    ORDER BY o_orderkey
  """

  // 1-based slice t[i : i+2] = 3 chars, i in 1 .. len-2 (range is
  // end-exclusive)
  val textCharNgrams: String = """
    WITH g AS (
      SELECT lang,
        unnest(list_transform(range(1, length(text) - 1),
          i -> text[CAST(i AS INT) : CAST(i + 2 AS INT)])) AS gram
      FROM documents WHERE length(text) >= 3),
    c AS (SELECT lang, gram, count(*) AS n FROM g GROUP BY lang, gram)
    SELECT lang, gram, n, rn FROM (
      SELECT lang, gram, n,
        row_number() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS rn
      FROM c)
    WHERE rn <= 20 ORDER BY lang, rn
  """

  // same union-window construction: backward last + forward first over
  // one (user, time) ordering, then a pure-integer CASE picks the winner
  val joinAsofNearest: String = """
    WITH u AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS um,
        CASE WHEN event_type = 'purchase' THEN event_id END AS p_id,
        CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS p_um
      FROM events WHERE event_type IN ('click', 'purchase')),
    w AS (
      SELECT *,
        last_value(p_id IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY um, event_id
                ROWS UNBOUNDED PRECEDING) AS b_id,
        last_value(p_um IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY um, event_id
                ROWS UNBOUNDED PRECEDING) AS b_um,
        first_value(p_id IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY um, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_id,
        first_value(p_um IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY um, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_um
      FROM u)
    SELECT event_id AS click_id, user_id,
      CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
           WHEN f_id IS NULL THEN b_id
           WHEN b_id IS NULL THEN f_id
           WHEN um - b_um <= f_um - um THEN b_id
           ELSE f_id END AS nearest_purchase_id,
      CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
           WHEN f_id IS NULL THEN b_um - um
           WHEN b_id IS NULL THEN f_um - um
           WHEN um - b_um <= f_um - um THEN b_um - um
           ELSE f_um - um END AS gap_us
    FROM w WHERE event_type = 'click'
    ORDER BY click_id
  """

  // ---- round-8 widening ----

  // same trigram construction as textTrigramLm; each -ln p rounded 9dp
  // and summed in exact DECIMAL so accumulation order is irrelevant
  val textPerplexityScore: String = """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    occ AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1])) AS ctx,
             unnest(list_transform(range(1, len(t) - 1),
               i -> t[i + 2])) AS nxt
      FROM toks WHERE len(t) >= 3),
    tri AS (SELECT ctx, nxt, count(*) AS n3 FROM occ GROUP BY ctx, nxt),
    cc AS (SELECT ctx, CAST(sum(n3) AS BIGINT) AS n_ctx FROM tri GROUP BY ctx)
    SELECT o.doc_id, count(*) AS n_trigrams,
           round(CAST(sum(CAST(round(ln(CAST(cc.n_ctx AS DOUBLE) / tri.n3), 9)
                              AS DECIMAL(28,9))) AS DOUBLE) / count(*), 6)
             AS mean_nll
    FROM occ o
    JOIN tri ON o.ctx = tri.ctx AND o.nxt = tri.nxt
    JOIN cc ON o.ctx = cc.ctx
    GROUP BY o.doc_id ORDER BY o.doc_id
  """

  // identical quantization arithmetic: every step (float→double widen,
  // scale division, round-half-away, integer dot in double, sqrt,
  // divide) is IEEE-exact or correctly rounded on both engines
  val simEmbeddingQuantize: String = """
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
    q AS (
      SELECT vec_id,
             list_transform(e, x -> round(x * (127.0 /
               list_max(list_transform(e, y -> abs(y)))))) AS q
      FROM e),
    n AS (SELECT vec_id, q, list_inner_product(q, q) AS qn FROM q)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(list_inner_product(a.q, b.q) AS BIGINT) AS q_dot,
           round(list_inner_product(a.q, b.q) /
                 (sqrt(a.qn) * sqrt(b.qn)), 6) AS q_cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    ORDER BY q_cos DESC, id_a, id_b LIMIT 50
  """

  // same unrolled lag chain; numerator is exact DECIMAL (2dp money ×
  // power-of-two weights), one double division at the end
  val tsEwma: String = {
    val lags = (0 to 7).map(j => s"lag(v, $j) OVER w AS v_$j").mkString(",\n             ")
    val num = (0 to 7).map(j =>
      s"CASE WHEN v_$j IS NOT NULL THEN v_$j * ${1L << (7 - j)} ELSE CAST(0 AS DECIMAL(30,2)) END")
      .mkString(" + ")
    val den = (0 to 7).map(j =>
      s"CASE WHEN v_$j IS NOT NULL THEN ${1L << (7 - j)} ELSE 0 END").mkString(" + ")
    s"""
    WITH b AS (
      SELECT user_id, event_id, ts, ${m("value")} AS v FROM events),
    l AS (
      SELECT user_id, event_id,
             $lags
      FROM b
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id,
           round(CAST($num AS DOUBLE) / CAST($den AS DOUBLE), 6) AS ewma
    FROM l ORDER BY user_id, event_id
    """
  }

  // the CC recursive-CTE oracle extended with the survivorship rollup
  val pipelineDedupSurvivorship: String = """
    WITH RECURSIVE
    t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
          FROM documents),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
            (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
            >= 0.8),
    und AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION ALL SELECT id_b, id_a FROM edges),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
    lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            FROM reach GROUP BY a)
    SELECT l.cluster_id, min(d.doc_id) AS canonical_id,
           count(*) AS n_members,
           CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
           list_aggregate(list_sort(list_distinct(list(d.lang))), 'string_agg', ',')
             AS langs,
           list_aggregate(list_sort(list_distinct(list(d.source))), 'string_agg', ',')
             AS sources
    FROM lbl l JOIN documents d ON l.doc_id = d.doc_id
    GROUP BY l.cluster_id ORDER BY l.cluster_id
  """

  // DuckDB has true count(DISTINCT) OVER; set cardinality is order-free
  val winDistinctRolling: String = """
    SELECT user_id, event_id,
           CAST(count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS INT)
             AS n_distinct_types
    FROM events ORDER BY user_id, event_id
  """

  // bitmaps are an exact-distinct mechanism; the oracle is the plain form
  val aggBitmapDistinct: String = """
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users,
           count(*) AS n_events
    FROM events GROUP BY event_type ORDER BY event_type
  """

  // layout-independent answer: same band filter over the raw table
  val scaleSortedSkipping: String = """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-11 00:00:00'
    GROUP BY event_type ORDER BY event_type
  """

  // UNION ALL with an explicit NULL stands in for the missing column
  val pipelineSchemaDriftAudit: String = """
    SELECT coalesce(priority, '<pre-drift>') AS priority,
           count(*) AS n_rows,
           CAST(sum(price) AS DOUBLE) AS revenue
    FROM (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             NULL AS priority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
             o_orderpriority AS priority
      FROM orders WHERE o_orderkey % 2 = 1)
    GROUP BY 1 ORDER BY 1
  """

  // SCD2 rebuilt with the identical gaps-and-islands construction, then
  // the containment join ([valid_from, valid_to) with open last interval)
  val joinScd2PointInTime: String = """
    WITH b AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS boundary
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT user_id, event_type, ts, event_id,
             sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS island
      FROM b),
    runs AS (
      SELECT user_id, event_type, island, min(ts) AS valid_from
      FROM r GROUP BY user_id, event_type, island),
    dim AS (
      SELECT user_id, event_type AS status, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to
      FROM runs)
    SELECT e.event_id, e.user_id, d.status AS status_at_purchase,
           d.valid_from AS status_since
    FROM events e JOIN dim d
      ON e.user_id = d.user_id
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    WHERE e.event_type = 'purchase'
    ORDER BY e.event_id
  """

  // ascii corpus: UTF8_LCASE grouping ≡ grouping by lower()
  val fnStringCollation: String = """
    SELECT lower(l) AS lang_ci, count(*) AS n_docs,
           CAST(sum(CASE WHEN l = lower(l) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lowercase
    FROM (SELECT CASE WHEN doc_id % 2 = 0 THEN upper(lang) ELSE lang END AS l
          FROM documents)
    GROUP BY lower(l) ORDER BY lang_ci
  """

  // identical exact-moment → single-double-expression recipe as
  // aggCorrPairs; stats computed once in a CTE (the broadcast mirror)
  val mlFeatureScaling: String = """
    WITH b AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_quantity AS DECIMAL(12,2)) AS q,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS e
      FROM lineitem),
    s AS (
      SELECT count(*) AS n,
             min(q) AS q_min, max(q) AS q_max, sum(q) AS q_sum,
             sum(q * q) AS q_sum2,
             min(e) AS e_min, max(e) AS e_max, sum(e) AS e_sum,
             sum(e * e) AS e_sum2
      FROM b)
    SELECT l_orderkey, l_linenumber,
      round((CAST(q AS DOUBLE) - CAST(q_sum AS DOUBLE) / CAST(n AS DOUBLE)) /
            sqrt((CAST(q_sum2 AS DOUBLE) - CAST(q_sum AS DOUBLE) *
                  CAST(q_sum AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
        AS q_z,
      round((CAST(q AS DOUBLE) - CAST(q_min AS DOUBLE)) /
            (CAST(q_max AS DOUBLE) - CAST(q_min AS DOUBLE)), 6) AS q_mm,
      round((CAST(e AS DOUBLE) - CAST(e_sum AS DOUBLE) / CAST(n AS DOUBLE)) /
            sqrt((CAST(e_sum2 AS DOUBLE) - CAST(e_sum AS DOUBLE) *
                  CAST(e_sum AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
        AS e_z,
      round((CAST(e AS DOUBLE) - CAST(e_min AS DOUBLE)) /
            (CAST(e_max AS DOUBLE) - CAST(e_min AS DOUBLE)), 6) AS e_mm
    FROM b CROSS JOIN s
    WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
  """

  // same one-scan conditional sums, unpivoted row-per-rule
  val pipelineDqExpectations: String = """
    WITH a AS (
      SELECT count(*) AS n_checked,
        CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
                 THEN 1 ELSE 0 END) AS BIGINT) AS qty_in_range,
        CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.10
                 THEN 1 ELSE 0 END) AS BIGINT) AS discount_in_range,
        CAST(sum(CASE WHEN l_tax >= 0.09 THEN 1 ELSE 0 END) AS BIGINT)
          AS tax_below_cap,
        CAST(sum(CASE WHEN l_extendedprice <= 0.0 THEN 1 ELSE 0 END) AS BIGINT)
          AS price_positive,
        CAST(sum(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01 00:00:00'
                        OR l_shipdate > TIMESTAMP '2002-01-01 00:00:00'
                 THEN 1 ELSE 0 END) AS BIGINT) AS shipdate_in_window
      FROM lineitem)
    SELECT rule, n_checked, n_violations, n_violations = 0 AS pass
    FROM (
      SELECT n_checked, 'qty_in_range' AS rule, qty_in_range AS n_violations FROM a
      UNION ALL
      SELECT n_checked, 'discount_in_range', discount_in_range FROM a
      UNION ALL
      SELECT n_checked, 'tax_below_cap', tax_below_cap FROM a
      UNION ALL
      SELECT n_checked, 'price_positive', price_positive FROM a
      UNION ALL
      SELECT n_checked, 'shipdate_in_window', shipdate_in_window FROM a)
    ORDER BY rule
  """

  // IS NOT DISTINCT FROM = Spark's <=>; NULL bucket matches itself
  val joinNullSafeEq: String = """
    WITH k AS (
      SELECT nullif(user_id % 7, 3) AS k, event_id FROM events),
    a AS (SELECT k, count(*) AS n_a FROM k GROUP BY k),
    b AS (SELECT k AS k_b, count(*) AS n_b FROM k GROUP BY k)
    SELECT a.k, n_a, n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k_b
    ORDER BY a.k NULLS FIRST
  """

  // the backfilled state recomputed declaratively: purchase values ×2
  val pipelineBackfillPartition: String = """
    SELECT event_type, count(*) AS n_events,
           CAST(sum(CAST(CASE WHEN event_type = 'purchase'
                              THEN value * 2 ELSE value END
                         AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type ORDER BY event_type
  """

  // identical last-writer-wins window; trailing delete drops the key
  val pipelineCdcApply: String = """
    WITH log AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
             CAST(value AS DECIMAL(12,2)) AS v
      FROM events WHERE event_type IN ('signup', 'view', 'error')),
    r AS (
      SELECT user_id, ts, op, v,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM log)
    SELECT user_id, CAST(v AS DOUBLE) AS final_value, ts AS last_updated
    FROM r WHERE rn = 1 AND op <> 'D'
    ORDER BY user_id
  """

  // provenance recovered from the path must equal the data partition,
  // so the report is exactly the per-type profile of the raw table
  val scanMetadataColumns: String = """
    SELECT event_type AS path_partition, count(*) AS n_events,
           min(event_id) AS min_event_id, max(event_id) AS max_event_id,
           count(*) AS n_consistent
    FROM events GROUP BY event_type ORDER BY path_partition
  """

  // The SQL-standard definition computed EXPLICITLY (smallest value
  // with cume_dist >= p) rather than DuckDB's quantile_disc, whose
  // floor((n-1)*p) rank can sit one position below Spark's standard
  // percentile_disc (ceil(n*p)) for some (n, p); the two only agreed
  // here because heavy duplication in l_quantity/l_extendedprice put
  // equal values at adjacent ranks. The explicit form is definition-
  // robust at any SF. (cume_dist is rank/n in exact-int division; at
  // equality with p the double is exact, so the >= never flips.)
  val aggPercentileDisc: String = """
    WITH q AS (
      SELECT l_returnflag, l_quantity AS v,
             cume_dist() OVER (PARTITION BY l_returnflag
                               ORDER BY l_quantity) AS cd
      FROM lineitem),
    e AS (
      SELECT l_returnflag, l_extendedprice AS v,
             cume_dist() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice) AS cd
      FROM lineitem)
    SELECT l_returnflag, p25, p50, p75, p95_price
    FROM (SELECT l_returnflag,
                 min(v) FILTER (WHERE cd >= 0.25) AS p25,
                 min(v) FILTER (WHERE cd >= 0.50) AS p50,
                 min(v) FILTER (WHERE cd >= 0.75) AS p75
          FROM q GROUP BY l_returnflag)
    JOIN (SELECT l_returnflag,
                 min(v) FILTER (WHERE cd >= 0.95) AS p95_price
          FROM e GROUP BY l_returnflag) USING (l_returnflag)
    ORDER BY l_returnflag
  """

  // character-class-only pattern: Java and RE2 semantics coincide
  val fnRegexpExtractAll: String = """
    SELECT m, count(*) AS n
    FROM (SELECT unnest(regexp_extract_all(text, '[a-z]+e[a-z]+')) AS m
          FROM documents)
    GROUP BY m ORDER BY n DESC, m LIMIT 30
  """

  // checksum reproduced from the rows alone: sorted lines + trailing \n
  // is exactly what the single-writer text sink emits
  val sourceBinaryfile: String = """
    SELECT CAST(1 AS BIGINT) AS n_files,
           CAST(sum(length(text)) + count(*) AS BIGINT) AS total_bytes,
           md5(string_agg(text, chr(10) ORDER BY text) || chr(10))
             AS content_md5
    FROM documents
  """

  // identical raw-moment → central-moment double expressions
  val aggSkewKurtosis: String = """
    WITH m AS (
      SELECT l_returnflag, count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS s1,
             sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS s2,
             sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS s3,
             sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS s4
      FROM lineitem GROUP BY l_returnflag),
    d AS (
      SELECT l_returnflag, CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS d1,
             CAST(s2 AS DOUBLE) AS d2, CAST(s3 AS DOUBLE) AS d3,
             CAST(s4 AS DOUBLE) AS d4
      FROM m),
    c AS (
      SELECT l_returnflag,
             d1 / nd AS mu,
             d2 / nd - (d1 / nd) * (d1 / nd) AS m2,
             d3 / nd - 3 * (d1 / nd) * (d2 / nd) + 2 * (d1 / nd) * (d1 / nd) * (d1 / nd) AS m3,
             d4 / nd - 4 * (d1 / nd) * (d3 / nd) + 6 * (d1 / nd) * (d1 / nd) * (d2 / nd) - 3 * (d1 / nd) * (d1 / nd) * (d1 / nd) * (d1 / nd) AS m4
      FROM d)
    SELECT l_returnflag, round(mu, 6) AS mean_qty,
           round(m3 / (m2 * sqrt(m2)), 6) AS skewness,
           round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis
    FROM c ORDER BY l_returnflag
  """

  // same single ordered full frame; DISTINCT collapses the per-row copies
  val winNthValue: String = """
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS top_order,
           nth_value(o_orderkey, 2) OVER w AS runnerup_order,
           last_value(o_orderkey) OVER w AS smallest_order,
           count(*) OVER w AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey
  """

  // hash values are definitionally engine-independent
  val fnHashSha: String = """
    SELECT doc_id, sha256(text) AS sha256_hex, md5(text) AS md5_hex,
           substring(sha256(lang || '|' || text), 1, 16) AS salted_prefix
    FROM documents ORDER BY doc_id
  """

  // same d² identity over ::DOUBLE[] lists; ORDER BY raw d² so the
  // comparison (not the rounded display value) decides the top-k
  val simEuclideanTopk: String = """
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings),
    n AS (SELECT vec_id, e, list_inner_product(e, e) AS n2 FROM e)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(sqrt(a.n2 + b.n2 - 2 * list_inner_product(a.e, b.e)), 6)
             AS l2_dist
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    ORDER BY a.n2 + b.n2 - 2 * list_inner_product(a.e, b.e) ASC,
             id_a, id_b
    LIMIT 50
  """

  // identical char-class split; sum cast BIGINT (HUGEINT lesson)
  val textPretokenizeBpe: String = """
    SELECT doc_id, count(*) AS n_pretokens,
           count(DISTINCT tok) AS n_unique,
           CAST(sum(length(tok)) AS BIGINT) AS n_chars
    FROM (SELECT doc_id,
                 unnest(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]+')) AS tok
          FROM documents)
    GROUP BY doc_id ORDER BY doc_id
  """

  // membership via unnest + join; list_distinct mirrors array_distinct
  val joinArrayMembership: String = """
    SELECT term, count(*) AS n_docs,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM (SELECT doc_id,
                 unnest(list_distinct(string_split(text, ' '))) AS term
          FROM documents)
    WHERE term IN ('key', 'table', 'merge', 'spark', 'window')
    GROUP BY term ORDER BY term
  """

  // identical UNPIVOT rotation + exact decimal totals
  val sqlUnpivotClause: String = """
    SELECT l_returnflag, metric,
      CAST(round(sum(CAST(v AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
    FROM (
      SELECT l_returnflag, l_quantity, l_extendedprice, l_tax
      FROM lineitem
    ) UNPIVOT (v FOR metric IN (l_quantity, l_extendedprice, l_tax))
    GROUP BY l_returnflag, metric
    ORDER BY l_returnflag, metric
  """

  // same union-window as-of with the identical integer-µs tolerance CASE
  val joinAsofTolerance: String = """
    WITH u AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'click' THEN event_id END AS click_id,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_um
      FROM events WHERE event_type IN ('click', 'purchase')),
    w AS (
      SELECT *,
        last_value(click_id IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS last_click_id,
        last_value(click_um IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS UNBOUNDED PRECEDING) AS last_click_um
      FROM u)
    SELECT event_id AS purchase_id, user_id,
      CASE WHEN epoch_us(ts) - last_click_um <= 3600000000
           THEN last_click_id END AS click_within_1h,
      CASE WHEN epoch_us(ts) - last_click_um <= 3600000000
           THEN epoch_us(ts) - last_click_um END AS gap_us
    FROM w WHERE event_type = 'purchase'
    ORDER BY purchase_id
  """

  // same day-index − row_number island collapse, pure integer math
  val winStreakLongest: String = """
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '2024-01-01',
                       CAST(date_trunc('day', ts) AS DATE)) AS day_idx
      FROM events),
    runs AS (
      SELECT user_id,
             day_idx - row_number() OVER (PARTITION BY user_id
                                          ORDER BY day_idx) AS island
      FROM days),
    lens AS (
      SELECT user_id, count(*) AS len
      FROM runs GROUP BY user_id, island)
    SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS n_active_days
    FROM lens GROUP BY user_id ORDER BY user_id
  """

  // identical 9dp-rounded lns, exact-decimal OLS moments, one double
  // expression per coefficient (the corr/perplexity protocol)
  val textZipfFit: String = """
    WITH tf AS (
      SELECT term, count(*) AS f
      FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      GROUP BY term),
    ranked AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)), 9) AS DECIMAL(28,9)) AS x,
             CAST(round(ln(CAST(f AS DOUBLE)), 9) AS DECIMAL(28,9)) AS y
      FROM (SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS r
            FROM tf)
      WHERE r <= 200),
    m AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM ranked)
    SELECT CAST(n AS BIGINT) AS n_terms,
      round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
            (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
        AS zipf_slope,
      round((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
            (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
        AS intercept
    FROM m
  """

  // JSON path extraction mirrors Spark's variant_get typed path
  val fnVariant: String = """
    SELECT event_type, count(*) AS n_events,
           min(k) AS min_k, max(k) AS max_k,
           CAST(sum(k) AS BIGINT) AS sum_k,
           count(CASE WHEN k >= 50 THEN 1 END) AS n_high
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    GROUP BY event_type ORDER BY event_type
  """

  // ---- round 9 ----

  // DECIMAL window/total sums -> identical doubles -> one rounded division
  val winRatioToReport: String = """
    WITH c AS (SELECT c_custkey, c_mktsegment,
                      CAST(c_acctbal AS DECIMAL(12,2)) AS bal FROM customer)
    SELECT c_custkey, c_mktsegment,
      CAST(bal AS DOUBLE) AS acctbal,
      floor(CAST(bal AS DOUBLE) /
            CAST(sum(bal) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
            * 1e6 + 0.5) / 1e6 AS share_segment,
      floor(CAST(bal AS DOUBLE) / CAST(sum(bal) OVER () AS DOUBLE)
            * 1e6 + 0.5) / 1e6 AS share_total
    FROM c ORDER BY c_custkey
  """

  // cumulative per-user totals over 3 deterministic micro-batches; the
  // running count is BIGINT-cast (sum(BIGINT) -> HUGEINT, round-7 lesson)
  val streamStatefulTotals: String = """
    WITH b AS (SELECT user_id, event_id % 3 AS batch_id,
                      CAST(value AS DECIMAL(12,2)) AS v FROM events),
    a AS (SELECT user_id, batch_id, count(*) AS bn, sum(v) AS bs
          FROM b GROUP BY user_id, batch_id)
    SELECT user_id, batch_id,
      CAST(sum(bn) OVER (PARTITION BY user_id ORDER BY batch_id) AS BIGINT)
        AS n_events,
      CAST(sum(bs) OVER (PARTITION BY user_id ORDER BY batch_id) AS DOUBLE)
        AS sum_value
    FROM a ORDER BY user_id, batch_id
  """

  // exact-integer ledger: no decimal protocol needed; floor(x/2)
  // folds the 6 arrival files into 3 rate-limited triggers on both
  // engines (event_id >= 0, so % agrees with pmod)
  val streamFileIngestRestart: String = """
    WITH a AS (
      SELECT event_type,
             CAST(floor((event_id % 6) / 2.0) AS BIGINT) AS trigger,
             count(*) AS n_arrived
      FROM events GROUP BY 1, 2)
    SELECT trigger, event_type, n_arrived,
      CAST(sum(n_arrived) OVER (PARTITION BY event_type ORDER BY trigger)
           AS BIGINT) AS n_total
    FROM a ORDER BY trigger, event_type
  """

  // non-overlapping 4-token segments; DuckDB list slicing is 1-based
  // inclusive like Spark's slice, and md5 hex is lowercase on both
  val dedupSegmentExact: String = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    seg AS (SELECT doc_id,
             md5(array_to_string(toks[i*4+1 : i*4+4], ' ')) AS h
            FROM t, LATERAL unnest(range(len(toks)//4)) AS u(i)),
    g AS (SELECT h AS seg_hash, count(*) AS n_copies,
                 count(DISTINCT doc_id) AS n_docs, min(doc_id) AS keep_doc
          FROM seg GROUP BY h)
    SELECT * FROM g WHERE n_copies >= 2 ORDER BY seg_hash
  """

  // exact integer microsecond arithmetic; (ts, event_id) ordering is
  // a total order so lag/cumsum are deterministic on both engines
  val analyticGapsIslands: String = """
    WITH o AS (SELECT user_id, event_id, ts,
          CASE WHEN lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
               OR epoch_us(ts) - epoch_us(lag(ts) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id)) > 600000000
               THEN 1 ELSE 0 END AS brk
        FROM events),
    i AS (SELECT user_id, ts,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
          FROM o)
    SELECT user_id, CAST(island AS BIGINT) AS island, count(*) AS n_events,
           CAST(epoch_us(max(ts)) - epoch_us(min(ts)) AS BIGINT) AS span_us
    FROM i GROUP BY user_id, island ORDER BY user_id, island
  """

  // discrete medians via the cume_dist >= p convention (mirrors SQL-
  // standard percentile_disc; DuckDB's quantile_disc rounds its index
  // differently — same lesson as agg_percentile_disc). med/dev/mad
  // are exact 2dp decimals, so the score division starts from
  // identical doubles on both engines.
  val pipelineAnomalyMad: String = """
    WITH q AS (SELECT event_id, event_type,
                      CAST(value AS DECIMAL(12,2)) AS qv FROM events),
    c AS (SELECT event_type, qv,
                 cume_dist() OVER (PARTITION BY event_type ORDER BY qv) AS cd
          FROM q),
    m AS (SELECT event_type, min(qv) FILTER (WHERE cd >= 0.5) AS med
          FROM c GROUP BY event_type),
    d AS (SELECT q.event_id, q.event_type, q.qv, m.med,
                 abs(q.qv - m.med) AS dev
          FROM q JOIN m USING (event_type)),
    c2 AS (SELECT event_type, dev,
                  cume_dist() OVER (PARTITION BY event_type ORDER BY dev) AS cd
           FROM d),
    md AS (SELECT event_type, min(dev) FILTER (WHERE cd >= 0.5) AS mad
           FROM c2 GROUP BY event_type),
    s AS (SELECT d.event_type,
                 CAST(d.dev AS DOUBLE) / (1.4826 * CAST(md.mad AS DOUBLE))
                   AS score,
                 d.med, md.mad
          FROM d JOIN md USING (event_type))
    SELECT event_type, count(*) AS n_events,
      CAST(max(med) AS DOUBLE) AS med, CAST(max(mad) AS DOUBLE) AS mad,
      CAST(count(CASE WHEN score > 3.0 THEN 1 END) AS BIGINT) AS n_outliers,
      floor(max(score) * 1e6 + 0.5) / 1e6 AS max_score
    FROM s GROUP BY event_type ORDER BY event_type
  """

  // vowel-group count and word count are exact integers; the linear
  // formula is the only float math, floor-quantized at 4dp
  val textReadabilityScore: String = """
    SELECT doc_id,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT) AS n_syllables,
      floor((206.835
        - 1.015 * (CAST(len(string_split(text,' ')) AS DOUBLE) /
                   ceil(CAST(len(string_split(text,' ')) AS DOUBLE) / 15.0))
        - 84.6 * (CAST(len(regexp_extract_all(text, '[aeiou]+')) AS DOUBLE) /
                  CAST(len(string_split(text,' ')) AS DOUBLE)))
        * 1e4 + 0.5) / 1e4 AS flesch
    FROM documents ORDER BY doc_id
  """

  // same top-3-neighbour graph construction: weight ties broken by id
  // (total order), so the edge set — and thus the triangle set — is a
  // pure function of the data on both engines
  val graphTriangleCount: String = """
    WITH ps AS (SELECT DISTINCT l_partkey p, l_suppkey s FROM lineitem),
    w AS (SELECT a.s u, b.s v, count(*) w FROM ps a
          JOIN ps b ON a.p = b.p AND a.s <> b.s GROUP BY 1, 2),
    topk AS (SELECT u, v FROM (
               SELECT u, v, row_number() OVER
                 (PARTITION BY u ORDER BY w DESC, v) rk FROM w)
             WHERE rk <= 3),
    und AS (SELECT DISTINCT least(u, v) u, greatest(u, v) v FROM topk),
    tri AS (SELECT a.u x, a.v y, b.v z FROM und a
            JOIN und b ON a.u = b.u AND a.v < b.v
            JOIN und c ON c.u = a.v AND c.v = b.v)
    SELECT supplier, count(*) AS n_triangles FROM (
      SELECT x AS supplier FROM tri UNION ALL
      SELECT y FROM tri UNION ALL SELECT z FROM tri)
    GROUP BY supplier ORDER BY supplier
  """

  // FP-Growth's min count is ceil(minSupport * n_baskets) computed in
  // IEEE double — 1/64 is exact in binary, so the same expression here
  // yields the identical threshold; singleton support = presence
  // census, pair support = in-basket self-join, both exact counts
  val mlFpmFrequentPairs: String = """
    WITH b AS (SELECT DISTINCT l_orderkey o, p_brand i
               FROM lineitem JOIN part ON l_partkey = p_partkey),
    th AS (SELECT CAST(ceil(0.015625 * count(DISTINCT o)) AS BIGINT) t
           FROM b),
    s1 AS (SELECT i AS item1, CAST(NULL AS VARCHAR) AS item2,
                  count(*) AS freq FROM b GROUP BY 1),
    s2 AS (SELECT a.i AS item1, c.i AS item2, count(*) AS freq
           FROM b a JOIN b c ON a.o = c.o AND a.i < c.i GROUP BY 1, 2)
    SELECT item1, item2, freq
    FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2), th
    WHERE freq >= t ORDER BY item1, item2
  """

  // identical exact-decimal-moments recipe as aggCorrPairs, over lead
  // pairs on the (ts, event_id) total order
  val tsAutocorr: String = """
    WITH q AS (SELECT event_type, ts, event_id,
                      CAST(value AS DECIMAL(12,2)) x FROM events),
    l AS (SELECT event_type, x,
            lead(x, 1) OVER w y1, lead(x, 2) OVER w y2,
            lead(x, 3) OVER w y3
          FROM q WINDOW w AS (PARTITION BY event_type
                              ORDER BY ts, event_id)),
    p AS (SELECT event_type, 1 AS lag, x, y1 AS y FROM l
          UNION ALL SELECT event_type, 2, x, y2 FROM l
          UNION ALL SELECT event_type, 3, x, y3 FROM l),
    m AS (SELECT event_type, lag, count(*) n_pairs,
                 sum(x) sx, sum(y) sy, sum(x*x) sxx, sum(y*y) syy,
                 sum(x*y) sxy
          FROM p WHERE y IS NOT NULL GROUP BY 1, 2)
    SELECT event_type, lag, n_pairs,
      round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
          * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
    FROM m ORDER BY event_type, lag
  """

  // the observed counters are plain aggregates of the same pass
  val pipelineObserveMetrics: String = """
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
      CAST(count(CASE WHEN len(text) > 500 THEN 1 END) AS BIGINT)
        AS n_long,
      CAST(count(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT) AS n_en,
      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents
  """

  // revenue sums stay DECIMAL until the final DOUBLE cast (hash-type
  // protocol); the December rollover mirrors the Spark CASE exactly
  val scaleExchangeReuse: String = """
    WITH m AS (SELECT year(o_orderdate) * 100 + month(o_orderdate) ym,
                      sum(CAST(o_totalprice AS DECIMAL(12,2))) rev
               FROM orders GROUP BY 1),
    nx AS (SELECT CASE WHEN ym % 100 = 12 THEN ym + 89 ELSE ym + 1 END ym,
                  rev AS prev_rev FROM m)
    SELECT m.ym, CAST(m.rev AS DOUBLE) AS rev,
      CAST(nx.prev_rev AS DOUBLE) AS prev_rev,
      round(CAST(m.rev - nx.prev_rev AS DOUBLE)
        / CAST(nx.prev_rev AS DOUBLE), 6) AS growth
    FROM m JOIN nx USING (ym) ORDER BY m.ym
  """

  // isodow on both engines (native dayofweek numberings disagree);
  // interval-month addition clamps end-of-month exactly like add_months
  val fnDatetimeExtras: String = """
    SELECT o_orderkey,
      CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      last_day(CAST(o_orderdate AS DATE)) AS month_end,
      CAST(quarter(o_orderdate) AS BIGINT) AS q,
      CAST(isodow(CAST(o_orderdate AS DATE)) AS BIGINT) AS isodow,
      CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
      CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start
    FROM orders ORDER BY o_orderkey
  """

  // normalization chain order matches the Spark side exactly; each
  // pattern matches at most once, so DuckDB's first-match
  // regexp_replace equals Spark's replace-all
  val dedupUrlCanonicalize: String = """
    WITH u AS (
      SELECT doc_id,
        (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://WWW.'
              WHEN doc_id % 3 = 1 THEN 'https://'
              ELSE 'https://www.' END)
        || source || '.Example.COM'
        || (CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE '' END)
        || '/doc/' || CAST(doc_id % 50 AS VARCHAR)
        || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
        || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&utm_campaign=x'
                 ELSE '' END)
        || (CASE WHEN doc_id % 7 = 0 THEN '#sec2' ELSE '' END) AS url
      FROM documents),
    c AS (
      SELECT doc_id, url,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(lower(url), '#.*', ''), '\?utm.*', ''),
          '/$', ''), ':443', ''), '://www\.', '://') AS canon
      FROM u)
    SELECT canon, count(*) AS n_aliases, min(doc_id) AS canonical_doc,
           count(DISTINCT url) AS n_distinct_raw
    FROM c GROUP BY canon ORDER BY canon
  """

  // entropy via the ln-protocol: every ln rounded to 9dp, accumulated
  // in DECIMAL, one double conversion at the end
  val pipelineDatasetCard: String = """
    WITH d AS (
      SELECT source, lang, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    s AS (SELECT source, count(*) AS n_docs,
                 CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars
          FROM d GROUP BY source),
    l AS (SELECT source, lang, count(*) AS cnt FROM d GROUP BY source, lang),
    e AS (SELECT source, count(DISTINCT lang) AS n_langs,
                 sum(CAST(cnt AS DECIMAL(9,0))
                     * CAST(round(ln(CAST(cnt AS DOUBLE)), 9)
                            AS DECIMAL(27,9))) AS s_nlnn
          FROM l GROUP BY source)
    SELECT s.source, n_docs, total_tokens, CAST(n_langs AS BIGINT) AS n_langs,
      floor((CAST(CAST(round(ln(CAST(n_docs AS DOUBLE)), 9) AS DECIMAL(28,9))
                  AS DOUBLE)
             - CAST(s_nlnn AS DOUBLE) / CAST(n_docs AS DOUBLE))
            * 1e6 + 0.5) / 1e6 AS lang_entropy,
      floor(CAST(total_chars AS DOUBLE) / CAST(n_docs AS DOUBLE)
            * 1e4 + 0.5) / 1e4 AS avg_chars
    FROM s JOIN e ON s.source = e.source
    ORDER BY s.source
  """

  // GROUP BY ALL / ORDER BY ALL are native DuckDB syntax
  val sqlOrderByAll: String = """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
  """

  val pipelineLabelBalanceWeights: String = """
    WITH t AS (SELECT label, count(*) AS n_examples
               FROM embeddings GROUP BY label),
    tot AS (SELECT CAST(sum(n_examples) AS BIGINT) AS n_total,
                   count(*) AS n_classes FROM t)
    SELECT label, n_examples,
      floor(CAST(n_total AS DOUBLE) / CAST(n_classes * n_examples AS DOUBLE)
            * 1e6 + 0.5) / 1e6 AS class_weight
    FROM t, tot ORDER BY label
  """

  // exact integer staleness in microseconds (epoch_us both engines)
  val pipelineFreshnessAudit: String = """
    WITH p AS (SELECT event_type, count(*) AS n_events, max(ts) AS last_ts
               FROM events GROUP BY event_type),
    g AS (SELECT max(last_ts) AS global_last FROM p)
    SELECT event_type, n_events, last_ts,
      epoch_us(global_last) - epoch_us(last_ts) AS staleness_us
    FROM p, g ORDER BY event_type
  """

  // per-bucket PSI terms 12dp-quantized into DECIMAL before the sum,
  // so accumulation order cannot move the total (round-9 protocol)
  val pipelineDriftPsi: String = """
    WITH b AS (
      SELECT CASE WHEN ts < TIMESTAMP '2024-01-15 00:00:00'
                  THEN 'a' ELSE 'b' END AS half,
             CAST(least(9, floor(value / 50)) AS INTEGER) AS bucket
      FROM events),
    c AS (SELECT bucket,
                 count(CASE WHEN half = 'a' THEN 1 END) AS na,
                 count(CASE WHEN half = 'b' THEN 1 END) AS nb
          FROM b GROUP BY bucket),
    tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta,
                   CAST(sum(nb) AS BIGINT) AS tb FROM c),
    terms AS (
      SELECT CAST(floor(
        ((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)) -
         (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))) *
        CAST(CAST(round(ln((CAST(na AS DOUBLE) / CAST(ta AS DOUBLE)) /
                           (CAST(nb AS DOUBLE) / CAST(tb AS DOUBLE))), 9)
                  AS DECIMAL(28,9)) AS DOUBLE)
        * 1e12 + 0.5) / 1e12 AS DECIMAL(24,12)) AS term
      FROM c, tot WHERE na > 0 AND nb > 0)
    SELECT count(*) AS n_buckets_used,
           floor(CAST(sum(term) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS psi
    FROM terms
  """

  // result-identity with the plain join (the bloom filter is a pure
  // shuffle reducer, never a semantics change)
  val scaleRuntimeBloomJoin: String = """
    SELECT o_custkey, count(*) AS n_items,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_custkey ORDER BY o_custkey
  """

  // DuckDB plans EXISTS-in-projection as a native MARK join
  val joinMarkExistence: String = """
    SELECT c_custkey, c_mktsegment,
           EXISTS(SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             AS has_orders
    FROM customer ORDER BY c_custkey
  """

  // percentile_disc boundaries emulated with the cume_dist recipe
  // (same as aggPercentileDisc); scores are exact comparisons on
  // integer days / counts / DECIMAL(12,2) sums
  val analyticRfmSegment: String = """
    WITH c AS (
      SELECT o_custkey AS custkey,
             max(CAST(o_orderdate AS DATE)) AS last_order,
             count(*) AS frequency,
             sum(CAST(o_totalprice AS DECIMAL(12,2))) AS monetary0
      FROM orders GROUP BY o_custkey),
    a AS (SELECT max(last_order) AS anchor FROM c),
    r AS (SELECT custkey,
                 date_diff('day', last_order, anchor) AS recency_days,
                 frequency, monetary0
          FROM c CROSS JOIN a),
    qr AS (SELECT recency_days AS v,
                  cume_dist() OVER (ORDER BY recency_days) AS cd FROM r),
    qf AS (SELECT frequency AS v,
                  cume_dist() OVER (ORDER BY frequency) AS cd FROM r),
    qm AS (SELECT monetary0 AS v,
                  cume_dist() OVER (ORDER BY monetary0) AS cd FROM r),
    q AS (SELECT
      (SELECT min(v) FROM qr WHERE cd >= 0.25) AS rq1,
      (SELECT min(v) FROM qr WHERE cd >= 0.50) AS rq2,
      (SELECT min(v) FROM qr WHERE cd >= 0.75) AS rq3,
      (SELECT min(v) FROM qf WHERE cd >= 0.25) AS fq1,
      (SELECT min(v) FROM qf WHERE cd >= 0.50) AS fq2,
      (SELECT min(v) FROM qf WHERE cd >= 0.75) AS fq3,
      (SELECT min(v) FROM qm WHERE cd >= 0.25) AS mq1,
      (SELECT min(v) FROM qm WHERE cd >= 0.50) AS mq2,
      (SELECT min(v) FROM qm WHERE cd >= 0.75) AS mq3)
    SELECT custkey, recency_days, frequency,
           CAST(monetary0 AS DOUBLE) AS monetary,
           CASE WHEN recency_days <= rq1 THEN 4
                WHEN recency_days <= rq2 THEN 3
                WHEN recency_days <= rq3 THEN 2 ELSE 1 END AS r_score,
           CASE WHEN frequency <= fq1 THEN 1
                WHEN frequency <= fq2 THEN 2
                WHEN frequency <= fq3 THEN 3 ELSE 4 END AS f_score,
           CASE WHEN monetary0 <= mq1 THEN 1
                WHEN monetary0 <= mq2 THEN 2
                WHEN monetary0 <= mq3 THEN 3 ELSE 4 END AS m_score,
           concat(
             CAST(CASE WHEN recency_days <= rq1 THEN 4
                       WHEN recency_days <= rq2 THEN 3
                       WHEN recency_days <= rq3 THEN 2 ELSE 1 END AS VARCHAR),
             CAST(CASE WHEN frequency <= fq1 THEN 1
                       WHEN frequency <= fq2 THEN 2
                       WHEN frequency <= fq3 THEN 3 ELSE 4 END AS VARCHAR),
             CAST(CASE WHEN monetary0 <= mq1 THEN 1
                       WHEN monetary0 <= mq2 THEN 2
                       WHEN monetary0 <= mq3 THEN 3 ELSE 4 END AS VARCHAR))
             AS rfm
    FROM r CROSS JOIN q ORDER BY custkey
  """

  // the oracle states the cumulative share as ONE plain window — the
  // Spark side's bucketed two-phase prefix sum must equal it exactly
  // (bucket = floor(rev/1024) is order-compatible with rev DESC)
  val analyticParetoAbc: String = """
    WITH rev AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1.00 AS DECIMAL(3,2)) -
                       CAST(l_discount AS DECIMAL(4,2))))
                  AS DECIMAL(28,4)) AS rev
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT CAST(sum(rev) AS DECIMAL(28,4)) AS totc FROM rev),
    c AS (SELECT l_partkey, rev,
            CAST(sum(rev) OVER (ORDER BY rev DESC, l_partkey
                 ROWS UNBOUNDED PRECEDING) AS DECIMAL(28,4)) AS cum_rev
          FROM rev)
    SELECT l_partkey, CAST(rev AS DOUBLE) AS rev,
           CAST(cum_rev AS DOUBLE) AS cum_rev,
           round(CAST(cum_rev AS DOUBLE) / CAST(totc AS DOUBLE), 6)
             AS share,
           CASE WHEN cum_rev * 5 <= totc * 4 THEN 'A'
                WHEN cum_rev * 20 <= totc * 19 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c CROSS JOIN t
    ORDER BY rev DESC, l_partkey
  """

  // exact-DECIMAL regression moments; slope formula evaluated once on
  // doubles (identical IEEE sequence both engines)
  val tsTrendSlope: String = """
    WITH m AS (
      SELECT l_suppkey,
             (year(l_shipdate) - 1995) * 12 + month(l_shipdate) - 1 AS m,
             sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
      FROM lineitem GROUP BY 1, 2),
    mo AS (SELECT l_suppkey, count(*) AS n_months,
                  sum(m) AS sm, sum(rev) AS sr,
                  sum(m * m) AS smm, sum(rev * m) AS smr
           FROM m GROUP BY 1
           HAVING count(*) >= 2
              AND count(*) * sum(m * m) <> sum(m) * sum(m))
    SELECT l_suppkey, CAST(n_months AS BIGINT) AS n_months,
      round((CAST(n_months AS DOUBLE) * CAST(smr AS DOUBLE)
          - CAST(sm AS DOUBLE) * CAST(sr AS DOUBLE))
        / (CAST(n_months AS DOUBLE) * CAST(smm AS DOUBLE)
          - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)), 6) AS slope
    FROM mo ORDER BY l_suppkey
  """

  // isodow(): 1=Monday..7=Sunday — the Spark side maps dayofweek
  // (1=Sunday) through ((dow+5) % 7) + 1 to the same numbering
  val tsSeasonalIndex: String = """
    WITH d AS (SELECT CAST(ts AS DATE) AS d, count(*) AS cnt
               FROM events GROUP BY 1),
    o AS (SELECT CAST(sum(cnt) AS BIGINT) AS te,
                 CAST(count(*) AS BIGINT) AS td FROM d)
    SELECT isodow(d) AS isodow,
           CAST(sum(cnt) AS BIGINT) AS dow_events,
           CAST(count(*) AS BIGINT) AS dow_days,
           round((CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE))
             / (CAST(te AS DOUBLE) / CAST(td AS DOUBLE)), 6)
             AS seasonal_index
    FROM d CROSS JOIN o
    GROUP BY isodow(d), te, td
    ORDER BY isodow
  """

  // md5-hex-prefix uniform (the reservoir-hash recipe): DuckDB parses
  // the 6 hex chars via the 0x-prefixed string cast
  val sampleWeighted: String = """
    WITH mx AS (SELECT max(o_totalprice) AS mx FROM orders),
    s AS (SELECT o_orderpriority, o_totalprice,
                 CAST(CAST(concat('0x', substring(
                        md5(CAST(o_orderkey AS VARCHAR)), 1, 6))
                      AS BIGINT) AS DOUBLE) / 16777216.0 AS u,
                 o_totalprice / mx AS w
          FROM orders CROSS JOIN mx)
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_total,
           CAST(count(CASE WHEN u < w THEN 1 END) AS BIGINT) AS n_sampled,
           CAST(sum(CASE WHEN u < w
                         THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                AS DOUBLE) AS sampled_value
    FROM s GROUP BY 1 ORDER BY 1
  """

  // shared CTE prefix: the k-NN-thinned co-supply graph (identical to
  // graphTriangleCount's construction). MATERIALIZED: consumers that
  // reference their downstream CTEs more than once (the unrolled
  // k-core peel doubles references each round) would otherwise inline
  // and re-run the expensive co-supply self-join exponentially many
  // times — round-11 hit a DuckDB temp-disk blowup exactly this way.
  private val thinnedGraphCte = """
    ps AS MATERIALIZED (SELECT DISTINCT l_partkey p, l_suppkey s FROM lineitem),
    w AS MATERIALIZED (SELECT a.s u, b.s v, count(*) w FROM ps a
          JOIN ps b ON a.p = b.p AND a.s <> b.s GROUP BY 1, 2),
    topk AS (SELECT u, v FROM (
               SELECT u, v, row_number() OVER
                 (PARTITION BY u ORDER BY w DESC, v) rk FROM w)
             WHERE rk <= 3),
    und AS MATERIALIZED (SELECT DISTINCT least(u, v) u, greatest(u, v) v FROM topk)"""

  val graphDegreeDistribution: String = s"""
    WITH $thinnedGraphCte,
    deg AS (SELECT node, count(*) AS degree FROM (
              SELECT u AS node FROM und UNION ALL SELECT v FROM und)
            GROUP BY node)
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree ORDER BY degree
  """

  // path-enumerating recursive CTE, bounded at 4 hops — min over all
  // ≤4-hop paths equals the Spark side's frontier BFS level
  val graphShortestPath: String = s"""
    WITH RECURSIVE $thinnedGraphCte,
    adj AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    seed AS (SELECT min(node) s FROM (
               SELECT u AS node FROM und UNION ALL SELECT v FROM und)),
    bfs(node, d) AS (
      SELECT s, 0 FROM seed
      UNION ALL
      SELECT adj.b, bfs.d + 1 FROM bfs JOIN adj ON adj.a = bfs.node
      WHERE bfs.d < 4)
    SELECT node, min(d) AS dist FROM bfs GROUP BY node ORDER BY node
  """

  val dedupBlockingEdit: String = """
    WITH d AS (SELECT doc_id, lang,
                      string_split(text, ' ')[1] AS tok0,
                      len(text) - len(text) % 100 AS lb,
                      substring(text, 1, 60) AS pre
               FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.lang,
           levenshtein(a.pre, b.pre) AS edit_dist
    FROM d a JOIN d b
      ON a.lang = b.lang AND a.tok0 = b.tok0 AND a.lb = b.lb
     AND a.doc_id < b.doc_id
    WHERE levenshtein(a.pre, b.pre) <= 25
    ORDER BY doc_a, doc_b
  """

  val simRangeSearch: String = s"""
    SELECT vec_id, cosine FROM (
      SELECT b.vec_id AS vec_id, ROUND($cosExpr, 6) AS cosine
      FROM embeddings a JOIN embeddings b
        ON a.vec_id = 0 AND b.vec_id <> 0)
    WHERE cosine >= 0.15
    ORDER BY cosine DESC, vec_id
  """

  val textHapaxRatio: String = """
    WITH tf AS (SELECT lang, unnest(string_split(text, ' ')) AS term
                FROM documents),
    tc AS (SELECT lang, term, count(*) AS f FROM tf GROUP BY 1, 2)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_terms,
           CAST(count(CASE WHEN f = 1 THEN 1 END) AS BIGINT) AS n_hapax,
           round(CAST(count(CASE WHEN f = 1 THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_ratio
    FROM tc GROUP BY lang ORDER BY lang
  """

  // shared exact-CUSUM CTE prefix (ts_cusum + ts_changepoint):
  // D_k = n·prefix_k − k·S stays exact DECIMAL
  private val cusumCte = """
    ev AS (SELECT event_type, ts, event_id,
                  CAST(value AS DECIMAL(12,2)) x FROM events),
    tot AS (SELECT event_type, count(*) n,
                   CAST(sum(x) AS DECIMAL(18,2)) s FROM ev GROUP BY 1),
    cum AS (SELECT e.event_type,
              CAST(sum(x) OVER (PARTITION BY e.event_type
                   ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
                   AS DECIMAL(18,2)) AS prefix,
              row_number() OVER (PARTITION BY e.event_type
                                 ORDER BY ts, event_id) AS k,
              t.n, t.s
            FROM ev e JOIN tot t ON e.event_type = t.event_type),
    d AS (SELECT event_type, n, k, prefix * n - s * k AS d FROM cum)"""

  val tsCusum: String = s"""
    WITH $cusumCte
    SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      round(CAST(max(d) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6) AS max_up,
      round(CAST(min(d) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6) AS max_down
    FROM d GROUP BY event_type ORDER BY event_type
  """

  // plain one-window prefix-min statement of the Spark side's
  // two-phase bucketed sweep; comparisons only, no arithmetic
  val analyticSkyline2d: String = """
    WITH p AS (SELECT p_partkey, p_retailprice AS price, p_size AS sz
               FROM part),
    g AS (SELECT price, min(sz) AS m2 FROM p GROUP BY price),
    m AS (SELECT price, m2,
            min(m2) OVER (ORDER BY price
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
          FROM g)
    SELECT p_partkey, price, sz AS size
    FROM p JOIN m USING (price)
    WHERE sz < coalesce(m1, 2147483647) AND NOT (m2 < sz)
    ORDER BY price, size, p_partkey
  """

  // exact-DECIMAL CUSUM argmax; abs() on DECIMAL stays exact
  val tsChangepoint: String = s"""
    WITH $cusumCte,
    r AS (SELECT event_type, n, k, d,
            row_number() OVER (PARTITION BY event_type
                               ORDER BY abs(d) DESC, k) AS rk
          FROM d)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(k AS BIGINT) AS k_star,
           round(CAST(d AS DOUBLE) / CAST(n AS DOUBLE), 6) AS excursion
    FROM r WHERE rk = 1 ORDER BY event_type
  """

  // percentile_disc boundaries emulated with the cume_dist recipe
  val pipelineSkewReport: String = """
    WITH per_key AS (
      SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
    mx AS (SELECT max(cnt) AS m FROM per_key),
    q AS (SELECT cnt AS v, cume_dist() OVER (ORDER BY cnt) AS cd
          FROM per_key)
    SELECT
      CAST(count(*) AS BIGINT) AS n_keys,
      CAST(sum(cnt) AS BIGINT) AS n_rows,
      CAST(max(cnt) AS BIGINT) AS max_rows,
      (SELECT min(l_suppkey) FROM per_key CROSS JOIN mx
        WHERE cnt = m) AS heavy_key,
      round(CAST(max(cnt) AS DOUBLE) /
        (CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
        AS skew_ratio,
      CAST((SELECT min(v) FROM q WHERE cd >= 0.50) AS BIGINT) AS p50_rows,
      CAST((SELECT min(v) FROM q WHERE cd >= 0.99) AS BIGINT) AS p99_rows
    FROM per_key
  """

  val textNgramNovelty: String = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
    bgs AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS bg
            FROM toks),
    df AS (SELECT bg, count(*) AS dfreq FROM bgs GROUP BY bg)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(count(CASE WHEN dfreq = 1 THEN 1 END) AS BIGINT) AS n_novel,
           round(CAST(count(CASE WHEN dfreq = 1 THEN 1 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS novelty
    FROM bgs JOIN df USING (bg)
    GROUP BY doc_id ORDER BY doc_id
  """

  // integer `//` division mirrors Spark's `div` exactly (the
  // double-division + cast path rounds on DuckDB, truncates on Spark)
  val analyticCohortLtv: String = """
    WITH o AS (SELECT o_custkey,
                      year(o_orderdate) * 12 + month(o_orderdate) AS m,
                      CAST(o_totalprice AS DECIMAL(12,2)) AS rev
               FROM orders),
    c AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
    s AS (SELECT cm, count(*) AS n_cust FROM c GROUP BY 1),
    cur AS (SELECT cm, m - cm AS month_offset, sum(rev) AS rev
            FROM o JOIN c USING (o_custkey) GROUP BY 1, 2),
    cum AS (SELECT cm, month_offset,
              sum(rev) OVER (PARTITION BY cm ORDER BY month_offset
                ROWS UNBOUNDED PRECEDING) AS cum_rev
            FROM cur)
    SELECT (cm - 1) // 12 * 100 + ((cm - 1) % 12 + 1) AS cohort_ym,
           month_offset, CAST(n_cust AS BIGINT) AS n_cust,
           round(CAST(cum_rev AS DOUBLE) / CAST(n_cust AS DOUBLE), 6)
             AS ltv_per_cust
    FROM cum JOIN s USING (cm)
    ORDER BY cohort_ym, month_offset
  """

  // duration via date_diff('second', …) = difference of truncated
  // epoch seconds, matching Spark's CAST(ts AS BIGINT) subtraction
  val analyticSessionizeSql: String = """
    WITH f AS (SELECT user_id, ts, event_id, event_type,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (SELECT user_id, ts, event_id, event_type,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS session_id
      FROM f),
    r AS (SELECT user_id, session_id, count(*) AS n_events,
            date_diff('second', min(ts), max(ts)) AS duration_s
          FROM g GROUP BY 1, 2),
    ft AS (SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rk
           FROM g)
    SELECT r.user_id, CAST(r.session_id AS BIGINT) AS session_id,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(duration_s AS BIGINT) AS duration_s,
           ft.event_type AS first_type
    FROM r JOIN ft ON r.user_id = ft.user_id
       AND r.session_id = ft.session_id AND ft.rk = 1
    ORDER BY r.user_id, r.session_id
  """

  // rare-term candidate generation + exact-DECIMAL tf-idf dot products
  // (the repo's ln-9dp protocol); one double division per pair
  val simSparseTfidfPairs: String = """
    WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
                  SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
                GROUP BY 1, 2),
    nn AS (SELECT count(*) AS n FROM documents),
    dfq AS (SELECT term, count(*) AS dfq FROM tf GROUP BY 1),
    w AS (SELECT doc_id, term, dfq,
            CAST(tf * CAST(round(ln(CAST(n AS DOUBLE) /
                                    CAST(dfq AS DOUBLE)), 9)
                           AS DECIMAL(13,9)) AS DECIMAL(16,9)) AS w
          FROM tf JOIN dfq USING (term) CROSS JOIN nn),
    norms AS (SELECT doc_id, sum(w * w) AS n2 FROM w GROUP BY 1),
    toksb AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bgs AS (SELECT DISTINCT doc_id,
              unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i+1])) AS bg
            FROM toksb),
    rb AS (SELECT bg FROM bgs GROUP BY bg
           HAVING count(*) BETWEEN 2 AND 5),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bgs a JOIN bgs b
               ON a.bg = b.bg AND a.doc_id < b.doc_id
             JOIN rb ON rb.bg = a.bg),
    dots AS (SELECT doc_a, doc_b, sum(wa.w * wb.w) AS dot
             FROM cand JOIN w wa ON wa.doc_id = doc_a
                       JOIN w wb ON wb.doc_id = doc_b
                                AND wb.term = wa.term
             GROUP BY 1, 2)
    SELECT doc_a, doc_b, cosine FROM (
      SELECT doc_a, doc_b,
        round(CAST(dot AS DOUBLE) /
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))), 6)
          AS cosine
      FROM dots JOIN norms na ON na.doc_id = doc_a
                JOIN norms nb ON nb.doc_id = doc_b
      ORDER BY cosine DESC, doc_a, doc_b LIMIT 20)
    ORDER BY cosine DESC, doc_a, doc_b
  """

  // result identity — the AQE coalescing the op demonstrates is a
  // physical-plan property pinned in PlanSpec, never a semantics change
  val scaleAqeCoalesce: String = """
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
             AS revenue
    FROM orders WHERE o_totalprice > 490000.0
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """

  // H = (n·ln n − Σ c·ln c)/n with the ln-9dp DECIMAL protocol
  val textCharEntropy: String = """
    WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
                FROM documents),
    cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
    agg AS (SELECT doc_id, sum(c) AS n,
              sum(c * CAST(round(ln(CAST(c AS DOUBLE)), 9)
                           AS DECIMAL(13,9))) AS s
            FROM cc GROUP BY 1)
    SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
      round((CAST(n AS DOUBLE) *
          CAST(CAST(round(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(13,9))
               AS DOUBLE)
        - CAST(s AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS char_entropy
    FROM agg ORDER BY doc_id
  """

  val analyticBasketLift: String = """
    WITH b AS (SELECT DISTINCT l_orderkey, p_brand
               FROM lineitem JOIN part ON l_partkey = p_partkey),
    nb AS (SELECT count(*) AS n FROM orders),
    s AS (SELECT p_brand, count(*) AS c FROM b GROUP BY 1),
    p AS (SELECT x.p_brand AS brand_a, y.p_brand AS brand_b,
                 count(*) AS c_ab
          FROM b x JOIN b y
            ON x.l_orderkey = y.l_orderkey AND x.p_brand < y.p_brand
          GROUP BY 1, 2 HAVING count(*) >= 10)
    SELECT brand_a, brand_b, CAST(c_ab AS BIGINT) AS c_ab,
      round(CAST(n AS DOUBLE) * CAST(c_ab AS DOUBLE) /
        (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)), 6) AS lift
    FROM p JOIN s sa ON sa.p_brand = brand_a
           JOIN s sb ON sb.p_brand = brand_b
           CROSS JOIN nb
    ORDER BY lift DESC, brand_a, brand_b
  """

  val pipelineKanonymity: String = """
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS class_size,
           count(*) >= 5 AS k5_anonymous,
           round(1.0 / CAST(count(*) AS DOUBLE), 6) AS reid_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
  """

  // mirrors the op's explicit sorted-frame interpolation (DuckDB's
  // native windowed median types decimals differently)
  val winRollingMedian: String = """
    WITH q AS (SELECT event_type, ts, event_id,
                      CAST(value AS DECIMAL(12,2)) AS x FROM events),
    f AS (SELECT event_type, event_id,
            list_sort(list(x) OVER (PARTITION BY event_type
              ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS fr
          FROM q)
    SELECT event_type, event_id,
      round(CASE WHEN len(fr) % 2 = 1
        THEN CAST(fr[len(fr) // 2 + 1] AS DOUBLE)
        ELSE (CAST(fr[len(fr) // 2] AS DOUBLE)
            + CAST(fr[len(fr) // 2 + 1] AS DOUBLE)) / 2
      END, 6) AS rolling_median
    FROM f ORDER BY event_type, event_id
  """

  // same grid equi-join as the op (the brute-force theta join would be
  // O(n²) even for the oracle); r² = 0.0625 exact in double
  val joinSpatialGrid: String = """
    WITH pts AS (SELECT p_partkey AS id, p_retailprice / 100.0 AS x,
                        CAST(p_size AS DOUBLE) AS y FROM part),
    c AS (SELECT id, x, y,
            CAST(floor(x / 0.25) AS BIGINT) AS cx,
            CAST(floor(y / 0.25) AS BIGINT) AS cy FROM pts),
    probes AS (SELECT id AS id_a, x AS xa, y AS ya,
                 cx + dx AS cx, cy + dy AS cy
               FROM c CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dx) dxs
                     CROSS JOIN (SELECT unnest([-1, 0, 1]) AS dy) dys)
    SELECT id_a AS p_partkey, CAST(count(*) AS BIGINT) AS n_neighbors
    FROM probes JOIN c b ON probes.cx = b.cx AND probes.cy = b.cy
    WHERE id_a <> b.id
      AND (xa - b.x) * (xa - b.x) + (ya - b.y) * (ya - b.y) <= 0.0625
    GROUP BY id_a ORDER BY id_a
  """

  val fnFormatPatterns: String = """
    SELECT o_orderkey,
      strftime(o_orderdate, '%Y-%m') AS ym_str,
      strftime(o_orderdate, '%Y-%m-%d') AS date_str,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
      lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
      concat(o_orderstatus, '/', o_orderpriority) AS status_tag
    FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey
  """

  val fnTryCast: String = """
    WITH s AS (SELECT event_type,
        CASE WHEN event_id % 3 = 0 THEN CAST(event_id AS VARCHAR)
             WHEN event_id % 3 = 1 THEN concat('#', CAST(event_id AS VARCHAR))
             ELSE concat('  ', CAST(event_id AS VARCHAR), '  ') END AS raw
      FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
      CAST(count(TRY_CAST(raw AS BIGINT)) AS BIGINT) AS n_parsed,
      CAST(count(CASE WHEN TRY_CAST(raw AS BIGINT) IS NULL THEN 1 END)
           AS BIGINT) AS n_rejected,
      CAST(sum(TRY_CAST(raw AS BIGINT)) AS BIGINT) AS sum_parsed
    FROM s GROUP BY event_type ORDER BY event_type
  """

  // time_bucket's 2000-01-01 origin sits on the same 15-min epoch grid
  // as Spark's window(), so the buckets coincide exactly
  val streamChainedWindows: String = """
    WITH m AS (SELECT time_bucket(INTERVAL 15 MINUTE, ts) AS w15,
                      event_type, count(*) AS n15
               FROM events GROUP BY 1, 2)
    SELECT date_trunc('hour', w15) AS win_start, event_type,
           CAST(max(n15) AS BIGINT) AS max_15m,
           CAST(sum(n15) AS BIGINT) AS total_n
    FROM m GROUP BY 1, 2 ORDER BY 1, 2
  """

  val aggHistogram2d: String = """
    SELECT CAST(floor(p_retailprice / 200.0) AS BIGINT) AS price_bin,
           CAST(floor(p_size / 10.0) AS BIGINT) AS size_bin,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
             AS bin_value
    FROM part GROUP BY 1, 2 ORDER BY 1, 2
  """

  // zero-variance exclusion on exact DECIMAL (sxx*20 - sx*sx), never
  // on the double sqrt
  val tsRollingZscore: String = """
    WITH q AS (SELECT event_type, ts, event_id,
                      CAST(value AS DECIMAL(12,2)) x FROM events),
    f AS (SELECT event_type, event_id, x,
            count(*) OVER w AS nf,
            CAST(sum(x) OVER w AS DECIMAL(18,2)) AS sx,
            CAST(sum(x * x) OVER w AS DECIMAL(28,4)) AS sxx
          FROM q WINDOW w AS (PARTITION BY event_type
            ORDER BY ts, event_id
            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
    SELECT event_type, event_id,
      round((CAST(x AS DOUBLE) - CAST(sx AS DOUBLE) / 20)
        / sqrt((20 * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / (20 * 19)), 6)
        AS zscore
    FROM f WHERE nf = 20 AND sxx * 20 - sx * sx > 0
    ORDER BY event_type, event_id
  """

  val textWordlenProfile: String = """
    WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS tok
               FROM documents)
    SELECT lang, length(tok) AS wlen,
           CAST(count(*) AS BIGINT) AS n_tokens
    FROM t GROUP BY 1, 2 ORDER BY 1, 2
  """

  val pipelineRowFingerprint: String = """
    WITH f AS (SELECT md5(concat_ws('|',
        CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
        o_orderstatus,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR),
        strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority)) AS fp
      FROM orders)
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_fp,
           min(fp) AS min_fp, max(fp) AS max_fp
    FROM f
  """

  // DuckDB's native QUALIFY — pins that the Spark side's ranked-
  // subquery emulation is semantics-exact
  val sqlQualify: String = """
    SELECT year(o_orderdate) * 100 + month(o_orderdate) AS ym,
           row_number() OVER (
             PARTITION BY year(o_orderdate) * 100 + month(o_orderdate)
             ORDER BY o_totalprice DESC, o_orderkey) AS rk,
           o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS total
    FROM orders
    QUALIFY rk <= 2
    ORDER BY ym, rk
  """

  // ---- round 11, batch 1 ----

  val graphAdamicAdar: String = s"""
    WITH $thinnedGraphCte,
    adj AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT a node, count(*) deg FROM adj GROUP BY 1),
    cn AS (SELECT l.a x, r.a y, l.b z
           FROM adj l JOIN adj r ON l.b = r.b AND l.a < r.a),
    sc AS (SELECT x, y, count(*) AS n_common,
             sum(CAST(floor(1.0e9 / ln(CAST(deg AS DOUBLE)))
                 AS BIGINT)) AS s
           FROM cn JOIN deg ON cn.z = deg.node GROUP BY x, y)
    SELECT x AS node_a, y AS node_b,
      CAST(n_common AS BIGINT) AS n_common,
      CAST(s AS DOUBLE) / 1.0e9 AS aa_score,
      EXISTS(SELECT 1 FROM und WHERE und.u = sc.x AND und.v = sc.y)
        AS is_edge
    FROM sc ORDER BY aa_score DESC, node_a, node_b
  """

  val graphBipartiteProject: String = """
    WITH bp AS (SELECT DISTINCT l_suppkey s, p_brand b
                FROM lineitem JOIN part ON l_partkey = p_partkey)
    SELECT x.b AS brand_a, y.b AS brand_b,
      CAST(count(*) AS BIGINT) AS n_shared
    FROM bp x JOIN bp y ON x.s = y.s AND x.b < y.b
    GROUP BY 1, 2 ORDER BY 1, 2
  """

  val graphKcorePeel: String = s"""
    WITH $thinnedGraphCte,
    a0 AS MATERIALIZED (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    n1 AS MATERIALIZED (SELECT a FROM a0 GROUP BY a HAVING count(*) >= 2),
    a1 AS MATERIALIZED (SELECT a0.a, a0.b FROM a0
           JOIN n1 x ON a0.a = x.a JOIN n1 y ON a0.b = y.a),
    n2 AS MATERIALIZED (SELECT a FROM a1 GROUP BY a HAVING count(*) >= 2),
    a2 AS MATERIALIZED (SELECT a1.a, a1.b FROM a1
           JOIN n2 x ON a1.a = x.a JOIN n2 y ON a1.b = y.a),
    n3 AS MATERIALIZED (SELECT a FROM a2 GROUP BY a HAVING count(*) >= 2),
    a3 AS MATERIALIZED (SELECT a2.a, a2.b FROM a2
           JOIN n3 x ON a2.a = x.a JOIN n3 y ON a2.b = y.a),
    n4 AS MATERIALIZED (SELECT a FROM a3 GROUP BY a HAVING count(*) >= 2),
    a4 AS MATERIALIZED (SELECT a3.a, a3.b FROM a3
           JOIN n4 x ON a3.a = x.a JOIN n4 y ON a3.b = y.a)
    SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
    FROM a4 GROUP BY a ORDER BY node
  """

  val mlAucRank: String = """
    WITH s AS (SELECT round(CAST(embedding[2] AS DOUBLE), 2) AS score,
                      CASE WHEN label >= 5 THEN 1 ELSE 0 END AS pos
               FROM embeddings),
    g AS (SELECT score, sum(pos) np, sum(1 - pos) nn
          FROM s GROUP BY score),
    c AS (SELECT score, np, nn,
            coalesce(sum(nn) OVER (ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cnn
          FROM g)
    SELECT
      round((CAST(sum(np * cnn) AS DOUBLE) +
             CAST(sum(np * nn) AS DOUBLE) / 2.0)
            / CAST(sum(np) * sum(nn) AS DOUBLE), 6) AS auc,
      CAST(sum(np) AS BIGINT) AS n_pos,
      CAST(sum(nn) AS BIGINT) AS n_neg
    FROM c
  """

  val mlConfusionMetrics: String = """
    WITH s AS (SELECT embedding[2] > 0 AS pred, label >= 5 AS act
               FROM embeddings),
    c AS (SELECT
            count(CASE WHEN pred AND act THEN 1 END) tp,
            count(CASE WHEN pred AND NOT act THEN 1 END) fp,
            count(CASE WHEN NOT pred AND act THEN 1 END) fn,
            count(CASE WHEN NOT pred AND NOT act THEN 1 END) tn
          FROM s)
    SELECT CAST(tp AS BIGINT) tp, CAST(fp AS BIGINT) fp,
           CAST(fn AS BIGINT) fn, CAST(tn AS BIGINT) tn,
      round(CAST(tp + tn AS DOUBLE) / CAST(tp + fp + fn + tn AS DOUBLE), 6)
        AS accuracy,
      round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) AS precision_pos,
      round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) AS recall_pos,
      round(2.0 * CAST(tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE), 6)
        AS f1
    FROM c
  """

  val mlChiSquare: String = """
    WITH obs AS (SELECT o_orderpriority p, o_orderstatus st, count(*) o
                 FROM orders GROUP BY 1, 2),
    rt AS (SELECT p, sum(o) rtot FROM obs GROUP BY 1),
    ct AS (SELECT st, sum(o) ctot FROM obs GROUP BY 1),
    n AS (SELECT sum(o) n FROM obs),
    cells AS (SELECT o,
        CAST(rtot * ctot AS DOUBLE) / CAST(n AS DOUBLE) AS exp
      FROM obs JOIN rt USING (p) JOIN ct USING (st) CROSS JOIN n)
    SELECT
      round(CAST(sum(CAST(round(
          (CAST(o AS DOUBLE) - exp) * (CAST(o AS DOUBLE) - exp) / exp, 9)
        AS DECIMAL(13,9))) AS DOUBLE), 6) AS chi2,
      CAST((SELECT (count(DISTINCT p) - 1) FROM obs) *
           (SELECT (count(DISTINCT st) - 1) FROM obs) AS BIGINT) AS dof,
      CAST((SELECT n FROM n) AS BIGINT) AS n
    FROM cells
  """

  val tsCrossCorrelation: String = """
    WITH hb AS (SELECT epoch_us(ts) // 3600000000 AS hb, event_type,
                       count(*) c
                FROM events WHERE event_type IN ('click', 'purchase')
                GROUP BY 1, 2),
    cl AS (SELECT hb h, c x FROM hb WHERE event_type = 'click'),
    pu AS (SELECT hb h2, c y FROM hb WHERE event_type = 'purchase'),
    lg AS (SELECT unnest(range(-3, 4)) AS lag),
    j AS (SELECT lag, x, y FROM cl CROSS JOIN lg
          JOIN pu ON h2 = h + lag),
    a AS (SELECT lag, count(*) n, sum(x) sx, sum(y) sy, sum(x*y) sxy,
                 sum(x*x) sxx, sum(y*y) syy
          FROM j GROUP BY lag)
    SELECT CAST(lag AS INTEGER) AS lag, CAST(n AS BIGINT) AS n_hours,
      round(CAST(n * sxy - sx * sy AS DOUBLE) /
        (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
         sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS xcorr
    FROM a ORDER BY lag
  """

  val tsPeakDetect: String = """
    WITH h AS (SELECT date_trunc('hour', ts) hr, event_type,
                      sum(CAST(value AS DECIMAL(12,2))) sv
               FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, hr, sv,
            lag(sv) OVER (PARTITION BY event_type ORDER BY hr) pv,
            lead(sv) OVER (PARTITION BY event_type ORDER BY hr) nv
          FROM h)
    SELECT event_type, hr, CAST(sv AS DOUBLE) AS v
    FROM w
    WHERE pv IS NOT NULL AND nv IS NOT NULL AND sv > pv AND sv > nv
    ORDER BY event_type, hr
  """

  val aggProductLogsum: String = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      round(CAST(sum(CAST(round(ln(1.0 + "value" / 1000.0), 9)
        AS DECIMAL(13,9))) AS DOUBLE), 6) AS log_sum,
      round(exp(CAST(sum(CAST(round(ln(1.0 + "value" / 1000.0), 9)
        AS DECIMAL(13,9))) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6)
        AS geomean
    FROM events GROUP BY event_type ORDER BY event_type
  """

  val dedupPrefixCluster: String = """
    SELECT substring(text, 1, 16) AS prefix,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS canonical_id
    FROM documents
    GROUP BY 1 HAVING count(*) >= 2
    ORDER BY prefix
  """

  // ---- round 11, batch 2 ----

  val textStopwordCoverage: String = """
    WITH tok AS (SELECT source, doc_id, unnest(string_split(text, ' ')) t
                 FROM documents),
    stop AS (SELECT t sw FROM (SELECT t, count(*) n FROM tok GROUP BY t
                               ORDER BY n DESC, t LIMIT 20))
    SELECT source,
      CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      CAST(count(*) AS BIGINT) AS n_tokens,
      CAST(count(sw) AS BIGINT) AS n_stop,
      round(CAST(count(sw) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        AS stop_ratio
    FROM tok LEFT JOIN stop ON t = sw
    GROUP BY source ORDER BY source
  """

  val pipelineReferentialIntegrity: String = """
    SELECT 'customer.c_nationkey->nation' rel,
      CAST(count(*) AS BIGINT) n_child,
      CAST(count(CASE WHEN n_nationkey IS NULL THEN 1 END) AS BIGINT) n_orphans
    FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders', CAST(count(*) AS BIGINT),
      CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT)
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'lineitem.l_partkey->part', CAST(count(*) AS BIGINT),
      CAST(count(CASE WHEN p_partkey IS NULL THEN 1 END) AS BIGINT)
    FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier', CAST(count(*) AS BIGINT),
      CAST(count(CASE WHEN s_suppkey IS NULL THEN 1 END) AS BIGINT)
    FROM lineitem LEFT JOIN supplier ON l_suppkey = s_suppkey
    UNION ALL
    SELECT 'nation.n_regionkey->region', CAST(count(*) AS BIGINT),
      CAST(count(CASE WHEN r_regionkey IS NULL THEN 1 END) AS BIGINT)
    FROM nation LEFT JOIN region ON n_regionkey = r_regionkey
    UNION ALL
    SELECT 'orders.o_custkey->customer', CAST(count(*) AS BIGINT),
      CAST(count(CASE WHEN c_custkey IS NULL THEN 1 END) AS BIGINT)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    UNION ALL
    SELECT 'supplier.s_nationkey->nation', CAST(count(*) AS BIGINT),
      CAST(count(CASE WHEN n_nationkey IS NULL THEN 1 END) AS BIGINT)
    FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
    ORDER BY rel
  """

  // per-column CTE mirrors the Spark side's ln n - (Σ c·ln c)/n with
  // the Σ c·ln c terms floor-quantized to integer nanos
  private def entCte(tbl: String, col: String): String = s"""
    SELECT '$tbl' tbl, '$col' col_name,
      CAST(count(*) AS BIGINT) AS n_distinct,
      ln(CAST(sum(c) AS DOUBLE)) +
        (CAST(sum(CAST(floor(CAST(c AS DOUBLE) * -1.0e9 *
             ln(CAST(c AS DOUBLE))) AS BIGINT)) AS DOUBLE) / 1.0e9)
          / CAST(sum(c) AS DOUBLE) AS entropy_nats
    FROM (SELECT $col v, count(*) c FROM $tbl GROUP BY 1)"""

  val pipelineColumnEntropy: String = s"""
    ${entCte("customer", "c_mktsegment")}
    UNION ALL ${entCte("documents", "lang")}
    UNION ALL ${entCte("documents", "source")}
    UNION ALL ${entCte("events", "event_type")}
    UNION ALL ${entCte("lineitem", "l_returnflag")}
    UNION ALL ${entCte("orders", "o_orderpriority")}
    ORDER BY tbl, col_name
  """

  val streamStaticJoin: String = """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
      CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
  """

  val streamUnionMerge: String = """
    SELECT date_trunc('hour', ts) AS win_start, event_type,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY 1, 2 ORDER BY win_start, event_type
  """

  val scaleShuffleHashJoin: String = s"""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      CAST(sum($netExpr) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
  """

  val simMipsTopk: String = """
    SELECT vec_id, round(ip, 6) AS inner_product FROM (
      SELECT a.vec_id,
        list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) ip
      FROM embeddings a
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 1) b
      WHERE a.vec_id != 1
      ORDER BY ip DESC, a.vec_id LIMIT 10)
    ORDER BY inner_product DESC, vec_id
  """

  // BM25 per-(doc, term) contribution — shared verbatim by the
  // retrieval oracle and the RRF fusion oracle. The integer-cleared tf
  // normalization and the round-9dp DECIMAL idf protocol mirror the
  // Spark side (Round11Ops3.bm25Scores) term for term.
  private val bm25Ctes = """
    toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
             FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    tot AS (SELECT CAST(sum(dl) AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS n
            FROM dl),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ('spark', 'query', 'merge', 'dup')
           GROUP BY doc_id, term),
    dft AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    contrib AS (SELECT tf.doc_id,
        CAST(round(CAST(round(ln(2.0 * (n + 1) / (2 * df + 1)), 9)
              AS DECIMAL(28,9)) *
          ((22.0 * tf * t) / (10.0 * t * tf + 3.0 * t + 9.0 * dl.dl * n)), 9)
          AS DECIMAL(28,9)) AS c
      FROM tf JOIN dl ON tf.doc_id = dl.doc_id
      JOIN dft ON tf.term = dft.term CROSS JOIN tot),
    bm AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
             round(CAST(sum(c) AS DOUBLE), 6) AS bm25
           FROM contrib GROUP BY doc_id)"""

  val textBm25Retrieval: String = s"""
    WITH $bm25Ctes
    SELECT doc_id, n_terms, bm25 FROM bm
    ORDER BY bm25 DESC, doc_id LIMIT 15
  """

  val simHybridRrf: String = s"""
    WITH $bm25Ctes,
    lex AS (SELECT doc_id,
              CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER)
                AS r_lex
            FROM (SELECT * FROM bm ORDER BY bm25 DESC, doc_id LIMIT 50)),
    dense0 AS (SELECT a.vec_id AS doc_id, $cosExpr AS cs
      FROM embeddings a
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) b
      WHERE a.vec_id != 0 ORDER BY cs DESC, a.vec_id LIMIT 50),
    dense AS (SELECT doc_id,
                CAST(row_number() OVER (ORDER BY cs DESC, doc_id) AS INTEGER)
                  AS r_dense
              FROM dense0)
    SELECT doc_id, r_lex, r_dense,
      round(coalesce(1.0 / (r_lex + 60), 0) +
            coalesce(1.0 / (r_dense + 60), 0), 9) AS rrf
    FROM lex FULL OUTER JOIN dense USING (doc_id)
    ORDER BY rrf DESC, doc_id LIMIT 20
  """

  // md5-uniform protocol mirror (sampleWeighted's): 24-bit k from the
  // first 6 md5 hex digits of the event id; p = (k+0.5)/2^24 is a
  // dyadic rational — exact in a double on both engines
  private val u24Cte = """
    s AS (SELECT event_type,
        CAST(concat('0x', substring(
          md5(CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) AS k,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END AS y
      FROM events)"""

  val mlLogLoss: String = s"""
    WITH $u24Cte,
    l AS (SELECT event_type, y,
        CASE WHEN y = 1
          THEN CAST(round(-ln((k + 0.5) / 16777216.0), 9) AS DECIMAL(28,9))
          ELSE CAST(round(-ln(1.0 - (k + 0.5) / 16777216.0), 9)
                 AS DECIMAL(28,9))
        END AS loss
      FROM s)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(y) AS BIGINT) AS n_pos,
      round(CAST(sum(loss) AS DOUBLE) / count(*), 6) AS log_loss
    FROM l GROUP BY event_type ORDER BY event_type
  """

  val mlCalibrationBins: String = s"""
    WITH $u24Cte
    SELECT CAST((10 * k + 5) // 16777216 AS INT) AS bin,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(y) AS BIGINT) AS n_pos,
      round(CAST(2 * sum(k) + count(*) AS DOUBLE) /
        (CAST(count(*) AS DOUBLE) * 33554432.0), 6) AS mean_p,
      round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS obs_rate
    FROM s GROUP BY 1 ORDER BY 1
  """

  val mlNdcgBm25: String = s"""
    WITH $bm25Ctes,
    top AS (SELECT doc_id, n_terms, bm25 FROM bm
            ORDER BY bm25 DESC, doc_id LIMIT 15),
    ranked AS (SELECT CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id)
                 AS INTEGER) AS pos, doc_id, n_terms AS rel FROM top),
    g AS (SELECT pos, doc_id, rel,
            CAST(round(CAST(rel AS DOUBLE) / log2(pos + 1), 9)
              AS DECIMAL(28,9)) AS gain
          FROM ranked),
    ideal AS (SELECT CAST(row_number() OVER (ORDER BY n_terms DESC, doc_id)
                AS INTEGER) AS ipos, n_terms AS rel FROM top),
    i AS (SELECT sum(CAST(round(CAST(rel AS DOUBLE) / log2(ipos + 1), 9)
            AS DECIMAL(28,9))) AS idcg FROM ideal),
    d AS (SELECT sum(gain) AS dcg FROM g)
    SELECT pos, doc_id, rel, CAST(gain AS DOUBLE) AS gain,
      round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg
    FROM g CROSS JOIN d CROSS JOIN i ORDER BY pos
  """

  val graphClusteringCoeff: String = s"""
    WITH $thinnedGraphCte,
    adj AS (SELECT u AS a, v AS b FROM und
            UNION ALL SELECT v, u FROM und),
    deg AS (SELECT a AS node, count(*) AS degree FROM adj GROUP BY 1),
    wed AS (SELECT x.a AS node, x.b AS u, y.b AS v
            FROM adj x JOIN adj y ON x.a = y.a AND x.b < y.b),
    closed AS (SELECT node, count(*) AS tri FROM wed
               WHERE EXISTS (SELECT 1 FROM und
                             WHERE und.u = wed.u AND und.v = wed.v)
               GROUP BY node)
    SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
      CAST(coalesce(c.tri, 0) AS BIGINT) AS triangles,
      round(CAST(coalesce(c.tri, 0) AS DOUBLE) * 2 /
        (d.degree * (d.degree - 1)), 6) AS coeff
    FROM deg d LEFT JOIN closed c ON d.node = c.node
    WHERE d.degree >= 2 ORDER BY d.node
  """

  val analyticLorenzGini: String = """
    WITH rev AS (SELECT o_custkey,
                   sum(CAST(o_totalprice AS DECIMAL(12,2))) AS x
                 FROM orders GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS t FROM rev),
    rk AS (SELECT o_custkey, x,
             CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
           FROM rev),
    gini AS (SELECT round(
               CAST(2 * sum(i * x) - t * (n + 1) AS DOUBLE) /
               CAST(t * n AS DOUBLE), 6) AS gini
             FROM rk CROSS JOIN tot GROUP BY t, n),
    dec AS (SELECT CAST((i - 1) * 10 // n AS INTEGER) + 1 AS decile,
              count(*) AS n_cust, sum(x) AS rev_d
            FROM rk CROSS JOIN tot GROUP BY 1),
    cum AS (SELECT a.decile, sum(b.rev_d) AS cum_rev
            FROM dec a JOIN dec b ON b.decile <= a.decile GROUP BY 1)
    SELECT d.decile, CAST(d.n_cust AS BIGINT) AS n_cust,
      CAST(d.rev_d AS DOUBLE) AS revenue,
      round(CAST(c.cum_rev AS DOUBLE) / CAST(t.t AS DOUBLE), 6) AS cum_share,
      g.gini
    FROM dec d JOIN cum c ON d.decile = c.decile
    CROSS JOIN tot t CROSS JOIN gini g
    ORDER BY d.decile
  """

  val analyticMarkovTransitions: String = """
    WITH p AS (SELECT event_type, lead(event_type) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id) AS nt
               FROM events),
    t AS (SELECT event_type AS from_type, nt AS to_type, count(*) AS n
          FROM p WHERE nt IS NOT NULL GROUP BY 1, 2),
    tot AS (SELECT from_type, sum(n) AS tot FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type, CAST(t.n AS BIGINT) AS n,
      round(CAST(t.n AS DOUBLE) / tot.tot, 6) AS p
    FROM t JOIN tot ON t.from_type = tot.from_type
    ORDER BY t.from_type, t.to_type
  """


  val simHammingTopk: String = """
    WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
                  FROM documents),
    h AS (SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 8) AS BIGINT) AS h
          FROM toks),
    bits AS (SELECT doc_id, h, unnest(range(0, 32)) AS bit FROM h),
    s AS (SELECT doc_id, bit,
            sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS sc
          FROM bits GROUP BY doc_id, bit),
    sig AS (SELECT doc_id,
              CAST(sum(CASE WHEN sc > 0 THEN (CAST(1 AS BIGINT) << bit)
                            ELSE 0 END) AS BIGINT) AS simhash
            FROM s GROUP BY doc_id),
    sc2 AS (SELECT p.doc_id probe_id, c.doc_id doc_id,
              CAST(bit_count(xor(c.simhash, p.simhash)) AS INTEGER) hamming
            FROM sig c CROSS JOIN (SELECT * FROM sig WHERE doc_id < 5) p
            WHERE c.doc_id != p.doc_id),
    rk AS (SELECT probe_id, doc_id, hamming,
             CAST(row_number() OVER (PARTITION BY probe_id
               ORDER BY hamming, doc_id) AS INTEGER) rn
           FROM sc2)
    SELECT probe_id, doc_id, hamming, rn
    FROM rk WHERE rn <= 3 ORDER BY probe_id, rn
  """

  // Spearman via midranks on the bounded distinct-value tables:
  // 2·rank = 2·(#below) + cnt + 1 stays integer; every sum is HUGEINT
  // (mirrors Spark's DECIMAL(38,0) lane); one double division at the end
  val mlSpearmanRho: String = """
    WITH rows_ AS (SELECT l_returnflag g,
        CAST(l_quantity AS DECIMAL(12,2)) va,
        CAST(l_discount AS DECIMAL(12,2)) vb FROM lineitem),
    fa AS (SELECT g, va, CAST(count(*) AS HUGEINT) cnt FROM rows_ GROUP BY 1, 2),
    fb AS (SELECT g, vb, CAST(count(*) AS HUGEINT) cnt FROM rows_ GROUP BY 1, 2),
    ra AS (SELECT f.g, f.va, 2 * coalesce(sum(h.cnt), 0) + f.cnt + 1 AS r2
           FROM fa f LEFT JOIN fa h ON h.g = f.g AND h.va < f.va
           GROUP BY f.g, f.va, f.cnt),
    rb AS (SELECT f.g, f.vb, 2 * coalesce(sum(h.cnt), 0) + f.cnt + 1 AS r2
           FROM fb f LEFT JOIN fb h ON h.g = f.g AND h.vb < f.vb
           GROUP BY f.g, f.vb, f.cnt),
    j AS (SELECT r.g, CAST(ra.r2 AS HUGEINT) x, CAST(rb.r2 AS HUGEINT) y
          FROM rows_ r JOIN ra ON ra.g = r.g AND ra.va = r.va
                       JOIN rb ON rb.g = r.g AND rb.vb = r.vb),
    s AS (SELECT g, CAST(count(*) AS HUGEINT) n, sum(x) sx, sum(y) sy,
            sum(x * x) sxx, sum(y * y) syy, sum(x * y) sxy
          FROM j GROUP BY g)
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
      round(CAST(n * sxy - sx * sy AS DOUBLE) /
        (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
         sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS spearman_rho
    FROM s ORDER BY 1
  """

  // ECDF difference in exact integer math: D·n1·n2 = |cum1·n2 − cum2·n1|;
  // argmax tie-break = smallest value
  val mlKsTest: String = """
    WITH vals AS (SELECT CAST(value AS DECIMAL(12,2)) v,
        CASE WHEN event_type = 'click' THEN 1 ELSE 0 END a,
        CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END b
      FROM events WHERE event_type IN ('click', 'purchase')),
    perv AS (SELECT v, CAST(sum(a) AS BIGINT) ca, CAST(sum(b) AS BIGINT) cb
             FROM vals GROUP BY v),
    cum AS (SELECT v,
              sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) c1,
              sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) c2
            FROM perv),
    tot AS (SELECT CAST(sum(a) AS BIGINT) na, CAST(sum(b) AS BIGINT) nb
            FROM vals),
    e AS (SELECT v, na, nb, abs(c1 * nb - c2 * na) ds FROM cum, tot)
    SELECT na, nb, CAST(min(v) AS DOUBLE) AS ks_at,
      round(CAST(ds AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
        AS d
    FROM e WHERE ds = (SELECT max(ds) FROM e)
    GROUP BY na, nb, ds
  """

  // first digit from the DECIMAL's canonical string (no float log10
  // near power-of-ten boundaries); shares rounded BEFORE the deviation
  val analyticBenfordDigits: String = """
    WITH d AS (SELECT CAST(substring(
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1)
        AS INTEGER) AS digit
      FROM orders WHERE CAST(o_totalprice AS DECIMAL(12,2)) >= 1),
    tot AS (SELECT count(*) n FROM d),
    sh AS (SELECT digit, CAST(count(*) AS BIGINT) n_d,
             round(CAST(count(*) AS DOUBLE) / CAST(max(tot.n) AS DOUBLE), 6)
               AS share,
             round(log10(1.0 + 1.0 / digit), 6) AS benford_share
           FROM d, tot GROUP BY digit)
    SELECT digit, n_d, share, benford_share,
      round(abs(share - benford_share), 6) AS abs_dev
    FROM sh ORDER BY digit
  """

  // signed net series (purchase credit, error debit); running sum +
  // running max per user in exact DECIMAL; drawdown = peak − cum
  val tsMaxDrawdown: String = """
    WITH p AS (SELECT user_id, ts, event_id,
        CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(12,2))
             ELSE -CAST(value AS DECIMAL(12,2)) END v
      FROM events WHERE event_type IN ('purchase', 'error')),
    r AS (SELECT user_id, ts, event_id,
            CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS DECIMAL(18,2)) cum
          FROM p),
    r2 AS (SELECT user_id, cum,
             max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) pk
           FROM r)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      CAST(max(pk) AS DOUBLE) AS final_peak,
      CAST(max(pk - cum) AS DOUBLE) AS max_drawdown
    FROM r2 GROUP BY user_id ORDER BY user_id
  """

  // HHI share-free: Σrev² / (Σrev)² with both sums exact DECIMAL
  // ((18,2) squares keep precision ≤ 38 on both engines)
  val analyticHerfindahl: String = """
    WITH srev AS (SELECT l_suppkey, CAST(sum(CAST(l_extendedprice
          AS DECIMAL(12,2))) * 100 AS HUGEINT) rc
      FROM lineitem GROUP BY 1),
    bys AS (SELECT n.n_name, s.rc
            FROM srev s JOIN supplier su ON s.l_suppkey = su.s_suppkey
                        JOIN nation n ON su.s_nationkey = n.n_nationkey)
    SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      CAST(sum(rc) AS DOUBLE) / 100.0 AS total_revenue,
      round(CAST(sum(rc * rc) AS DOUBLE) /
        (CAST(sum(rc) AS DOUBLE) * CAST(sum(rc) AS DOUBLE)), 6) AS hhi,
      round(CAST(max(rc) AS DOUBLE) / CAST(sum(rc) AS DOUBLE), 6) AS cr1
    FROM bys GROUP BY n_name ORDER BY n_name
  """

  // confusion cells exact; kappa/MCC products on HUGEINT (Spark:
  // DECIMAL(38,0)); MCC denominator as two pairwise sqrts, mirroring
  // the Spark tree exactly
  val mlKappaMcc: String = """
    WITH s AS (SELECT event_type,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y,
        CASE WHEN CAST(concat('0x', substring(
          md5(CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) >= 8388608
          THEN 1 ELSE 0 END yh
      FROM events),
    c AS (SELECT event_type,
        CAST(count(CASE WHEN y = 1 AND yh = 1 THEN 1 END) AS HUGEINT) tp,
        CAST(count(CASE WHEN y = 0 AND yh = 1 THEN 1 END) AS HUGEINT) fp,
        CAST(count(CASE WHEN y = 1 AND yh = 0 THEN 1 END) AS HUGEINT) fn,
        CAST(count(CASE WHEN y = 0 AND yh = 0 THEN 1 END) AS HUGEINT) tn
      FROM s GROUP BY 1)
    SELECT event_type, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
      CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
      round(CAST(tp * tn - fp * fn AS DOUBLE) * 2 /
        CAST((tp + fp) * (fp + tn) + (tp + fn) * (fn + tn) AS DOUBLE), 6)
        AS kappa,
      round(CAST(tp * tn - fp * fn AS DOUBLE) /
        (sqrt(CAST((tp + fp) * (tp + fn) AS DOUBLE)) *
         sqrt(CAST((tn + fp) * (tn + fn) AS DOUBLE))), 6) AS mcc
    FROM c ORDER BY event_type
  """

  // decile 1 = top-scored 10%; cumulative sums on the 10-row decile
  // table via the triangular join
  val mlGainLift: String = """
    WITH s AS (SELECT
        CAST(concat('0x', substring(
          md5(CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) k,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y
      FROM events),
    dec AS (SELECT 10 - CAST((10 * k + 5) // 16777216 AS INT) AS decile,
              CAST(count(*) AS BIGINT) n, CAST(sum(y) AS BIGINT) pos
            FROM s GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) nt, CAST(sum(pos) AS BIGINT) pt
            FROM dec),
    cum AS (SELECT a.decile, a.n, a.pos,
              CAST(sum(b.n) AS BIGINT) cn, CAST(sum(b.pos) AS BIGINT) cpos
            FROM dec a JOIN dec b ON b.decile <= a.decile
            GROUP BY a.decile, a.n, a.pos)
    SELECT decile, n, pos,
      round(CAST(cpos AS DOUBLE) / pt, 6) AS gain,
      round(CAST(cpos AS DOUBLE) * nt / (CAST(pt AS DOUBLE) * cn), 6) AS lift
    FROM cum, tot ORDER BY decile
  """

  // md5-parity cohorts; pooled-variance z with the identical operation
  // tree as the Spark side
  val analyticAbtestZtest: String = """
    WITH u AS (SELECT user_id,
        max(CASE WHEN event_type = 'purchase'
            AND CAST(value AS DECIMAL(12,2)) >= 200 THEN 1 ELSE 0 END) conv
      FROM events GROUP BY 1),
    g AS (SELECT conv, CAST(concat('0x', substring(
        md5(CAST(user_id AS VARCHAR)), 1, 6)) AS BIGINT) % 2 grp
      FROM u),
    c AS (SELECT
        CAST(count(CASE WHEN grp = 0 THEN 1 END) AS BIGINT) n_a,
        CAST(count(CASE WHEN grp = 1 THEN 1 END) AS BIGINT) n_b,
        CAST(sum(CASE WHEN grp = 0 THEN conv ELSE 0 END) AS BIGINT) conv_a,
        CAST(sum(CASE WHEN grp = 1 THEN conv ELSE 0 END) AS BIGINT) conv_b
      FROM g)
    SELECT n_a, n_b, conv_a, conv_b,
      round(CAST(conv_a AS DOUBLE) / n_a, 6) AS p_a,
      round(CAST(conv_b AS DOUBLE) / n_b, 6) AS p_b,
      round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b) /
        sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
          (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
          (1.0 / n_a + 1.0 / n_b)), 6) AS z
    FROM c
  """

  // symmetrized endpoint-degree Pearson: r = (M·Σxy − S1²)/(M·Σx² − S1²)
  // over the directed edge list, all sums exact HUGEINT
  val graphAssortativity: String = s"""
    WITH $thinnedGraphCte,
    adj AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT a node, CAST(count(*) AS HUGEINT) degree
            FROM adj GROUP BY 1),
    e AS (SELECT dx.degree jx, dy.degree jy
          FROM adj JOIN deg dx ON adj.a = dx.node
                   JOIN deg dy ON adj.b = dy.node),
    st AS (SELECT CAST(count(*) AS HUGEINT) m, sum(jx) s1,
             sum(jx * jx) s2, sum(jx * jy) se FROM e)
    SELECT CAST(m AS BIGINT) AS n_directed_edges,
      round(CAST(m * se - s1 * s1 AS DOUBLE) /
        CAST(m * s2 - s1 * s1 AS DOUBLE), 6) AS assortativity
    FROM st
  """

  // per-term JS contribution in doubles from exact counts, rounded
  // into the 9-dp lane before the order-free sum
  val textJsDivergence: String = """
    WITH ca AS (SELECT term, CAST(count(*) AS BIGINT) ca FROM (
          SELECT unnest(string_split(text, ' ')) term
          FROM documents WHERE lang = 'en') GROUP BY 1),
    cb AS (SELECT term, CAST(count(*) AS BIGINT) cb FROM (
          SELECT unnest(string_split(text, ' ')) term
          FROM documents WHERE lang = 'de') GROUP BY 1),
    j AS (SELECT coalesce(ca.term, cb.term) term,
            coalesce(ca.ca, 0) ca, coalesce(cb.cb, 0) cb
          FROM ca FULL OUTER JOIN cb ON ca.term = cb.term),
    tot AS (SELECT CAST(sum(ca) AS BIGINT) na, CAST(sum(cb) AS BIGINT) nb
            FROM j),
    k AS (SELECT ca, cb,
            CAST(ca AS DOUBLE) / na p, CAST(cb AS DOUBLE) / nb q
          FROM j, tot),
    c AS (SELECT ca, cb, CAST(round(
            (CASE WHEN ca > 0 THEN p * log2(p / ((p + q) / 2)) ELSE 0.0 END +
             CASE WHEN cb > 0 THEN q * log2(q / ((p + q) / 2)) ELSE 0.0 END)
            / 2, 9) AS DECIMAL(28,9)) con
          FROM k)
    SELECT CAST(count(*) AS BIGINT) AS n_terms,
      CAST(count(CASE WHEN ca > 0 AND cb > 0 THEN 1 END) AS BIGINT)
        AS n_shared,
      round(CAST(sum(con) AS DOUBLE), 6) AS jsd_bits
    FROM c
  """

  // median of pairwise slopes: explicit middle order statistics over
  // the bounded daily series (no interpolation-formula drift)
  val tsTheilSen: String = """
    WITH daily AS (SELECT event_type,
        CAST(date_trunc('day', ts) AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2))) AS DECIMAL(18,2)) v
      FROM events GROUP BY 1, 2),
    dn AS (SELECT event_type, v,
             date_diff('day', DATE '2024-01-01', d) dnum FROM daily),
    pairs AS (SELECT x.event_type,
        CAST(round(CAST(y.v - x.v AS DOUBLE) / (y.dnum - x.dnum), 9)
          AS DECIMAL(28,9)) slope,
        x.dnum i, y.dnum j
      FROM dn x JOIN dn y ON x.event_type = y.event_type
        AND x.dnum < y.dnum),
    rk AS (SELECT event_type, slope,
             row_number() OVER (PARTITION BY event_type
               ORDER BY slope, i, j) rn,
             count(*) OVER (PARTITION BY event_type) np
           FROM pairs)
    SELECT event_type, CAST(max(np) AS BIGINT) AS n_pairs,
      round(CAST(sum(slope) AS DOUBLE) / count(*), 6) AS theil_sen_slope
    FROM rk WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
    GROUP BY event_type ORDER BY event_type
  """

  // last preceding non-purchase touch via IGNORE NULLS window;
  // no-touch purchases credit 'direct'
  val analyticAttribution: String = """
    WITH t AS (SELECT event_type, CAST(value AS DECIMAL(12,2)) v,
        last_value(CASE WHEN event_type <> 'purchase'
            THEN event_type END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) chan
      FROM events)
    SELECT coalesce(chan, 'direct') AS channel,
      CAST(count(*) AS BIGINT) AS n_purchases,
      CAST(sum(v) AS DOUBLE) AS revenue
    FROM t WHERE event_type = 'purchase'
    GROUP BY 1 ORDER BY 1
  """

  // one hash aggregate to 10 bins; threshold sweep on the bounded bin
  // table; F1 fraction-free as 2tp/(2tp+fp+fn)
  val mlThresholdSweep: String = """
    WITH s AS (SELECT
        CAST(concat('0x', substring(
          md5(CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) k,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y
      FROM events),
    bins AS (SELECT CAST((10 * k + 5) // 16777216 AS INT) bin,
               CAST(count(*) AS BIGINT) n, CAST(sum(y) AS BIGINT) pos
             FROM s GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) nt, CAST(sum(pos) AS BIGINT) pt
            FROM bins),
    cum AS (SELECT a.bin, CAST(sum(b.n) AS BIGINT) cn,
              CAST(sum(b.pos) AS BIGINT) tp
            FROM bins a JOIN bins b ON b.bin >= a.bin GROUP BY a.bin)
    SELECT 10 - bin AS decile, tp, cn - tp AS fp, pt - tp AS fn,
      round(CAST(tp AS DOUBLE) / cn, 6) AS precision,
      round(CAST(tp AS DOUBLE) / pt, 6) AS recall,
      round(CAST(tp * 2 AS DOUBLE) / (tp * 2 + (cn - tp) + (pt - tp)), 6)
        AS f1
    FROM cum, tot ORDER BY decile
  """

  // Heaps' law: nano-integer ln lane (ln×10⁹ rounded) makes the OLS
  // sums exact HUGEINT; scale cancels in beta, one /1e9 for ln_k
  val textHeapsFit: String = """
    WITH tf AS (SELECT source, unnest(string_split(text, ' ')) term
                FROM documents),
    tc AS (SELECT source, term, count(*) f FROM tf GROUP BY 1, 2),
    ps AS (SELECT source, CAST(sum(f) AS BIGINT) n_tokens,
             CAST(count(*) AS BIGINT) n_types FROM tc GROUP BY 1),
    nano AS (SELECT
        CAST(round(ln(CAST(n_tokens AS DOUBLE)) * 1e9, 0) AS HUGEINT) x,
        CAST(round(ln(CAST(n_types AS DOUBLE)) * 1e9, 0) AS HUGEINT) y
      FROM ps),
    s AS (SELECT CAST(count(*) AS HUGEINT) n, sum(x) sx, sum(y) sy,
            sum(x * x) sxx, sum(x * y) sxy FROM nano)
    SELECT CAST(n AS BIGINT) AS n_sources,
      round(CAST(n * sxy - sx * sy AS DOUBLE) /
        CAST(n * sxx - sx * sx AS DOUBLE), 6) AS beta,
      round(CAST(sy * sxx - sx * sxy AS DOUBLE) /
        CAST(n * sxx - sx * sx AS DOUBLE) / 1e9, 6) AS ln_k
    FROM s
  """

  // ANSI percentile_disc = first value with cume_dist >= p (mirrors
  // aggPercentileDisc's construction); fences exact DECIMAL at scale 3
  val pipelineAnomalyIqr: String = """
    WITH v AS (SELECT event_type, CAST(value AS DECIMAL(12,2)) v
               FROM events),
    cd AS (SELECT event_type, v,
             cume_dist() OVER (PARTITION BY event_type ORDER BY v) c
           FROM v),
    q AS (SELECT event_type,
            min(CASE WHEN c >= 0.25 THEN v END) q1,
            min(CASE WHEN c >= 0.75 THEN v END) q3
          FROM cd GROUP BY 1)
    SELECT v.event_type,
      CAST(q.q1 AS DOUBLE) AS q1, CAST(q.q3 AS DOUBLE) AS q3,
      CAST(count(*) AS BIGINT) AS n,
      CAST(count(CASE WHEN v.v < q.q1 - 1.5 * (q.q3 - q.q1)
        THEN 1 END) AS BIGINT) AS n_low,
      CAST(count(CASE WHEN v.v > q.q3 + 1.5 * (q.q3 - q.q1)
        THEN 1 END) AS BIGINT) AS n_high
    FROM v JOIN q ON v.event_type = q.event_type
    GROUP BY v.event_type, q.q1, q.q3
    ORDER BY v.event_type
  """

  // per-dimension centroids rounded into DECIMAL(12,6) right after the
  // avg (simCentroidDistance protocol); dot/norm folds exact decimal
  val simLangCentroidMatrix: String = """
    WITH ex AS (SELECT d.lang,
        unnest(range(len(e.embedding))) AS pos,
        unnest(e.embedding::DOUBLE[]) AS v
      FROM embeddings e
      JOIN documents d ON e.vec_id = d.doc_id),
    cent AS (SELECT lang, pos,
               CAST(round(avg(v), 6) AS DECIMAL(12,6)) c
             FROM ex GROUP BY 1, 2),
    pr AS (SELECT a.lang la, b.lang lb,
             sum(a.c * b.c) dot, sum(a.c * a.c) na2, sum(b.c * b.c) nb2
           FROM cent a JOIN cent b ON a.pos = b.pos AND a.lang <= b.lang
           GROUP BY 1, 2)
    SELECT la AS lang_a, lb AS lang_b,
      round(CAST(dot AS DOUBLE) /
        (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))), 6)
        AS cosine
    FROM pr ORDER BY lang_a, lang_b
  """

  // F = SS_between/SS_total of daily counts by ISO weekday; S_w²/n_w
  // terms rounded into the 9-dp lane before the bounded 7-row sum
  val tsSeasonalStrength: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS HUGEINT) cnt
      FROM events GROUP BY 1, 2),
    tot AS (SELECT event_type, CAST(count(*) AS HUGEINT) n,
              sum(cnt) s, sum(cnt * cnt) ss
            FROM daily GROUP BY 1),
    bd AS (SELECT event_type, isodow(d) dow,
             CAST(count(*) AS HUGEINT) nw, sum(cnt) sw
           FROM daily GROUP BY 1, 2),
    bw AS (SELECT event_type,
             sum(CAST(round(CAST(sw * sw AS DOUBLE) /
               CAST(nw AS DOUBLE), 9) AS DECIMAL(28,9))) bw
           FROM bd GROUP BY 1)
    SELECT t.event_type, CAST(t.n AS BIGINT) AS n_days,
      round((CAST(bw.bw AS DOUBLE) -
          CAST(t.s * t.s AS DOUBLE) / CAST(t.n AS DOUBLE)) /
        (CAST(t.ss AS DOUBLE) -
          CAST(t.s * t.s AS DOUBLE) / CAST(t.n AS DOUBLE)), 6)
        AS seasonal_strength
    FROM tot t JOIN bw ON t.event_type = bw.event_type
    ORDER BY t.event_type
  """

  // 15-min epoch grid mirrors Spark's window(ts,'15 minutes')
  val streamAlertWindows: String = """
    SELECT TIMESTAMP '1970-01-01 00:00:00'
        + to_seconds(CAST(floor(epoch(ts)/900)*900 AS BIGINT)) AS win_start,
      event_type, CAST(count(*) AS BIGINT) AS n_alerts,
      CAST(max(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS max_value
    FROM events WHERE CAST(value AS DECIMAL(12,2)) >= 400
    GROUP BY 1, 2 ORDER BY 1, 2
  """

  // caching is plan-level only — the result is the plain two-band
  // rollup (ties broken by name)
  val scaleCacheReuse: String = """
    WITH r AS (SELECT n.n_name,
        sum(CAST(l_extendedprice AS DECIMAL(12,2))) rev
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
                      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY 1),
    t AS (SELECT 'top' band, n_name, rev FROM r
          ORDER BY rev DESC, n_name LIMIT 3),
    b AS (SELECT 'bottom' band, n_name, rev FROM r
          ORDER BY rev ASC, n_name LIMIT 3)
    SELECT band, n_name, CAST(rev AS DOUBLE) AS revenue
    FROM (SELECT * FROM t UNION ALL SELECT * FROM b)
    ORDER BY band, n_name
  """

  // per-edge neighborhood Jaccard: wedge join for common neighbors,
  // |N(u)\{v} ∪ N(v)\{u}| = deg(u)+deg(v)−2−cn all-integer
  val graphJaccardNeighbors: String = s"""
    WITH $thinnedGraphCte,
    adj AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT a node, CAST(count(*) AS BIGINT) degree
            FROM adj GROUP BY 1),
    cn AS (SELECT e.u, e.v, CAST(count(*) AS BIGINT) common
           FROM und e JOIN adj x ON x.a = e.u
                      JOIN adj y ON y.a = e.v AND y.b = x.b
           WHERE x.b <> e.u AND x.b <> e.v
           GROUP BY e.u, e.v)
    SELECT e.u, e.v, coalesce(cn.common, 0) AS common,
      du.degree + dv.degree - 2 - coalesce(cn.common, 0) AS union_size,
      CASE WHEN du.degree + dv.degree - 2 - coalesce(cn.common, 0) > 0
        THEN round(CAST(coalesce(cn.common, 0) AS DOUBLE) /
          (du.degree + dv.degree - 2 - coalesce(cn.common, 0)), 6)
        ELSE 0.0 END AS jaccard
    FROM und e LEFT JOIN cn ON e.u = cn.u AND e.v = cn.v
               JOIN deg du ON e.u = du.node
               JOIN deg dv ON e.v = dv.node
    ORDER BY e.u, e.v
  """

  // conditional-aggregate one-hot pivot; spend exact DECIMAL
  val mlOneHotFeatures: String = """
    SELECT user_id,
      CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
        AS n_click,
      CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
        AS n_view,
      CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT)
        AS n_signup,
      CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
        AS n_error,
      CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
        AS n_purchase,
      CAST(sum(CASE WHEN event_type = 'purchase'
        THEN CAST(value AS DECIMAL(12,2))
        ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) AS spend
    FROM events GROUP BY user_id ORDER BY user_id
  """

  // m-estimate fraction-free: (n_g·pos_c + m·pos_g)/(n_g·(n_c+m)),
  // both sides exact HUGEINT
  val mlTargetEncode: String = """
    WITH cat AS (SELECT event_type, CAST(count(*) AS HUGEINT) n,
        CAST(sum(CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50
          THEN 1 ELSE 0 END) AS HUGEINT) pos
      FROM events GROUP BY 1),
    g AS (SELECT sum(n) ng, sum(pos) posg FROM cat)
    SELECT event_type, CAST(n AS BIGINT) AS n, CAST(pos AS BIGINT) AS pos,
      round(CAST(ng * pos + posg * 20 AS DOUBLE) /
        CAST(ng * (n + 20) AS DOUBLE), 6) AS target_enc
    FROM cat, g ORDER BY event_type
  """

  // outer-unnest via sentinel [NULL] for empty lists (the LEFT JOIN
  // LATERAL shape); count(term) skips nulls, preserving the contract
  val fnExplodeOuter: String = """
    WITH t AS (SELECT doc_id, lang,
        unnest(CASE WHEN len(l) = 0 THEN [NULL] ELSE l END) term
      FROM (SELECT doc_id, lang,
              list_filter(string_split(text, ' '), x -> x LIKE 'q%') l
            FROM documents))
    SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
      CAST(count(term) AS BIGINT) AS n_rare,
      CAST(count(CASE WHEN term IS NULL THEN 1 END) AS BIGINT)
        AS n_docs_without
    FROM t GROUP BY lang ORDER BY lang
  """

  // division-free crossover: sma5 > sma20 ⇔ 4·sum5 > sum20 in exact
  // integer cents; full 20-day frames only
  val tsSmaCrossover: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS HUGEINT) c
      FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, d,
        sum(c) OVER (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) s5,
        sum(c) OVER (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) s20,
        count(*) OVER (PARTITION BY event_type ORDER BY d
          ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) nf
      FROM daily),
    f AS (SELECT event_type, d,
            CASE WHEN s5 * 4 > s20 THEN 1 ELSE 0 END above
          FROM w WHERE nf = 20),
    g AS (SELECT event_type, d, above,
            lag(above) OVER (PARTITION BY event_type ORDER BY d) prev
          FROM f)
    SELECT event_type, d AS cross_date,
      CASE WHEN above = 1 THEN 'golden' ELSE 'death' END AS direction
    FROM g WHERE prev IS NOT NULL AND above <> prev
    ORDER BY event_type, cross_date
  """

  // first-ever activity day per user classifies each active (user,day)
  val analyticNewReturning: String = """
    WITH active AS (SELECT DISTINCT user_id, CAST(ts AS DATE) d
                    FROM events),
    fd AS (SELECT user_id, min(d) first_d FROM active GROUP BY 1)
    SELECT a.d,
      CAST(count(CASE WHEN a.d = fd.first_d THEN 1 END) AS BIGINT) AS n_new,
      CAST(count(CASE WHEN a.d <> fd.first_d THEN 1 END) AS BIGINT)
        AS n_returning
    FROM active a JOIN fd ON a.user_id = fd.user_id
    GROUP BY a.d ORDER BY a.d
  """

  // 7-row centered frames in integer cents; median/MAD are explicit
  // lower-middle order statistics (DuckDB lists are 1-based)
  val tsHampelFilter: String = """
    WITH s AS (SELECT event_type, ts, event_id,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) c
      FROM events),
    fr AS (SELECT event_type, c,
        list(c) OVER (PARTITION BY event_type ORDER BY ts, event_id
          ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) f
      FROM s),
    m AS (SELECT event_type, c, f,
            list_sort(f)[(len(f) + 1) // 2] med
          FROM fr),
    d AS (SELECT event_type, c, med,
            list_sort(list_transform(f, x -> abs(x - med)))
              [(len(f) + 1) // 2] mad
          FROM m)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN abs(c - med) > mad * 3 THEN 1 ELSE 0 END)
        AS BIGINT) AS n_flagged
    FROM d GROUP BY event_type ORDER BY event_type
  """

  // AP by the rank definition; oracle may use a plain window (no
  // scale constraint on the oracle side); precision@rank rides the
  // 9-dp lane so the mean is order-free
  val mlAveragePrecision: String = """
    WITH s AS (SELECT event_type, event_id,
        CAST(concat('0x', substring(
          md5(CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) k,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y
      FROM events),
    r AS (SELECT event_type, y,
        row_number() OVER (PARTITION BY event_type
          ORDER BY k DESC, event_id) rnk,
        sum(y) OVER (PARTITION BY event_type ORDER BY k DESC, event_id
          ROWS UNBOUNDED PRECEDING) cp
      FROM s),
    p AS (SELECT event_type,
            CAST(round(CAST(cp AS DOUBLE) / rnk, 9) AS DECIMAL(28,9)) prec
          FROM r WHERE y = 1)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pos,
      round(CAST(sum(prec) AS DOUBLE) / count(*), 6) AS avg_precision
    FROM p GROUP BY event_type ORDER BY event_type
  """

  // bounded size domain; cumulative share via the triangular join
  val analyticBasketSizeDist: String = """
    WITH sz AS (SELECT l_orderkey, count(*) s FROM lineitem GROUP BY 1),
    h AS (SELECT s, CAST(count(*) AS BIGINT) n_orders FROM sz GROUP BY 1),
    tot AS (SELECT CAST(sum(n_orders) AS BIGINT) nt FROM h),
    cum AS (SELECT a.s, a.n_orders, CAST(sum(b.n_orders) AS BIGINT) cn
            FROM h a JOIN h b ON b.s <= a.s GROUP BY a.s, a.n_orders)
    SELECT s AS basket_size, n_orders,
      round(CAST(n_orders AS DOUBLE) / nt, 6) AS share,
      round(CAST(cn AS DOUBLE) / nt, 6) AS cum_share
    FROM cum, tot ORDER BY basket_size
  """

  // B=32 deterministic half-subsamples (ONE md5 digest per event; hex
  // digit b <= '7' is replica b's p=1/2 coin, mirroring the Spark
  // side's digit-coin scheme); replica means exact cents → 9-dp lane;
  // band = explicit 2nd/31st order statistics
  val mlSubsampleCi: String = """
    WITH ev AS (SELECT event_type,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) c,
        md5(CAST(event_id AS VARCHAR)) h
      FROM events),
    reps AS (SELECT event_type, b, c
      FROM ev, (SELECT unnest(range(32)) b)
      WHERE substring(h, CAST(b + 1 AS INT), 1) <= '7'),
    means AS (SELECT event_type, b,
        CAST(round(CAST(sum(c) AS DOUBLE) /
          (CAST(count(*) AS DOUBLE) * 100.0), 9) AS DECIMAL(28,9)) m
      FROM reps GROUP BY 1, 2),
    rk AS (SELECT event_type, m,
             row_number() OVER (PARTITION BY event_type ORDER BY m, b) rn
           FROM means)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_replicas,
      round(CAST(sum(m) AS DOUBLE) / count(*), 6) AS mean_of_means,
      round(CAST(max(CASE WHEN rn = 2 THEN m END) AS DOUBLE), 6) AS lo_band,
      round(CAST(max(CASE WHEN rn = 31 THEN m END) AS DOUBLE), 6) AS hi_band
    FROM rk GROUP BY event_type ORDER BY event_type
  """

  // K = 10⁴·(Σf² − N)/N² folded from the term-frequency table; integer
  // until the one scaled division
  val textYuleK: String = """
    WITH tf AS (SELECT lang, unnest(string_split(text, ' ')) AS term
                FROM documents),
    tc AS (SELECT lang, term, CAST(count(*) AS BIGINT) f
           FROM tf GROUP BY 1, 2)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_types,
      CAST(sum(f) AS BIGINT) AS n_tokens,
      round(10000.0 * CAST(sum(f * f) - sum(f) AS DOUBLE) /
        (CAST(sum(f) AS DOUBLE) * CAST(sum(f) AS DOUBLE)), 6) AS yule_k
    FROM tc GROUP BY lang ORDER BY lang
  """

  // sqrt/division-free band test: |c-mean| > 2sigma over a 20-row
  // frame <=> (20c - s)^2 > 4*(20*ss - s^2) in exact integer cents
  val tsBollingerBands: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS HUGEINT) c
      FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, c,
        sum(c) OVER fr s, sum(c * c) OVER fr ss, count(*) OVER fr nf
      FROM daily
      WINDOW fr AS (PARTITION BY event_type ORDER BY d
        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
    f AS (SELECT event_type, c * 20 - s dev,
            (c * 20 - s) * (c * 20 - s) > 4 * (ss * 20 - s * s) brk
          FROM w WHERE nf = 20)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      CAST(sum(CASE WHEN brk AND dev > 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_break_up,
      CAST(sum(CASE WHEN brk AND dev < 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_break_down
    FROM f GROUP BY event_type ORDER BY event_type
  """

  // Monday-aligned weeks both engines; one double division of exact
  // counts
  val analyticStickiness: String = """
    WITH active AS (SELECT DISTINCT event_type, CAST(ts AS DATE) d,
        user_id FROM events),
    wk AS (SELECT event_type, CAST(date_trunc('week', d) AS DATE) week_start,
        CAST(count(*) AS BIGINT) dau_sum,
        CAST(count(DISTINCT d) AS BIGINT) n_days,
        CAST(count(DISTINCT user_id) AS BIGINT) wau
      FROM active GROUP BY 1, 2)
    SELECT event_type, week_start, dau_sum, n_days, wau,
      round(CAST(dau_sum AS DOUBLE) / (CAST(n_days AS DOUBLE) * wau), 6)
        AS stickiness
    FROM wk ORDER BY event_type, week_start
  """

  // per-row logs in the 9-dp lane scaled to integer nano-units so all
  // four moment sums are exact; one double division for the slope
  val analyticPriceElasticity: String = """
    WITH j AS (SELECT p.p_type,
        CAST(CAST(round(ln(CAST(CAST(p.p_retailprice AS DECIMAL(12,2))
          AS DOUBLE)), 9) AS DECIMAL(28,9)) * 1000000000 AS HUGEINT) x,
        CAST(CAST(round(ln(CAST(CAST(l.l_quantity AS DECIMAL(12,2))
          AS DOUBLE)), 9) AS DECIMAL(28,9)) * 1000000000 AS HUGEINT) y
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    m AS (SELECT p_type, CAST(count(*) AS BIGINT) n,
        sum(x) sx, sum(y) sy, sum(x * y) sxy, sum(x * x) sxx
      FROM j GROUP BY 1)
    SELECT p_type, n,
      round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
          CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS elasticity
    FROM m ORDER BY p_type
  """

  // WOE = ln((pos*N)/(neg*P)); IV term multiplies the exact
  // distribution gap by it — all per-row scalar math
  val mlWoeIv: String = """
    WITH seg AS (SELECT c.c_mktsegment,
        CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
          AS BIGINT) pos,
        CAST(sum(CASE WHEN o.o_orderstatus <> 'F' THEN 1 ELSE 0 END)
          AS BIGINT) neg
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1),
    tot AS (SELECT sum(pos) tp, sum(neg) tn FROM seg)
    SELECT s.c_mktsegment, s.pos, s.neg,
      round(ln((CAST(s.pos AS DOUBLE) * CAST(t.tn AS DOUBLE)) /
        (CAST(s.neg AS DOUBLE) * CAST(t.tp AS DOUBLE))), 6) AS woe,
      round((CAST(s.pos AS DOUBLE) / CAST(t.tp AS DOUBLE) -
          CAST(s.neg AS DOUBLE) / CAST(t.tn AS DOUBLE)) *
        round(ln((CAST(s.pos AS DOUBLE) * CAST(t.tn AS DOUBLE)) /
          (CAST(s.neg AS DOUBLE) * CAST(t.tp AS DOUBLE))), 6), 6)
        AS iv_term
    FROM seg s CROSS JOIN tot t ORDER BY s.c_mktsegment
  """

  // the oracle checks what it can without the cipher: recovered
  // plaintext and the PKCS-padded length (next 16-byte block)
  val fnAesRoundtrip: String = """
    SELECT doc_id, text AS text_rt,
      CAST(16 * (length(text) // 16 + 1) AS BIGINT) AS cipher_bytes
    FROM documents ORDER BY doc_id
  """

  // exact epoch-microsecond gaps; discrete percentiles pick observed
  // values, so no rounding protocol is needed for them
  val tsInterarrival: String = """
    WITH g AS (SELECT event_type,
        epoch_us(ts) - lag(epoch_us(ts)) OVER
          (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) gap
      FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
      min(gap) AS min_us, max(gap) AS max_us,
      CAST(sum(gap) // count(*) AS BIGINT) AS mean_floor_us,
      CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap) AS BIGINT)
        AS p50_us,
      CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap) AS BIGINT)
        AS p90_us
    FROM g WHERE gap IS NOT NULL
    GROUP BY event_type ORDER BY event_type
  """

  // exact discrete P5/P95 caps; winsorized sum in exact integer cents
  val tsWinsorize: String = """
    WITH z AS (SELECT event_type,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) c FROM events),
    p AS (SELECT event_type,
        CAST(percentile_disc(0.05) WITHIN GROUP (ORDER BY c) AS BIGINT) lo,
        CAST(percentile_disc(0.95) WITHIN GROUP (ORDER BY c) AS BIGINT) hi
      FROM z GROUP BY event_type)
    SELECT z.event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN z.c < p.lo THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clip_lo,
      CAST(sum(CASE WHEN z.c > p.hi THEN 1 ELSE 0 END) AS BIGINT)
        AS n_clip_hi,
      CAST(sum(CASE WHEN z.c < p.lo THEN p.lo
                    WHEN z.c > p.hi THEN p.hi ELSE z.c END) AS BIGINT)
        AS winsorized_cents
    FROM z JOIN p ON z.event_type = p.event_type
    GROUP BY z.event_type ORDER BY z.event_type
  """

  // exact integer moments; d/g are per-row scalar doubles (sqrt is
  // IEEE exact-rounded)
  val mlEffectSize: String = """
    WITH m AS (SELECT event_type, CAST(count(*) AS BIGINT) n,
        sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT)) s,
        sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) *
            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT)) ss
      FROM events GROUP BY 1),
    pr AS (SELECT a.event_type type_a, b.event_type type_b,
        a.n n1, b.n n2,
        CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) m1,
        CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) m2,
        (CAST(a.n AS DOUBLE) * CAST(a.ss AS DOUBLE) -
          CAST(a.s AS DOUBLE) * CAST(a.s AS DOUBLE)) /
          (CAST(a.n AS DOUBLE) * CAST(a.n - 1 AS DOUBLE)) v1,
        (CAST(b.n AS DOUBLE) * CAST(b.ss AS DOUBLE) -
          CAST(b.s AS DOUBLE) * CAST(b.s AS DOUBLE)) /
          (CAST(b.n AS DOUBLE) * CAST(b.n - 1 AS DOUBLE)) v2
      FROM m a JOIN m b ON a.event_type < b.event_type),
    dd AS (SELECT type_a, type_b, n1, n2,
        (m1 - m2) / sqrt((CAST(n1 - 1 AS DOUBLE) * v1 +
          CAST(n2 - 1 AS DOUBLE) * v2) / CAST(n1 + n2 - 2 AS DOUBLE)) d
      FROM pr)
    SELECT type_a, type_b, n1, n2, round(d, 6) AS cohens_d,
      round(d * (1.0 - 3.0 / (4.0 * CAST(n1 + n2 AS DOUBLE) - 9)), 6)
        AS hedges_g
    FROM dd ORDER BY type_a, type_b
  """

  // Luhn re-derived from first principles: reverse, double every
  // second digit, subtract 9 above 9, sum mod 10
  val fnLuhnCheck: String = """
    WITH s AS (SELECT o_orderpriority,
        reverse(CAST(o_orderkey AS VARCHAR)) r FROM orders),
    t AS (SELECT o_orderpriority,
        list_sum(list_transform(range(1, length(r) + 1), i ->
          CASE WHEN i % 2 = 1 THEN CAST(substr(r, i, 1) AS INTEGER)
               WHEN CAST(substr(r, i, 1) AS INTEGER) * 2 > 9
                 THEN CAST(substr(r, i, 1) AS INTEGER) * 2 - 9
               ELSE CAST(substr(r, i, 1) AS INTEGER) * 2 END)) ls
      FROM s)
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN ls % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_luhn_valid
    FROM t GROUP BY o_orderpriority ORDER BY o_orderpriority
  """

  // distinct directed type-transition edges; reciprocity via semi join
  val graphReciprocity: String = """
    WITH tr AS (SELECT event_type dst,
        lag(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) src
      FROM events),
    e AS (SELECT DISTINCT src, dst FROM tr
          WHERE src IS NOT NULL AND src <> dst),
    r AS (SELECT count(*) nr FROM e
          WHERE EXISTS (SELECT 1 FROM e e2
                        WHERE e2.src = e.dst AND e2.dst = e.src))
    SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
      CAST(r.nr AS BIGINT) AS n_reciprocal,
      round(CAST(r.nr AS DOUBLE) /
        CAST((SELECT count(*) FROM e) AS DOUBLE), 6) AS reciprocity
    FROM r
  """

  // calendar-month rollup in exact cents; one scalar double division
  val analyticMomGrowth: String = """
    WITH monthly AS (SELECT n.n_name,
        CAST(date_trunc('month', o.o_orderdate) AS DATE) mstart,
        CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2)))
          AS DECIMAL(18,2)) rev
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2),
    g AS (SELECT n_name, mstart, rev,
        lag(rev) OVER (PARTITION BY n_name ORDER BY mstart) prev
      FROM monthly)
    SELECT n_name, mstart, CAST(rev * 100 AS BIGINT) AS rev_cents,
      round(CAST(rev - prev AS DOUBLE) / CAST(prev AS DOUBLE), 6)
        AS mom_growth
    FROM g ORDER BY n_name, mstart
  """

  // calendar-band frames (10 present days within 9 calendar days);
  // moments exact, correlation a per-row scalar double
  val tsRollingCorr: String = """
    WITH dp AS (SELECT CAST(ts AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS HUGEINT) c1
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    dv AS (SELECT CAST(ts AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS HUGEINT) c2
      FROM events WHERE event_type = 'view' GROUP BY 1),
    j AS (SELECT dp.d, dp.c1, dv.c2 FROM dp JOIN dv ON dp.d = dv.d),
    band AS (SELECT a.d ad, b.c1, b.c2
      FROM j a JOIN j b ON b.d BETWEEN a.d - 9 AND a.d),
    m AS (SELECT ad, count(*) nf, sum(c1) s1, sum(c2) s2,
        sum(c1 * c1) s11, sum(c2 * c2) s22, sum(c1 * c2) s12
      FROM band GROUP BY ad)
    SELECT ad AS d,
      round((10.0 * CAST(s12 AS DOUBLE) -
          CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)) /
        sqrt((10.0 * CAST(s11 AS DOUBLE) -
            CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) *
          (10.0 * CAST(s22 AS DOUBLE) -
            CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 6)
        AS rolling_corr
    FROM m WHERE nf = 10 ORDER BY d
  """

  // (p-y)^2 with dyadic p has an exact integer numerator; one double
  // division per group
  val mlBrierScore: String = """
    WITH z AS (SELECT event_type,
        CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 6))
          AS BIGINT) k,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y
      FROM events),
    u AS (SELECT event_type, y,
            (k * 2 + 1 - y * 33554432) * (k * 2 + 1 - y * 33554432) uu
          FROM z)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(y) AS BIGINT) AS n_pos,
      round(CAST(sum(uu) AS DOUBLE) /
        (CAST(count(*) AS DOUBLE) * 1.125899906842624e15), 6) AS brier
    FROM u GROUP BY event_type ORDER BY event_type
  """

  // 24-row hour contingency, then the 23 candidate splits evaluate on
  // the bounded table; impurity is per-row scalar double math
  val mlGiniSplit: String = """
    WITH bh AS (SELECT CAST(hour(ts) AS INTEGER) h,
        CAST(count(*) AS BIGINT) nh,
        CAST(sum(CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50
          THEN 1 ELSE 0 END) AS BIGINT) ph
      FROM events GROUP BY 1),
    th AS (SELECT h t FROM bh WHERE h >= 1),
    sp AS (SELECT t,
        CAST(sum(CASE WHEN h < t THEN nh ELSE 0 END) AS BIGINT) nl,
        CAST(sum(CASE WHEN h < t THEN ph ELSE 0 END) AS BIGINT) pl,
        CAST(sum(CASE WHEN h >= t THEN nh ELSE 0 END) AS BIGINT) nr,
        CAST(sum(CASE WHEN h >= t THEN ph ELSE 0 END) AS BIGINT) pr
      FROM th CROSS JOIN bh GROUP BY t)
    SELECT t, nl, pl, nr, pr,
      round((CAST(nl AS DOUBLE) * (1.0 -
          (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)) *
            (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE)) -
          ((CAST(nl AS DOUBLE) - CAST(pl AS DOUBLE)) / CAST(nl AS DOUBLE)) *
            ((CAST(nl AS DOUBLE) - CAST(pl AS DOUBLE)) / CAST(nl AS DOUBLE)))
        + CAST(nr AS DOUBLE) * (1.0 -
          (CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE)) *
            (CAST(pr AS DOUBLE) / CAST(nr AS DOUBLE)) -
          ((CAST(nr AS DOUBLE) - CAST(pr AS DOUBLE)) / CAST(nr AS DOUBLE)) *
            ((CAST(nr AS DOUBLE) - CAST(pr AS DOUBLE)) / CAST(nr AS DOUBLE))))
        / CAST(nl + nr AS DOUBLE), 6) AS weighted_gini
    FROM sp ORDER BY t
  """

  // 30-minute-gap sessions (the sessionize shape); one double division
  // of exact session counts per first-event type
  val analyticBounceRate: String = """
    WITH f AS (SELECT user_id, ts, event_id, event_type,
        CASE WHEN lag(ts) OVER w IS NULL
               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
             THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (SELECT user_id, ts, event_id, event_type,
        sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS UNBOUNDED PRECEDING) AS session_id
      FROM f),
    r AS (SELECT user_id, session_id, count(*) AS n_events
          FROM g GROUP BY 1, 2),
    ft AS (SELECT user_id, session_id, event_type,
             row_number() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts, event_id) AS rk
           FROM g),
    s AS (SELECT ft.event_type first_type, r.n_events
          FROM r JOIN ft ON r.user_id = ft.user_id
             AND r.session_id = ft.session_id AND ft.rk = 1)
    SELECT first_type, CAST(count(*) AS BIGINT) AS n_sessions,
      CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_bounce,
      round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE) /
        CAST(count(*) AS DOUBLE), 6) AS bounce_rate
    FROM s GROUP BY first_type ORDER BY first_type
  """

  // VMR from three exact integers; rounded-value + term total order
  val textBurstiness: String = """
    WITH tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) term
            FROM documents)
      GROUP BY term, doc_id),
    st AS (SELECT term, CAST(count(*) AS BIGINT) df,
        CAST(sum(tf) AS BIGINT) stf, sum(tf * tf) stf2
      FROM tf GROUP BY term HAVING sum(tf) >= 50),
    nn AS (SELECT CAST(count(*) AS BIGINT) nd FROM documents)
    SELECT term, df, stf AS total_tf,
      round((CAST(nd AS DOUBLE) * CAST(stf2 AS DOUBLE) -
          CAST(stf AS DOUBLE) * CAST(stf AS DOUBLE)) /
        (CAST(nd AS DOUBLE) * CAST(stf AS DOUBLE)), 6) AS vmr
    FROM st CROSS JOIN nn
    ORDER BY vmr DESC, term LIMIT 20
  """

  // md5-based hashing trick (engine-neutral, never a JVM hashCode)
  val mlFeatureHash: String = """
    WITH t AS (SELECT lang, unnest(string_split(text, ' ')) term
               FROM documents),
    b AS (SELECT lang, term,
        CAST(CAST(concat('0x', substring(md5(term), 1, 6)) AS BIGINT) % 64
          AS INTEGER) bucket
      FROM t)
    SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_tokens,
      CAST(count(DISTINCT term) AS BIGINT) AS n_terms
    FROM b GROUP BY lang, bucket ORDER BY lang, bucket
  """

  // 64-byte tile manifest: offsets and fingerprints are pure functions
  // of the payload
  val multimodalTileGrid: String = """
    WITH d AS (SELECT doc_id, text,
        CAST(length(text) // 64 AS BIGINT) n_tiles
      FROM documents WHERE length(text) // 64 >= 1),
    e AS (SELECT doc_id, text, n_tiles,
            unnest(range(0, n_tiles)) t FROM d)
    SELECT doc_id, n_tiles, CAST(t AS BIGINT) AS tile_id,
      CAST(t * 64 AS BIGINT) AS tile_offset,
      md5(substring(text, CAST(t * 64 + 1 AS INTEGER), 64)) AS tile_md5
    FROM e ORDER BY doc_id, tile_id
  """

  // recency survivorship: top-1 per key under a total order
  val dedupLatestByKey: String = """
    WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        row_number() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate DESC, o_orderkey DESC) rn
      FROM orders)
    SELECT o_custkey, o_orderkey,
      CAST(o_orderdate AS DATE) AS last_order_date,
      CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        AS last_cents
    FROM r WHERE rn = 1 ORDER BY o_custkey
  """

  // (A\B) ∪ (B\A) with side tags
  val setSymmetricDiff: String = """
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1995),
    b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE year(o_orderdate) = 1996)
    SELECT o_custkey, '1995_only' AS side
    FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)
    UNION ALL
    SELECT o_custkey, '1996_only' AS side
    FROM (SELECT o_custkey FROM b EXCEPT SELECT o_custkey FROM a)
    ORDER BY o_custkey, side
  """

  // exact decimal moment sums; the VWAP division is the one double op
  val tsVwap: String = """
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS mstart,
      l_returnflag,
      CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
        AS DECIMAL(38,2)) * 100 AS BIGINT) AS qty_cents,
      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
          CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) /
        CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2)))
          AS DECIMAL(38,2)) AS DOUBLE), 6) AS vwap
    FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2
  """

  // 1-based positions via unnest(range); window <= 2, i < j
  val textSkipgramPairs: String = """
    WITH p AS (SELECT doc_id, string_split(text, ' ') l FROM documents),
    t AS (SELECT doc_id, unnest(range(1, len(l) + 1)) pos, l FROM p),
    tt AS (SELECT doc_id, pos, l[pos] term FROM t),
    pr AS (SELECT a.term center, b.term context FROM tt a JOIN tt b
      ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 2)
    SELECT center, context, CAST(count(*) AS BIGINT) AS n
    FROM pr GROUP BY 1, 2 ORDER BY n DESC, center, context LIMIT 30
  """

  // 24 conditional-entropy terms land in the 9-dp lane before the
  // bounded sum; ln2 is a shared literal
  val mlInfoGain: String = """
    WITH base AS (SELECT CAST(hour(ts) AS INTEGER) h,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y
      FROM events),
    g AS (SELECT CAST(count(*) AS BIGINT) n, CAST(sum(y) AS BIGINT) pos
          FROM base),
    bh AS (SELECT h, CAST(count(*) AS BIGINT) nh,
             CAST(sum(y) AS BIGINT) ph FROM base GROUP BY h),
    cond AS (SELECT sum(CAST(round(
        (CAST(nh AS DOUBLE) / CAST(n AS DOUBLE)) *
        ((CASE WHEN ph = 0 OR ph = nh THEN 0.0
          ELSE -((CAST(ph AS DOUBLE) / CAST(nh AS DOUBLE)) *
              ln(CAST(ph AS DOUBLE) / CAST(nh AS DOUBLE)) +
            (CAST(nh - ph AS DOUBLE) / CAST(nh AS DOUBLE)) *
              ln(CAST(nh - ph AS DOUBLE) / CAST(nh AS DOUBLE)))
          END) / 0.6931471805599453), 9) AS DECIMAL(28,9))) cond9
      FROM bh CROSS JOIN g)
    SELECT n, pos,
      round((CASE WHEN pos = 0 OR pos = n THEN 0.0
        ELSE -((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) *
            ln(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) +
          (CAST(n - pos AS DOUBLE) / CAST(n AS DOUBLE)) *
            ln(CAST(n - pos AS DOUBLE) / CAST(n AS DOUBLE)))
        END) / 0.6931471805599453, 6) AS entropy_bits,
      round(CAST(cond9 AS DOUBLE), 6) AS cond_entropy_bits,
      round(round((CASE WHEN pos = 0 OR pos = n THEN 0.0
        ELSE -((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) *
            ln(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)) +
          (CAST(n - pos AS DOUBLE) / CAST(n AS DOUBLE)) *
            ln(CAST(n - pos AS DOUBLE) / CAST(n AS DOUBLE)))
        END) / 0.6931471805599453, 9) - CAST(cond9 AS DOUBLE), 6)
        AS info_gain_bits
    FROM g CROSS JOIN cond
  """

  // ISO weekday on both engines (DuckDB's native isodow; Spark derives
  // it from Sunday-based dayofweek)
  val analyticDowHourProfile: String = """
    SELECT CAST(isodow(ts) AS INTEGER) AS isodow,
      CAST(hour(ts) AS INTEGER) AS h,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)
        AS rev_cents
    FROM events GROUP BY 1, 2 ORDER BY 1, 2
  """

  // exact cosine over the count-capped md5 holdout (P = ceil(n/256));
  // 9-dp-rounded rank key + neighbor-id tie-break, majority vote ties
  // broken by (count desc, lang); identical coin on both engines
  val mlKnnClassify: String = s"""
    WITH lab AS (SELECT e.vec_id, d.lang, e.embedding
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
    cap AS (SELECT CAST(ceil(count(*) / 256.0) AS BIGINT) p FROM lab),
    q AS (SELECT lab.* FROM lab, cap
          WHERE CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 6)
                  AS BIGINT) % p = 0),
    p AS (SELECT a.vec_id qid, a.lang qlang, b.vec_id nid, b.lang nlang,
        round($cosExpr, 9) c9
      FROM q a JOIN lab b ON a.vec_id <> b.vec_id),
    r AS (SELECT qid, qlang, nid, nlang, row_number() OVER
        (PARTITION BY qid ORDER BY c9 DESC, nid) rn FROM p),
    v AS (SELECT qid, qlang, nlang, count(*) cnt FROM r WHERE rn <= 5
          GROUP BY 1, 2, 3),
    w AS (SELECT qid, qlang, nlang pred, row_number() OVER
        (PARTITION BY qid ORDER BY cnt DESC, nlang) vr FROM v),
    j AS (SELECT qlang AS lang, pred FROM w WHERE vr = 1)
    SELECT lang, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT)
        AS n_correct,
      round(CAST(sum(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS DOUBLE) /
        CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM j GROUP BY lang ORDER BY lang
  """

  // one direct pass; a hash match proves the two-half moment merge is
  // exact
  val aggVarianceMerge: String = """
    WITH z AS (SELECT event_type,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) c
      FROM events),
    m AS (SELECT event_type, CAST(count(*) AS BIGINT) n,
        sum(c) s, sum(c * c) ss FROM z GROUP BY 1)
    SELECT event_type, n,
      round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean,
      round((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) -
          CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 10000.0, 6) AS var_pop
    FROM m ORDER BY event_type
  """

  // eight exact moments; Cramer's rule as scalar double math on the
  // single global row
  val mlPolyFit: String = """
    WITH daily AS (SELECT CAST(ts AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS HUGEINT) y
      FROM events GROUP BY 1),
    d0 AS (SELECT min(d) d0 FROM daily),
    xy AS (SELECT CAST(date_diff('day', d0.d0, daily.d) AS BIGINT) x, y
           FROM daily CROSS JOIN d0),
    x2t AS (SELECT x, y, x * x x2 FROM xy),
    m AS (SELECT CAST(count(*) AS BIGINT) n,
        CAST(sum(x) AS BIGINT) sx, CAST(sum(x2) AS BIGINT) sx2,
        sum(CAST(x AS HUGEINT) * x2) sx3, sum(CAST(x2 AS HUGEINT) * x2) sx4,
        sum(y) sy, sum(CAST(x AS HUGEINT) * y) sxy, sum(CAST(x2 AS HUGEINT) * y) sx2y
      FROM x2t)
    SELECT n AS n_days,
      round((CAST(sy AS DOUBLE) * (CAST(sx2 AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx3 AS DOUBLE)) -
          CAST(sx AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx2y AS DOUBLE)) +
          CAST(sx2 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(sx3 AS DOUBLE) -
            CAST(sx2 AS DOUBLE) * CAST(sx2y AS DOUBLE))) /
        (CAST(n AS DOUBLE) * (CAST(sx2 AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx3 AS DOUBLE)) -
          CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx2 AS DOUBLE)) +
          CAST(sx2 AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx3 AS DOUBLE) -
            CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))) / 100.0, 6) AS a0,
      round((CAST(n AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx2y AS DOUBLE)) -
          CAST(sy AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx2 AS DOUBLE)) +
          CAST(sx2 AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx2y AS DOUBLE) -
            CAST(sxy AS DOUBLE) * CAST(sx2 AS DOUBLE))) /
        (CAST(n AS DOUBLE) * (CAST(sx2 AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx3 AS DOUBLE)) -
          CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx2 AS DOUBLE)) +
          CAST(sx2 AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx3 AS DOUBLE) -
            CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))) / 100.0, 6) AS a1,
      round((CAST(n AS DOUBLE) * (CAST(sx2 AS DOUBLE) * CAST(sx2y AS DOUBLE) -
            CAST(sxy AS DOUBLE) * CAST(sx3 AS DOUBLE)) -
          CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx2y AS DOUBLE) -
            CAST(sxy AS DOUBLE) * CAST(sx2 AS DOUBLE)) +
          CAST(sy AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx3 AS DOUBLE) -
            CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))) /
        (CAST(n AS DOUBLE) * (CAST(sx2 AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx3 AS DOUBLE)) -
          CAST(sx AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx4 AS DOUBLE) -
            CAST(sx3 AS DOUBLE) * CAST(sx2 AS DOUBLE)) +
          CAST(sx2 AS DOUBLE) * (CAST(sx AS DOUBLE) * CAST(sx3 AS DOUBLE) -
            CAST(sx2 AS DOUBLE) * CAST(sx2 AS DOUBLE))) / 100.0, 6) AS a2
    FROM m
  """

  // multi-agg pivot expands to conditional aggregation; sum(CASE)
  // keeps Spark's null-on-empty pivot-cell semantics
  val sqlPivotMulti: String = """
    WITH z AS (SELECT l_returnflag, l_linestatus,
        CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) c
      FROM lineitem)
    SELECT l_returnflag,
      CAST(sum(CASE WHEN l_linestatus = 'O' THEN c END) AS BIGINT) AS o_sq,
      CAST(sum(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS o_nq,
      CAST(sum(CASE WHEN l_linestatus = 'F' THEN c END) AS BIGINT) AS f_sq,
      CAST(sum(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS f_nq
    FROM z GROUP BY l_returnflag ORDER BY l_returnflag
  """

  // first-fit packing in pure integer math over the bounded day list
  val pipelineCompactionPlan: String = """
    WITH parts AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(sum(length(props) + 64) AS BIGINT) est_bytes
      FROM events GROUP BY 1, 2),
    c AS (SELECT event_type, d, est_bytes,
        sum(est_bytes) OVER (PARTITION BY event_type ORDER BY d
          ROWS UNBOUNDED PRECEDING) cum
      FROM parts),
    g AS (SELECT event_type,
        CAST((cum - est_bytes) // 262144 AS BIGINT) grp, d, est_bytes
      FROM c)
    SELECT event_type, grp, CAST(count(*) AS BIGINT) AS n_partitions,
      CAST(sum(est_bytes) AS BIGINT) AS group_bytes,
      min(d) AS first_day, max(d) AS last_day
    FROM g GROUP BY 1, 2 ORDER BY event_type, grp
  """

  // the roundtrip target is the original table: lossless partition
  // encode/decode means the re-aggregation matches this direct pass
  val sourcePartitionedRoundtrip: String = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_cents,
      min(event_id) AS min_id, max(event_id) AS max_id
    FROM events GROUP BY event_type ORDER BY event_type
  """

  // fixed-point HITS: each half-round renormalizes (score*1e6) //
  // max(score) — integer floor division, identical truncation on both
  // engines, magnitude bounded regardless of scale (engine comment)
  val graphHitsScores: String = """
    WITH e AS (SELECT DISTINCT o.o_custkey c, l.l_partkey p
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    h0 AS (SELECT DISTINCT c, CAST(1 AS HUGEINT) h FROM e),
    a1r AS (SELECT p, sum(h) a FROM e JOIN h0 USING (c) GROUP BY p),
    a1 AS (SELECT p, (a * 1000000) // (SELECT max(a) FROM a1r) a FROM a1r),
    h1r AS (SELECT c, sum(a) h FROM e JOIN a1 USING (p) GROUP BY c),
    h1 AS (SELECT c, (h * 1000000) // (SELECT max(h) FROM h1r) h FROM h1r),
    a2r AS (SELECT p, sum(h) a FROM e JOIN h1 USING (c) GROUP BY p),
    a2 AS (SELECT p, (a * 1000000) // (SELECT max(a) FROM a2r) a FROM a2r),
    h2r AS (SELECT c, sum(a) h FROM e JOIN a2 USING (p) GROUP BY c),
    h2 AS (SELECT c, (h * 1000000) // (SELECT max(h) FROM h2r) h FROM h2r),
    a3r AS (SELECT p, sum(h) a FROM e JOIN h2 USING (c) GROUP BY p),
    a3 AS (SELECT p, (a * 1000000) // (SELECT max(a) FROM a3r) a FROM a3r),
    h3r AS (SELECT c, sum(a) h FROM e JOIN a3 USING (p) GROUP BY c),
    h3 AS (SELECT c, (h * 1000000) // (SELECT max(h) FROM h3r) h FROM h3r),
    hub AS (SELECT c node, 'hub' AS hits_role, CAST(h AS VARCHAR) score
            FROM h3 ORDER BY h DESC, c LIMIT 20),
    aut AS (SELECT p node, 'authority' AS hits_role, CAST(a AS VARCHAR) score
            FROM a3 ORDER BY a DESC, p LIMIT 20)
    SELECT * FROM (SELECT * FROM hub UNION ALL SELECT * FROM aut)
    ORDER BY hits_role, node
  """

  // nonempty buckets vs the key span they cover (clamped to global
  // min/max); pure integer math
  val pipelineKeyGapAudit: String = """
    WITH b AS (SELECT o_orderkey // 4096 bucket,
        CAST(count(*) AS BIGINT) n
      FROM orders GROUP BY 1),
    g AS (SELECT min(o_orderkey) gmin, max(o_orderkey) gmax FROM orders),
    x AS (SELECT bucket, n,
        least(bucket * 4096 + 4095, gmax) -
          greatest(bucket * 4096, gmin) + 1 expected
      FROM b CROSS JOIN g)
    SELECT bucket, n, CAST(expected AS BIGINT) AS expected,
      CAST(expected - n AS BIGINT) AS missing
    FROM x ORDER BY bucket
  """

  // the XPath roundtrip must land back on the source columns
  // (deterministic 1-in-4 slice mirrors the engine side)
  val fnXpath: String = """
    SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_cents
    FROM orders WHERE o_orderkey % 4 = 0 GROUP BY 1 ORDER BY 1
  """

  // same-weekday equi-join on the bounded daily rollup; one scalar
  // double division per row
  val tsWowAligned: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) cents
      FROM events GROUP BY 1, 2)
    SELECT c.event_type, c.d, c.cents, p.cents AS prev_week_cents,
      round(CAST(c.cents - p.cents AS DOUBLE) /
        CAST(p.cents AS DOUBLE), 6) AS wow_pct
    FROM daily c JOIN daily p
      ON c.event_type = p.event_type AND p.d = c.d - 7
    ORDER BY c.event_type, c.d
  """

  // 128-byte windows reduced to exact byte sums (ASCII payloads:
  // ord(char) == byte value)
  val multimodalWindowEnergy: String = """
    WITH d AS (SELECT doc_id, text,
        CAST(length(text) // 128 AS BIGINT) n_win
      FROM documents WHERE length(text) // 128 >= 1),
    e AS (SELECT doc_id, text, n_win, unnest(range(0, n_win)) w FROM d),
    s AS (SELECT doc_id, n_win, CAST(w AS BIGINT) win_id,
            substring(text, CAST(w * 128 + 1 AS INTEGER), 128) sub
          FROM e)
    SELECT doc_id, n_win, win_id,
      CAST(list_sum(list_transform(range(1, length(sub) + 1),
        i -> ord(substr(sub, i, 1)))) AS BIGINT) AS energy
    FROM s ORDER BY doc_id, win_id
  """

  // floor mean-gap per returning buyer; exact discrete quartiles
  val analyticRepeatPurchase: String = """
    WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) k,
        date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE))) span
      FROM events WHERE event_type = 'purchase' GROUP BY 1),
    g AS (SELECT CAST(span // (k - 1) AS BIGINT) gap FROM u WHERE k >= 2)
    SELECT CAST(count(*) AS BIGINT) AS n_repeat_users,
      CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY gap) AS BIGINT)
        AS p25_days,
      CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY gap) AS BIGINT)
        AS p50_days,
      CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY gap) AS BIGINT)
        AS p75_days,
      CAST(max(gap) AS BIGINT) AS max_days
    FROM g
  """

  // Laplace-smoothed log-probs in the 9-dp lane; per-doc score is an
  // exact decimal sum; argmax ties break (score desc, lang asc)
  val mlNbSqlExact: String = """
    WITH docs AS (SELECT doc_id, lang, text,
        CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))
          AS BIGINT) % 5 < 4 is_train
      FROM documents),
    ttok AS (SELECT lang, unnest(string_split(text, ' ')) term
             FROM docs WHERE is_train),
    lt AS (SELECT lang, CAST(count(*) AS BIGINT) nl FROM ttok GROUP BY 1),
    vv AS (SELECT CAST(count(DISTINCT term) AS BIGINT) v FROM ttok),
    cc AS (SELECT lang, CAST(count(*) AS BIGINT) ndocs
           FROM docs WHERE is_train GROUP BY 1),
    ntr AS (SELECT CAST(count(*) AS BIGINT) nt FROM docs WHERE is_train),
    tlc AS (SELECT term, lang, CAST(count(*) AS BIGINT) c
            FROM ttok GROUP BY 1, 2),
    tl AS (SELECT term, tlc.lang,
        CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(nl + v AS DOUBLE)), 9)
          AS DECIMAL(28,9)) lp
      FROM tlc JOIN lt ON tlc.lang = lt.lang CROSS JOIN vv),
    fl AS (SELECT lang, CAST(round(ln(1.0 / CAST(nl + v AS DOUBLE)), 9)
          AS DECIMAL(28,9)) lp0
      FROM lt CROSS JOIN vv),
    pr AS (SELECT lang, CAST(round(ln(CAST(ndocs AS DOUBLE) /
          CAST(nt AS DOUBLE)), 9) AS DECIMAL(28,9)) lprior
      FROM cc CROSS JOIN ntr),
    tst AS (SELECT doc_id, lang truth, unnest(string_split(text, ' ')) term
            FROM docs WHERE NOT is_train),
    sc AS (SELECT t.doc_id, t.truth, l.lang cand,
        sum(coalesce(tl.lp, fl.lp0)) toksum
      FROM tst t CROSS JOIN (SELECT lang FROM lt) l
      LEFT JOIN tl ON tl.term = t.term AND tl.lang = l.lang
      JOIN fl ON fl.lang = l.lang
      GROUP BY 1, 2, 3),
    fin AS (SELECT doc_id, truth, cand,
        CAST(sc.toksum + pr.lprior AS DECIMAL(28,9)) score
      FROM sc JOIN pr ON pr.lang = sc.cand),
    pd AS (SELECT doc_id, truth, cand, row_number() OVER
        (PARTITION BY doc_id ORDER BY score DESC, cand) rn FROM fin)
    SELECT truth, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN cand = truth THEN 1 ELSE 0 END) AS BIGINT)
        AS n_correct,
      round(CAST(sum(CASE WHEN cand = truth THEN 1 ELSE 0 END) AS DOUBLE) /
        CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pd WHERE rn = 1 GROUP BY truth ORDER BY truth
  """

  // nested md5 fractions vs a fixed 20% holdout; all counts exact
  val mlLearningCurve: String = """
    WITH base AS (SELECT
        CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 6))
          AS BIGINT) % 100 slot,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y
      FROM events),
    fr AS (SELECT unnest([10, 20, 40, 80]) frac),
    tr AS (SELECT frac, CAST(count(*) AS BIGINT) n_train,
        CAST(sum(y) AS BIGINT) pos_train
      FROM base CROSS JOIN fr WHERE slot < 80 AND slot < frac
      GROUP BY 1),
    ho AS (SELECT CAST(count(*) AS BIGINT) n_test,
        CAST(sum(y) AS BIGINT) pos_test FROM base WHERE slot >= 80)
    SELECT frac, n_train,
      CAST(CASE WHEN pos_train * 2 > n_train THEN 1 ELSE 0 END
        AS INTEGER) AS majority_label,
      n_test,
      round(CASE WHEN pos_train * 2 > n_train THEN CAST(pos_test AS DOUBLE)
        ELSE CAST(n_test - pos_test AS DOUBLE) END /
        CAST(n_test AS DOUBLE), 6) AS holdout_accuracy
    FROM tr CROSS JOIN ho ORDER BY frac
  """

  // YTD restart is the (nation, year) partition boundary
  val tsYtdCumulative: String = """
    WITH monthly AS (SELECT n.n_name,
        CAST(year(o.o_orderdate) AS INTEGER) yr,
        CAST(month(o.o_orderdate) AS INTEGER) mon,
        CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
          cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2, 3)
    SELECT n_name, yr, mon, cents,
      CAST(sum(cents) OVER (PARTITION BY n_name, yr ORDER BY mon
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ytd_cents
    FROM monthly ORDER BY n_name, yr, mon
  """

  // pure integer envelope over the bounded daily rollup
  val winRollingMinmax: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) cents
      FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, d, cents,
        min(cents) OVER fr roll_min, max(cents) OVER fr roll_max,
        count(*) OVER fr nf
      FROM daily
      WINDOW fr AS (PARTITION BY event_type ORDER BY d
        ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, d, cents, roll_min, roll_max
    FROM w WHERE nf = 7 ORDER BY event_type, d
  """

  // postings carry sorted 1-based positions; df ranking ties on term
  val textPositionalIndex: String = """
    WITH tk AS (SELECT doc_id, string_split(text, ' ') l FROM documents),
    t AS (SELECT doc_id, unnest(range(1, len(l) + 1)) pos, l FROM tk),
    tt AS (SELECT doc_id, CAST(pos AS BIGINT) pos, l[pos] term FROM t),
    top AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) df
            FROM tt GROUP BY 1 ORDER BY df DESC, term LIMIT 10)
    SELECT tt.term, top.df, tt.doc_id, CAST(count(*) AS BIGINT) AS tf,
      array_to_string(list_transform(list_sort(list(tt.pos)),
        x -> CAST(x AS VARCHAR)), ',') AS positions
    FROM tt JOIN top ON tt.term = top.term
    GROUP BY 1, 2, 3 ORDER BY tt.term, tt.doc_id
  """

  // top-4 share of exact regional cents; one division per region
  val analyticCr4: String = """
    WITH sr AS (SELECT r.r_name, l.l_suppkey,
        CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) * 100
          AS HUGEINT) cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2),
    rk AS (SELECT r_name, cents, row_number() OVER
        (PARTITION BY r_name ORDER BY cents DESC, l_suppkey) rk FROM sr)
    SELECT r_name, CAST(count(*) AS BIGINT) AS n_suppliers,
      round(CAST(sum(CASE WHEN rk <= 4 THEN cents ELSE 0 END) AS DOUBLE) /
        CAST(sum(cents) AS DOUBLE), 6) AS cr4
    FROM rk GROUP BY 1 ORDER BY 1
  """

  // by-name union with the missing column null-filled
  val setUnionByName: String = """
    WITH a AS (SELECT o_orderpriority prio,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders WHERE o_orderkey % 2 = 0),
    b AS (SELECT CAST(NULL AS VARCHAR) prio,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders WHERE o_orderkey % 2 <> 0)
    SELECT prio, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
    GROUP BY prio ORDER BY prio NULLS FIRST
  """

  // anti join against a real deletion table; totals reconcile
  val pipelineGdprErasure: String = """
    WITH del AS (SELECT DISTINCT user_id FROM events
      WHERE CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)),
        1, 6)) AS BIGINT) % 20 = 0),
    r AS (SELECT event_type, CAST(count(*) AS BIGINT) n_retained
      FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM del d WHERE d.user_id = e.user_id)
      GROUP BY 1),
    t AS (SELECT event_type, CAST(count(*) AS BIGINT) n_total
          FROM events GROUP BY 1)
    SELECT t.event_type, n_total, n_retained,
      CAST(n_total - n_retained AS BIGINT) AS n_erased
    FROM t JOIN r ON t.event_type = r.event_type ORDER BY 1
  """

  // codec changes bytes, never content: both rows land on the
  // direct-scan numbers
  val sourceCompressedRoundtrip: String = """
    WITH m AS (SELECT CAST(count(*) AS BIGINT) n,
        CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS BIGINT) sum_cents
      FROM events)
    SELECT 'csv_gzip' AS fmt, n, sum_cents FROM m
    UNION ALL
    SELECT 'parquet_zstd' AS fmt, n, sum_cents FROM m
    ORDER BY fmt
  """

  // byte-cursor shard assignment in pure integer math
  val multimodalShardManifest: String = """
    WITH d AS (SELECT lang, doc_id, CAST(length(text) AS BIGINT) len
               FROM documents),
    c AS (SELECT lang, doc_id, len,
        sum(len) OVER (PARTITION BY lang ORDER BY doc_id
          ROWS UNBOUNDED PRECEDING) cum
      FROM d),
    s AS (SELECT lang, CAST((cum - len) // 4096 AS BIGINT) shard,
            doc_id, len FROM c)
    SELECT lang, shard, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(len) AS BIGINT) AS bytes,
      min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM s GROUP BY 1, 2 ORDER BY lang, shard
  """

  // division-free burst predicate over the exclusive trailing frame
  val tsBurstDetect: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, d, c,
        sum(c) OVER fr s7, count(*) OVER fr nf
      FROM daily
      WINDOW fr AS (PARTITION BY event_type ORDER BY d
        ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, d, c, CAST(s7 AS BIGINT) AS s7,
      c * 7 > s7 * 2 AS is_burst
    FROM w WHERE nf = 7 ORDER BY event_type, d
  """

  // lowercase-plus-space corpus: '+' substitutions equal the space
  // count and the length is preserved
  val fnUrlCodec: String = """
    SELECT doc_id, text AS text_rt,
      CAST(length(text) AS BIGINT) AS enc_len,
      CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT)
        AS n_plus
    FROM documents ORDER BY doc_id
  """

  // integer day lags; two single divisions of exact counts
  val analyticShipLag: String = """
    WITH j AS (
      SELECT strftime(o_orderdate, '%Y-%m') om,
        CAST(date_diff('day', CAST(o_orderdate AS DATE),
          CAST(l_shipdate AS DATE)) AS BIGINT) lag
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
    SELECT om, CAST(count(*) AS BIGINT) AS n_items,
      min(lag) AS min_lag, max(lag) AS max_lag,
      ROUND(CAST(sum(lag) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        AS avg_lag,
      ROUND(CAST(count(*) FILTER (lag <= 30) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS fast_share
    FROM j GROUP BY om ORDER BY om
  """

  // exact decimal revenue; the share is one double division
  val analyticMarketShare: String = s"""
    WITH nat AS (
      SELECT r_name, CAST(year(o_orderdate) AS INTEGER) yr, n_name,
        sum($netExpr) nat_rev
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2, 3),
    tot AS (SELECT r_name, yr, sum(nat_rev) reg_rev
            FROM nat GROUP BY 1, 2)
    SELECT r_name, yr, n_name, CAST(nat_rev AS DOUBLE) AS revenue,
      ROUND(CAST(nat_rev AS DOUBLE) / CAST(reg_rev AS DOUBLE), 6)
        AS share
    FROM nat JOIN tot USING (r_name, yr)
    ORDER BY r_name, yr, n_name
  """

  // collocation-PMI protocol on the priority x status cell table
  val mlMutualInfo: String = """
    WITH cells AS (SELECT o_orderpriority x, o_orderstatus y,
        CAST(count(*) AS BIGINT) n_xy FROM orders GROUP BY 1, 2),
    mx AS (SELECT x x1, CAST(sum(n_xy) AS BIGINT) n_x
           FROM cells GROUP BY 1),
    my AS (SELECT y y1, CAST(sum(n_xy) AS BIGINT) n_y
           FROM cells GROUP BY 1),
    tot AS (SELECT CAST(sum(n_xy) AS BIGINT) n FROM cells)
    SELECT x, y, n_xy, n_x, n_y,
      ROUND(LN(CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)
        / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))), 6) AS pmi,
      ROUND(LN(CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)
        / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))
        * CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mi_term
    FROM cells JOIN mx ON x = x1 JOIN my ON y = y1 CROSS JOIN tot
    ORDER BY x, y
  """

  // trig factor rounded and frozen as DECIMAL before the weighted sum
  val tsDftPower: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    span AS (SELECT event_type et, min(d) d0,
        CAST(count(*) AS BIGINT) n_days FROM daily GROUP BY 1),
    idx AS (SELECT event_type, c, n_days,
        CAST(date_diff('day', d0, d) AS BIGINT) i
      FROM daily JOIN span ON event_type = et),
    terms AS (SELECT event_type, k, n_days, c,
        2.0 * pi() * k * i / CAST(n_days AS DOUBLE) ang
      FROM idx CROSS JOIN (SELECT unnest([1, 2, 3]) k)),
    q AS (SELECT event_type, k, n_days, c,
        CAST(ROUND(cos(ang), 6) AS DECIMAL(12,6)) cosq,
        CAST(ROUND(sin(ang), 6) AS DECIMAL(12,6)) sinq FROM terms)
    SELECT event_type, CAST(k AS INTEGER) AS k,
      max(n_days) AS n_days,
      CAST(sum(cosq * c) AS DOUBLE) AS re,
      CAST(sum(sinq * c) AS DOUBLE) AS im,
      ROUND(CAST(sum(cosq * c) AS DOUBLE) * CAST(sum(cosq * c) AS DOUBLE)
        + CAST(sum(sinq * c) AS DOUBLE) * CAST(sum(sinq * c) AS DOUBLE), 4)
        AS power
    FROM q GROUP BY 1, 2 ORDER BY event_type, k
  """

  // five integer-math threshold predicates over one exact pair pass
  val dedupThresholdSweep: String = """
    WITH t AS (SELECT doc_id, lang,
        list_distinct(string_split(text, ' ')) toks FROM documents),
    p AS (SELECT
        len(list_distinct(list_intersect(a.toks, b.toks))) i,
        len(a.toks) + len(b.toks) s
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_distinct(list_intersect(a.toks, b.toks))) * 3
        >= len(a.toks) + len(b.toks))
    SELECT threshold_pct, n_pairs FROM (
      SELECT 50 AS threshold_pct,
        CAST(count(*) FILTER (i * 3 >= s * 1) AS BIGINT) n_pairs FROM p
      UNION ALL SELECT 60,
        CAST(count(*) FILTER (i * 8 >= s * 3) AS BIGINT) FROM p
      UNION ALL SELECT 70,
        CAST(count(*) FILTER (i * 17 >= s * 7) AS BIGINT) FROM p
      UNION ALL SELECT 80,
        CAST(count(*) FILTER (i * 9 >= s * 4) AS BIGINT) FROM p
      UNION ALL SELECT 90,
        CAST(count(*) FILTER (i * 19 >= s * 9) AS BIGINT) FROM p)
    ORDER BY threshold_pct
  """

  // per-probe exact kNN; rank on the raw double, round only at output
  val simKnnBatch: String = """
    WITH pr AS (SELECT vec_id probe_id, embedding pe
                FROM embeddings WHERE vec_id < 8),
    sc AS (SELECT probe_id, a.vec_id,
        list_dot_product(pe::DOUBLE[], a.embedding::DOUBLE[]) /
          (sqrt(list_dot_product(pe::DOUBLE[], pe::DOUBLE[])) *
           sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])))
          cos
      FROM embeddings a JOIN pr ON a.vec_id != probe_id),
    rk AS (SELECT probe_id, vec_id, cos,
        row_number() OVER (PARTITION BY probe_id
          ORDER BY cos DESC, vec_id) rnk
      FROM sc)
    SELECT probe_id, CAST(rnk AS INTEGER) AS rank, vec_id,
      ROUND(cos, 6) AS cosine
    FROM rk WHERE rnk <= 10 ORDER BY probe_id, rank
  """

  // lifetime survival fractions over a fixed horizon grid
  val analyticSurvivalRetention: String = """
    WITH life AS (SELECT user_id,
        date_diff('day', min(CAST(ts AS DATE)), max(CAST(ts AS DATE)))
          lifetime
      FROM events GROUP BY 1),
    a AS (SELECT CAST(count(*) AS BIGINT) n_users FROM life),
    h AS (SELECT t, CAST(count(*) FILTER (lifetime >= t) AS BIGINT)
        n_surv
      FROM life CROSS JOIN (SELECT unnest([0, 7, 14, 30, 60, 90]) t)
      GROUP BY 1)
    SELECT CAST(t AS INTEGER) AS horizon_days, n_surv, n_users,
      ROUND(CAST(n_surv AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
        AS surv_frac
    FROM h CROSS JOIN a ORDER BY horizon_days
  """

  // top-20 vocab (count desc, token asc) OOV coverage per source
  val textOovRate: String = """
    WITH toks AS (SELECT source, unnest(string_split(text, ' ')) tok
                  FROM documents),
    vocab AS (SELECT tok FROM (
      SELECT tok, count(*) cnt FROM toks GROUP BY 1
      ORDER BY cnt DESC, tok LIMIT 20)),
    j AS (SELECT source, v.tok vtok
          FROM toks t LEFT JOIN vocab v ON t.tok = v.tok)
    SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      CAST(count(*) FILTER (vtok IS NULL) AS BIGINT) AS n_oov,
      ROUND(CAST(count(*) FILTER (vtok IS NULL) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS oov_rate
    FROM j GROUP BY 1 ORDER BY source
  """

  // expected end state: purchase partition rewritten with doubled cents
  val sourceDynamicPartitionOverwrite: String = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
        * CASE WHEN event_type = 'purchase' THEN 2 ELSE 1 END)
        AS BIGINT) AS sum_cents
    FROM events GROUP BY 1 ORDER BY event_type
  """

  // sweep-line interval depth via +1/-1 deltas and a prefix sum
  val analyticConcurrentOrders: String = """
    WITH spans AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) s,
        CAST(max(l_shipdate) AS DATE) + 1 e
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2),
    del AS (SELECT s d, CAST(1 AS BIGINT) delta FROM spans
            UNION ALL SELECT e, CAST(-1 AS BIGINT) FROM spans),
    dd AS (SELECT d, CAST(sum(delta) AS BIGINT) nd FROM del GROUP BY 1)
    SELECT d, CAST(sum(nd) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
      AS BIGINT) AS depth
    FROM dd ORDER BY d
  """

  // division-free weighted-median crossing; tie membership is stable
  val aggWeightedMedian: String = """
    WITH li AS (SELECT l_returnflag, l_extendedprice,
        CAST(l_quantity AS BIGINT) w FROM lineitem),
    cum AS (SELECT l_returnflag, l_extendedprice,
        sum(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
          ROWS UNBOUNDED PRECEDING) cw
      FROM li),
    tot AS (SELECT l_returnflag rf, CAST(sum(w) AS BIGINT) totw
            FROM li GROUP BY 1)
    SELECT l_returnflag, min(l_extendedprice) AS w_median,
      max(totw) AS tot_qty
    FROM cum JOIN tot ON l_returnflag = rf
    WHERE cw * 2 >= totw
    GROUP BY 1 ORDER BY l_returnflag
  """

  // three-level CASE fallback over exact decimal averages
  val joinHierarchicalLookup: String = """
    WITH bt AS (SELECT p_brand bb, p_type btp,
        CAST(count(*) AS BIGINT) n_bt,
        sum(CAST(p_retailprice AS DECIMAL(12,2))) s_bt
      FROM part GROUP BY 1, 2),
    b AS (SELECT p_brand bb2, CAST(count(*) AS BIGINT) n_b,
        sum(CAST(p_retailprice AS DECIMAL(12,2))) s_b
      FROM part GROUP BY 1),
    g AS (SELECT CAST(count(*) AS BIGINT) n_g,
        sum(CAST(p_retailprice AS DECIMAL(12,2))) s_g FROM part)
    SELECT p_partkey, p_brand, p_type, p_retailprice AS retail,
      CASE WHEN n_bt >= 20
             THEN ROUND(CAST(s_bt AS DOUBLE) / CAST(n_bt AS DOUBLE), 6)
           WHEN n_b >= 20
             THEN ROUND(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
           ELSE ROUND(CAST(s_g AS DOUBLE) / CAST(n_g AS DOUBLE), 6)
      END AS benchmark,
      CASE WHEN n_bt >= 20 THEN 'brand_type'
           WHEN n_b >= 20 THEN 'brand'
           ELSE 'global' END AS level
    FROM part LEFT JOIN bt ON p_brand = bb AND p_type = btp
      LEFT JOIN b ON p_brand = bb2 CROSS JOIN g
    ORDER BY p_partkey
  """

  // Holt recursion mirrored step-for-step; 0.5 factors are exact
  val tsHoltLinear: String = """
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) d, CAST(count(*) AS DOUBLE) c
      FROM events GROUP BY 1, 2),
    seq AS (SELECT event_type, c,
        CAST(row_number() OVER (PARTITION BY event_type ORDER BY d)
          AS BIGINT) i
      FROM daily),
    n AS (SELECT event_type, CAST(count(*) AS BIGINT) n_days
          FROM seq GROUP BY 1),
    r AS (
      SELECT event_type, i, c l, CAST(0.0 AS DOUBLE) b
      FROM seq WHERE i = 1
      UNION ALL
      SELECT s.event_type, s.i,
        0.5 * s.c + 0.5 * (r.l + r.b),
        0.5 * ((0.5 * s.c + 0.5 * (r.l + r.b)) - r.l) + 0.5 * r.b
      FROM r JOIN seq s
        ON s.event_type = r.event_type AND s.i = r.i + 1),
    fin AS (SELECT event_type, l, b,
        row_number() OVER (PARTITION BY event_type ORDER BY i DESC) rn
      FROM r)
    SELECT f.event_type, n_days, ROUND(l, 6) AS level,
      ROUND(b, 6) AS trend, ROUND(l + 7.0 * b, 6) AS forecast_7d
    FROM fin f JOIN n ON f.event_type = n.event_type
    WHERE rn = 1 ORDER BY f.event_type
  """

  // hash-keyed self-join census of cross-source duplicate hashes
  val pipelineCrossSourceOverlap: String = """
    WITH hs AS (SELECT DISTINCT md5(text) h, source FROM documents),
    ps AS (SELECT source, CAST(count(*) AS BIGINT) n_hashes
           FROM hs GROUP BY 1),
    sh AS (SELECT a.source sa, b.source sb,
        CAST(count(*) AS BIGINT) n_sh
      FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2)
    SELECT pa.source src_a, pb.source src_b,
      COALESCE(n_sh, 0) AS n_shared,
      pa.n_hashes n_a, pb.n_hashes n_b,
      ROUND(CAST(COALESCE(n_sh, 0) AS DOUBLE)
        / CAST(pa.n_hashes + pb.n_hashes - COALESCE(n_sh, 0) AS DOUBLE),
        6) AS jaccard
    FROM ps pa JOIN ps pb ON pa.source < pb.source
      LEFT JOIN sh ON pa.source = sa AND pb.source = sb
    ORDER BY src_a, src_b
  """

  // norms frozen at 6 dp as DECIMAL before the mean
  val simEmbeddingStats: String = """
    WITH e AS (SELECT label,
        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
          nrm
      FROM embeddings)
    SELECT label, CAST(count(*) AS BIGINT) AS n,
      CAST(count(*) FILTER (nrm = 0.0) AS BIGINT) AS n_zero,
      ROUND(min(nrm), 6) AS min_norm, ROUND(max(nrm), 6) AS max_norm,
      ROUND(CAST(sum(CAST(ROUND(nrm, 6) AS DECIMAL(18,6))) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS avg_norm
    FROM e GROUP BY 1 ORDER BY label
  """

  // left join coverage audit over the deliberately thinned vec table
  val multimodalPairAlign: String = """
    WITH vecs AS (SELECT vec_id,
        sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
          nrm
      FROM embeddings WHERE vec_id % 7 != 0)
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(count(vec_id) AS BIGINT) AS n_aligned,
      ROUND(CAST(count(vec_id) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        AS coverage,
      ROUND(CAST(sum(CASE WHEN vec_id IS NOT NULL
          THEN CAST(ROUND(nrm, 6) AS DECIMAL(18,6)) END) AS DOUBLE)
        / CAST(count(vec_id) AS DOUBLE), 6) AS avg_aligned_norm
    FROM documents LEFT JOIN vecs ON doc_id = vec_id
    GROUP BY 1 ORDER BY lang
  """

  // expected content of the event_type=purchase partition subtree
  val sourcePathGlob: String = """
    SELECT event_type, CAST(day(ts) AS INTEGER) AS dom,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_cents
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1, 2 ORDER BY dom
  """

  // row-lag seasonal naive; APE terms frozen at 6 dp before the mean
  val tsSeasonalNaiveError: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    lg AS (SELECT event_type, c,
        lag(c, 7) OVER (PARTITION BY event_type ORDER BY d) prev7
      FROM daily),
    sc AS (SELECT event_type, abs(c - prev7) abs_err,
        CAST(ROUND(CAST(abs(c - prev7) AS DOUBLE)
          / CAST(prev7 AS DOUBLE), 6) AS DECIMAL(18,6)) apeq
      FROM lg WHERE prev7 IS NOT NULL AND prev7 > 0)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_scored,
      ROUND(CAST(sum(abs_err) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        AS mae,
      ROUND(CAST(sum(apeq) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        AS mape
    FROM sc GROUP BY 1 ORDER BY event_type
  """

  // scaled-integer Katz (X_k = 4^k x_k), four unrolled iterations
  val graphKatzCentrality: String = s"""
    WITH $thinnedGraphCte,
    adj AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    nodes AS (SELECT DISTINCT a node FROM adj),
    x0 AS (SELECT node, CAST(1 AS BIGINT) x FROM nodes),
    x1 AS (SELECT n.node, CAST(4 + COALESCE(s.sx, 0) AS BIGINT) x
           FROM nodes n LEFT JOIN (SELECT a, CAST(sum(x) AS BIGINT) sx
             FROM adj JOIN x0 ON b = node GROUP BY a) s ON s.a = n.node),
    x2 AS (SELECT n.node, CAST(16 + COALESCE(s.sx, 0) AS BIGINT) x
           FROM nodes n LEFT JOIN (SELECT a, CAST(sum(x) AS BIGINT) sx
             FROM adj JOIN x1 ON b = node GROUP BY a) s ON s.a = n.node),
    x3 AS (SELECT n.node, CAST(64 + COALESCE(s.sx, 0) AS BIGINT) x
           FROM nodes n LEFT JOIN (SELECT a, CAST(sum(x) AS BIGINT) sx
             FROM adj JOIN x2 ON b = node GROUP BY a) s ON s.a = n.node),
    x4 AS (SELECT n.node, CAST(256 + COALESCE(s.sx, 0) AS BIGINT) x
           FROM nodes n LEFT JOIN (SELECT a, CAST(sum(x) AS BIGINT) sx
             FROM adj JOIN x3 ON b = node GROUP BY a) s ON s.a = n.node)
    SELECT node, x AS katz_scaled,
      ROUND(CAST(x AS DOUBLE) / 256.0, 6) AS katz
    FROM x4 ORDER BY node
  """

  // centroids and scores frozen as DECIMAL; argmax compares exactly
  val mlCentroidClassifier: String = """
    WITH dims AS (SELECT vec_id, label, i dim,
        CAST(embedding[i] AS DOUBLE) xv
      FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) i)),
    cent AS (SELECT label clabel, dim,
        CAST(sum(CAST(ROUND(xv, 6) AS DECIMAL(18,6))) AS DOUBLE)
          / CAST(count(*) AS DOUBLE) cv
      FROM dims WHERE vec_id % 2 = 0 GROUP BY 1, 2),
    scores AS (SELECT vec_id, label, clabel,
        sum(CAST(ROUND(xv * cv, 9) AS DECIMAL(28,9))) score
      FROM dims JOIN cent USING (dim) WHERE vec_id % 2 != 0
      GROUP BY 1, 2, 3),
    pred AS (SELECT vec_id, label, clabel,
        row_number() OVER (PARTITION BY vec_id
          ORDER BY score DESC, clabel) rk
      FROM scores)
    SELECT label AS true_label, CAST(count(*) AS BIGINT) AS n_test,
      CAST(count(*) FILTER (clabel = label) AS BIGINT) AS n_correct,
      ROUND(CAST(count(*) FILTER (clabel = label) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS accuracy
    FROM pred WHERE rk = 1 GROUP BY 1 ORDER BY true_label
  """

  // non-additive distinct counts at every rollup level
  val aggDistinctRollup: String = """
    WITH e AS (SELECT event_type, CAST(ts AS DATE) d, user_id
               FROM events)
    SELECT event_type, d,
      CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      CAST(count(*) AS BIGINT) AS n_events
    FROM e GROUP BY ROLLUP(event_type, d)
    ORDER BY event_type ASC NULLS FIRST, d ASC NULLS FIRST
  """

  // year-partitioned revenue quartiles joined across adjacent years
  val analyticSegmentMigration: String = """
    WITH yearly AS (SELECT o_custkey,
        CAST(year(o_orderdate) AS INTEGER) yr,
        sum(CAST(o_totalprice AS DECIMAL(12,2))) rev
      FROM orders GROUP BY 1, 2),
    seg AS (SELECT o_custkey, yr,
        CAST(ntile(4) OVER (PARTITION BY yr
          ORDER BY rev DESC, o_custkey) AS INTEGER) q
      FROM yearly)
    SELECT a.yr yr_from, a.q q_from, b.q q_to,
      CAST(count(*) AS BIGINT) n_customers
    FROM seg a JOIN seg b
      ON a.o_custkey = b.o_custkey AND b.yr = a.yr + 1
    GROUP BY 1, 2, 3 ORDER BY yr_from, q_from, q_to
  """

  // correlated LATERAL with ORDER BY + LIMIT, the SQL top-k-per-key
  val sqlLateralTopk: String = """
    SELECT c_custkey, o_orderkey, cents
    FROM customer, LATERAL (SELECT o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 3)
    ORDER BY c_custkey, cents DESC, o_orderkey
  """

  // rank targets ⌈q·n⌉ in integer math; values at fixed global ranks
  val aggExactGlobalMedian: String = """
    WITH nn AS (SELECT CAST(count(*) AS BIGINT) n FROM lineitem),
    t AS (SELECT q, n, (q * n + 99) // 100 r
          FROM nn CROSS JOIN (SELECT unnest([25, 50, 75]) q)),
    s AS (SELECT l_extendedprice val,
        row_number() OVER (ORDER BY l_extendedprice) rn FROM lineitem)
    SELECT CAST(q AS INTEGER) AS quantile_pct, n AS n_rows,
      val AS value
    FROM t JOIN s ON s.rn = t.r ORDER BY quantile_pct
  """

  // the lang-id CASE chain crossed with true labels
  val textLangidConfusion: String = """
    WITH t AS (SELECT doc_id, lang,
        list_distinct(string_split(text, ' ')) AS toks FROM documents),
    c AS (SELECT doc_id, lang,
      len(list_intersect(toks, ['the','fast','data']))      AS c_en,
      len(list_intersect(toks, ['table','scan','order']))   AS c_de,
      len(list_intersect(toks, ['sort','merge','value']))   AS c_fr,
      len(list_intersect(toks, ['batch','window','row']))   AS c_es,
      len(list_intersect(toks, ['spark','column','hash']))  AS c_zh
      FROM t),
    pred AS (SELECT lang,
      CASE
        WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es AND c_en >= c_zh THEN 'en'
        WHEN c_de >= c_fr AND c_de >= c_es AND c_de >= c_zh THEN 'de'
        WHEN c_fr >= c_es AND c_fr >= c_zh THEN 'fr'
        WHEN c_es >= c_zh THEN 'es'
        ELSE 'zh'
      END AS predicted
      FROM c),
    cells AS (SELECT lang true_lang, predicted,
        CAST(count(*) AS BIGINT) n FROM pred GROUP BY 1, 2),
    tot AS (SELECT true_lang tl, CAST(sum(n) AS BIGINT) n_true
            FROM cells GROUP BY 1)
    SELECT true_lang, predicted, n,
      ROUND(CAST(n AS DOUBLE) / CAST(n_true AS DOUBLE), 6) AS share
    FROM cells JOIN tot ON true_lang = tl
    ORDER BY true_lang, predicted
  """

  // integer deltas; share divides the two exact integers once
  val tsDeltaAttribution: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    wd AS (SELECT event_type, d, c,
        c - lag(c) OVER (PARTITION BY event_type ORDER BY d) delta
      FROM daily),
    f AS (SELECT * FROM wd WHERE delta IS NOT NULL),
    dt AS (SELECT d d2, CAST(sum(delta) AS BIGINT) total_delta
           FROM f GROUP BY 1)
    SELECT d, event_type, c, CAST(delta AS BIGINT) AS delta,
      total_delta,
      CASE WHEN total_delta != 0 THEN
        ROUND(CAST(delta AS DOUBLE) / CAST(total_delta AS DOUBLE), 6)
          + 0.0
      END AS share
    FROM f JOIN dt ON d = d2 ORDER BY d, event_type
  """

  // regexp algebra only — identical semantics in both engines
  val fnSlugify: String = """
    SELECT p_partkey, p_name,
      regexp_replace(regexp_replace(lower(trim(p_name)),
        '[^a-z0-9]+', '-', 'g'), '^-|-$', '', 'g') AS slug
    FROM part ORDER BY p_partkey
  """

  // division-free value and variability classes from integer algebra
  val analyticAbcXyzMatrix: String = s"""
    WITH li AS (SELECT l_partkey, CAST(l_quantity AS BIGINT) qty,
        $netExpr net,
        year(l_shipdate) * 100 + weekofyear(l_shipdate) wk
      FROM lineitem),
    weekly AS (SELECT l_partkey, wk, CAST(sum(qty) AS BIGINT) wq
               FROM li GROUP BY 1, 2),
    varcls AS (SELECT l_partkey,
        CASE WHEN (nw * ssq - s * s) * 4 <= s * s THEN 'X'
             WHEN nw * ssq <= s * s * 2 THEN 'Y'
             ELSE 'Z' END xyz_class
      FROM (SELECT l_partkey, CAST(count(*) AS BIGINT) nw,
              CAST(sum(wq) AS BIGINT) s,
              CAST(sum(wq * wq) AS BIGINT) ssq
            FROM weekly GROUP BY 1)),
    rev AS (SELECT l_partkey, sum(net) rev FROM li GROUP BY 1),
    tot AS (SELECT sum(rev) trev, CAST(count(*) AS BIGINT) np FROM rev),
    abccls AS (SELECT l_partkey, rev,
        CASE WHEN rev * np >= trev * 2 THEN 'A'
             WHEN rev * np * 2 >= trev THEN 'B'
             ELSE 'C' END abc_class
      FROM rev CROSS JOIN tot)
    SELECT abc_class, xyz_class, CAST(count(*) AS BIGINT) AS n_parts,
      CAST(sum(rev) AS DOUBLE) AS revenue
    FROM abccls JOIN varcls USING (l_partkey)
    GROUP BY 1, 2 ORDER BY abc_class, xyz_class
  """

  // XOR of per-row 60-bit hashes commutes — partitioning-independent
  val pipelineRunChecksum: String = """
    WITH k AS (SELECT event_type,
        CAST(concat('0x', substring(md5(concat(
          CAST(event_id AS VARCHAR), ':',
          CAST(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)
            AS VARCHAR))), 1, 15)) AS BIGINT) k
      FROM events)
    SELECT COALESCE(event_type, 'ALL') AS scope,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(bit_xor(k) AS BIGINT) AS checksum
    FROM k GROUP BY ROLLUP(event_type) ORDER BY scope
  """

  // routing is physical only — the oracle is the plain join
  val skewHybridJoin: String = """
    SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        AS revenue
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1 ORDER BY s_nationkey
  """

  // nation under two roles; cross-border volume per year
  val joinRolePlayingDims: String = s"""
    SELECT n1.n_name supp_nation, n2.n_name cust_nation,
      CAST(year(o_orderdate) AS INTEGER) yr,
      CAST(sum($netExpr) AS DOUBLE) AS volume
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name != n2.n_name
    GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, yr
  """

  // DISTINCT-qualified sum/avg over the value set
  val aggSumAvgDistinct: String = """
    WITH q AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) q
               FROM lineitem)
    SELECT l_returnflag,
      CAST(count(DISTINCT q) AS BIGINT) AS n_distinct,
      CAST(sum(DISTINCT q) AS BIGINT) AS sum_distinct,
      ROUND(CAST(sum(DISTINCT q) AS DOUBLE)
        / CAST(count(DISTINCT q) AS DOUBLE), 6) AS avg_distinct
    FROM q GROUP BY 1 ORDER BY l_returnflag
  """

  // min-distance BFS to 4 hops; 12/d weights stay integer
  val graphHarmonicCentrality: String = s"""
    WITH RECURSIVE $thinnedGraphCte,
    adj AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    nodes AS (SELECT DISTINCT a node FROM adj),
    bfs(s, node, d) AS (
      SELECT node, node, 0 FROM nodes
      UNION ALL
      SELECT bfs.s, adj.b, d + 1 FROM bfs JOIN adj ON adj.a = bfs.node
      WHERE d < 4),
    md AS (SELECT s, node, min(d) md FROM bfs GROUP BY 1, 2),
    h AS (SELECT s, CAST(sum(CASE md WHEN 1 THEN 12 WHEN 2 THEN 6
            WHEN 3 THEN 4 WHEN 4 THEN 3 ELSE 0 END) AS BIGINT) hs
          FROM md WHERE md > 0 GROUP BY s)
    SELECT s AS node, hs AS harmonic_scaled,
      ROUND(CAST(hs AS DOUBLE) / 12.0, 6) AS harmonic
    FROM h ORDER BY node
  """

  // scaled-integer modularity: Q·4m² = Σ(4m·e_c − d_c²)
  val graphModularity: String = s"""
    WITH $thinnedGraphCte,
    nat AS (SELECT s_suppkey node, s_nationkey comm FROM supplier),
    e AS (SELECT u, v, cu.comm cu, cv.comm cv
      FROM und JOIN nat cu ON u = cu.node JOIN nat cv ON v = cv.node),
    mm AS (SELECT CAST(count(*) AS BIGINT) m FROM e),
    intra AS (SELECT cu comm, CAST(count(*) AS BIGINT) e_in
              FROM e WHERE cu = cv GROUP BY 1),
    deg AS (SELECT comm, CAST(count(*) AS BIGINT) d_sum,
        CAST(count(DISTINCT node) AS BIGINT) n_nodes
      FROM (SELECT u node, cu comm FROM e
            UNION ALL SELECT v, cv FROM e) GROUP BY 1),
    cells AS (SELECT comm, n_nodes, COALESCE(e_in, 0) e_in, d_sum,
        4 * m * COALESCE(e_in, 0) - d_sum * d_sum q
      FROM deg LEFT JOIN intra USING (comm) CROSS JOIN mm),
    qt AS (SELECT CAST(sum(q) AS BIGINT) qs FROM cells)
    SELECT comm AS community, n_nodes, CAST(e_in AS BIGINT) AS e_in,
      d_sum, CAST(q AS BIGINT) AS q_contrib_scaled,
      ROUND(CAST(qs AS DOUBLE) / (4.0 * m * m), 6) AS modularity
    FROM cells CROSS JOIN mm CROSS JOIN qt ORDER BY community
  """

  // leak-free fold-complement rates, one exact division each
  val mlTargetEncodeOof: String = """
    WITH base AS (SELECT event_type,
        CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)),
          1, 6)) AS BIGINT) % 4 fold,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y
      FROM events),
    pf AS (SELECT event_type, CAST(fold AS BIGINT) fold,
        CAST(count(*) AS BIGINT) n_f, CAST(sum(y) AS BIGINT) pos_f
      FROM base GROUP BY 1, 2),
    pc AS (SELECT event_type et, CAST(sum(n_f) AS BIGINT) n_c,
        CAST(sum(pos_f) AS BIGINT) pos_c FROM pf GROUP BY 1)
    SELECT event_type, fold, n_f, pos_f,
      ROUND(CAST(pos_c - pos_f AS DOUBLE)
        / CAST(n_c - n_f AS DOUBLE), 6) AS oof_enc
    FROM pf JOIN pc ON event_type = et ORDER BY event_type, fold
  """

  // CC labels histogrammed; untouched docs are the size-1 row
  val dedupClusterSizeHistogram: String = """
    WITH RECURSIVE
    t AS (SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS toks
          FROM documents),
    edges AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE len(list_intersect(a.toks, b.toks))::DOUBLE /
            (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
            >= 0.8),
    und AS (SELECT id_a AS a, id_b AS b FROM edges
            UNION ALL SELECT id_b, id_a FROM edges),
    reach(a, b) AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
    lbl AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            FROM reach GROUP BY a),
    sizes AS (SELECT cluster_id, CAST(count(*) AS BIGINT) sz
              FROM lbl GROUP BY 1),
    hist AS (SELECT sz cluster_size, CAST(count(*) AS BIGINT) n_clusters
             FROM sizes GROUP BY 1),
    tot AS (SELECT CAST(count(*) AS BIGINT) nd FROM documents),
    inc AS (SELECT CAST(count(*) AS BIGINT) ni FROM lbl),
    up AS (SELECT cluster_size, n_clusters FROM hist
           UNION ALL SELECT 1, nd - ni FROM tot CROSS JOIN inc)
    SELECT cluster_size, CAST(sum(n_clusters) AS BIGINT) AS n_clusters
    FROM up GROUP BY 1 HAVING sum(n_clusters) > 0
    ORDER BY cluster_size
  """

  // freeze-then-sum Theil T; μ is one division of exact aggregates
  val analyticTheilIndex: String = """
    WITH rev AS (SELECT CAST(year(o_orderdate) AS INTEGER) yr,
        o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) x
      FROM orders GROUP BY 1, 2),
    tots AS (SELECT yr y2, CAST(count(*) AS BIGINT) n,
        CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) mu
      FROM rev GROUP BY 1),
    terms AS (SELECT yr, n,
        CAST(ROUND((CAST(x AS DOUBLE) / mu)
          * LN(CAST(x AS DOUBLE) / mu), 9) AS DECIMAL(28,9)) term
      FROM rev JOIN tots ON yr = y2)
    SELECT yr, max(n) AS n_cust,
      ROUND(CAST(sum(term) AS DOUBLE) / CAST(max(n) AS DOUBLE), 6)
        AS theil
    FROM terms GROUP BY yr ORDER BY yr
  """

  // the stripped text is stated from the SOURCE, not from the regexes
  val textMarkdownStrip: String = """
    SELECT doc_id,
      'title' || chr(10) || chr(10) || text || ' see link' AS stripped,
      CAST(1 AS BIGINT) AS n_links
    FROM documents ORDER BY doc_id
  """

  // exact integer S and 18-scaled variance; one mirrored Z double
  val tsMannKendall: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    sg AS (SELECT a.event_type,
        CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END sg
      FROM daily a JOIN daily b
        ON a.event_type = b.event_type AND a.d < b.d),
    s AS (SELECT event_type, CAST(sum(sg) AS BIGINT) s_stat
          FROM sg GROUP BY 1),
    n AS (SELECT event_type et, CAST(count(*) AS BIGINT) n_days
          FROM daily GROUP BY 1)
    SELECT event_type, n_days, s_stat,
      ROUND(CAST(CASE WHEN s_stat > 0 THEN s_stat - 1
          WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END AS DOUBLE)
        / sqrt(CAST(n_days * (n_days - 1) * (2 * n_days + 5) AS DOUBLE)
          / 18.0), 6) AS z,
      CASE WHEN s_stat > 0 THEN 'up' WHEN s_stat < 0 THEN 'down'
        ELSE 'flat' END AS trend
    FROM s JOIN n ON event_type = et ORDER BY event_type
  """

  // freeze-then-sum Shannon entropy of the daily type mix
  val tsMixEntropy: String = """
    WITH daily AS (SELECT CAST(ts AS DATE) d, event_type,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    tot AS (SELECT d d2, CAST(sum(c) AS BIGINT) n FROM daily GROUP BY 1),
    terms AS (SELECT d, n,
        CAST(ROUND((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
          * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 9)
          AS DECIMAL(28,9)) term
      FROM daily JOIN tot ON d = d2)
    SELECT d, max(n) AS n_events,
      CAST(ROUND(sum(term) * -1, 6) AS DOUBLE) AS entropy
    FROM terms GROUP BY d ORDER BY d
  """

  // below-mean support collapses: c·k >= n is the division-free test
  val mlRareCategoryCollapse: String = """
    WITH cats AS (SELECT p_brand || '#' || CAST(p_size AS VARCHAR) cat
                  FROM part),
    counts AS (SELECT cat, CAST(count(*) AS BIGINT) c
               FROM cats GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) n,
            CAST(count(*) AS BIGINT) k FROM counts),
    mapping AS (SELECT cat,
        CASE WHEN c * k >= n THEN cat ELSE 'OTHER' END encoded
      FROM counts CROSS JOIN tot)
    SELECT encoded, CAST(count(*) AS BIGINT) AS n_parts,
      CAST(count(DISTINCT cats.cat) AS BIGINT) AS n_source_cats
    FROM cats JOIN mapping m ON cats.cat = m.cat
    GROUP BY 1 ORDER BY encoded
  """

  // centered MA via date-band self-join; detrended values frozen
  val tsDecomposeAdditive: String = """
    WITH daily AS (SELECT CAST(ts AS DATE) d, CAST(count(*) AS BIGINT) c
      FROM events WHERE event_type = 'view' GROUP BY 1),
    tr AS (SELECT a.d d, a.c c, CAST(count(*) AS BIGINT) nf,
        CAST(sum(b.c) AS BIGINT) ts7
      FROM daily a JOIN daily b
        ON date_diff('day', a.d, b.d) BETWEEN -3 AND 3
      GROUP BY 1, 2),
    t2 AS (SELECT d, c, CAST(ts7 AS DOUBLE) / 7.0 trend
           FROM tr WHERE nf = 7),
    t3 AS (SELECT d, c, trend,
        CAST(ROUND(CAST(c AS DOUBLE) - trend, 9) AS DECIMAL(28,9)) detr,
        dayofweek(d) dow FROM t2),
    seas AS (SELECT dow dw,
        CAST(sum(detr) AS DOUBLE) / CAST(count(*) AS DOUBLE) seasonal
      FROM t3 GROUP BY 1)
    SELECT d, c, ROUND(trend, 6) AS trend,
      ROUND(seasonal, 6) AS seasonal,
      ROUND(CAST(c AS DOUBLE) - trend - seasonal, 6) AS residual
    FROM t3 JOIN seas ON dow = dw ORDER BY d
  """

  // the constant-size slice the multiline array document carries
  val sourceJsonMultiline: String = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_cents
    FROM events WHERE event_id % 100 = 0 AND event_id <= 50000
    GROUP BY 1 ORDER BY event_type
  """

  // CTAS half + INSERT half must reassemble the full table
  val sqlCtasInsert: String = """
    SELECT o_orderpriority AS prio, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders GROUP BY 1 ORDER BY prio
  """

  // integer microsecond lag banded into power-of-two hours
  val analyticConversionLag: String = """
    WITH v AS (SELECT user_id, min(ts) view_ts FROM events
               WHERE event_type = 'view' GROUP BY 1),
    p AS (SELECT e.user_id, v.view_ts, min(e.ts) purchase_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.view_ts
      GROUP BY 1, 2),
    lagh AS (SELECT (epoch_us(purchase_ts) - epoch_us(view_ts))
        // 3600000000 lag_hours FROM p),
    band AS (SELECT CASE WHEN lag_hours < 1 THEN 0
        WHEN lag_hours < 2 THEN 1 WHEN lag_hours < 4 THEN 2
        WHEN lag_hours < 8 THEN 4 WHEN lag_hours < 16 THEN 8
        WHEN lag_hours < 32 THEN 16 ELSE 32 END lag_band_hours
      FROM lagh)
    SELECT CAST(lag_band_hours AS BIGINT) AS lag_band_hours,
      CAST(count(*) AS BIGINT) AS n_users
    FROM band GROUP BY 1 ORDER BY lag_band_hours
  """

  // the three delimited-field extraction idioms, mirrored by algebra
  val fnSplitPart: String = """
    SELECT p_partkey, p_name,
      CASE WHEN strpos(p_name, ' ') = 0 THEN p_name
        ELSE substring(p_name, 1, strpos(p_name, ' ') - 1)
      END AS head_tok,
      CASE WHEN strpos(p_name, ' ') = 0 THEN NULL
        ELSE substring(p_name, strpos(p_name, ' ') + 1)
      END AS tail_rest,
      split_part(p_name, ' ', 1) AS first_part,
      list_extract(string_split(p_name, ' '), -1) AS last_part,
      array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ' ')
        AS first_two
    FROM part ORDER BY p_partkey
  """

  // variables resolve to literals — the oracle is the literal form
  val sqlSessionVariables: String = """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_bal_cents
    FROM customer
    WHERE c_acctbal >= 1000.0 AND c_mktsegment != 'BUILDING'
    GROUP BY 1 ORDER BY c_mktsegment
  """

  // four cell means, one division each; DiD is mirrored arithmetic
  val analyticDiffInDiff: String = """
    WITH cells AS (SELECT
        CASE WHEN user_id % 2 = 0 THEN 'treated' ELSE 'control' END grp,
        CASE WHEN day(ts) <= 15 THEN 'before' ELSE 'after' END period,
        CAST(count(*) AS BIGINT) n,
        CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS BIGINT) sc
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    m AS (SELECT grp, period, n,
        CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) mean_cents FROM cells),
    did AS (SELECT ROUND(
        ((SELECT mean_cents FROM m WHERE grp = 'treated' AND period = 'after')
         - (SELECT mean_cents FROM m WHERE grp = 'treated' AND period = 'before'))
        - ((SELECT mean_cents FROM m WHERE grp = 'control' AND period = 'after')
           - (SELECT mean_cents FROM m WHERE grp = 'control' AND period = 'before')),
        6) did_cents)
    SELECT grp, period, n, ROUND(mean_cents, 6) AS mean_cents, did_cents
    FROM m CROSS JOIN did ORDER BY grp, period
  """

  // decile bounds in integer math; tie membership is sum-stable
  val aggTrimmedMean: String = """
    WITH li AS (SELECT l_returnflag,
        CAST(l_extendedprice AS DECIMAL(12,2)) m FROM lineitem),
    r AS (SELECT l_returnflag, m,
        row_number() OVER (PARTITION BY l_returnflag ORDER BY m) rn
      FROM li),
    c AS (SELECT l_returnflag rf, CAST(count(*) AS BIGINT) n
          FROM li GROUP BY 1)
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_kept,
      ROUND(CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        AS trimmed_mean
    FROM r JOIN c ON l_returnflag = rf
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY 1 ORDER BY l_returnflag
  """

  // inline() literal table == VALUES; the band join must agree
  val sqlTvfInline: String = """
    WITH bands(band, lo, hi) AS (VALUES
      ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
      ('high', 150000.0, 1e18))
    SELECT band, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_cents
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band ORDER BY band
  """

  // 10-scaled integer pinball sums; one division per (type, q)
  val mlPinballLoss: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    sc AS (SELECT event_type,
        c - lag(c, 7) OVER (PARTITION BY event_type ORDER BY d) err,
        lag(c, 7) OVER (PARTITION BY event_type ORDER BY d) f
      FROM daily),
    f AS (SELECT event_type, err FROM sc WHERE f IS NOT NULL),
    a AS (SELECT event_type, CAST(count(*) AS BIGINT) n,
        CAST(sum(CASE WHEN err >= 0 THEN err * 5 ELSE err * (-5) END)
          AS BIGINT) l5,
        CAST(sum(CASE WHEN err >= 0 THEN err * 9 ELSE err * (-1) END)
          AS BIGINT) l9
      FROM f GROUP BY 1)
    SELECT event_type, CAST(q AS DOUBLE) AS q, n AS n_scored,
      ROUND(raw, 6) AS pinball_loss
    FROM (
      SELECT event_type, 0.5 q, n,
        CAST(l5 AS DOUBLE) / (CAST(n AS DOUBLE) * 10.0) raw FROM a
      UNION ALL
      SELECT event_type, 0.9, n,
        CAST(l9 AS DOUBLE) / (CAST(n AS DOUBLE) * 10.0) FROM a)
    ORDER BY event_type, q
  """

  // frozen components; exact sums cast once, then mirrored doubles
  val simDimVarianceAudit: String = """
    WITH comps AS (SELECT CAST(i AS INTEGER) dim,
        CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(18,6)) x
      FROM embeddings CROSS JOIN (SELECT unnest(range(1, 65)) i)),
    a AS (SELECT dim, CAST(count(*) AS BIGINT) n, sum(x) s,
        sum(x * x) ssq FROM comps GROUP BY 1)
    SELECT dim, n,
      ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
      ROUND((CAST(ssq AS DOUBLE) * CAST(n AS DOUBLE)
        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS variance
    FROM a ORDER BY dim
  """

  // the oracle re-derives mask() with regexp algebra (digits LAST so
  // replacement characters are never re-replaced)
  val fnMaskPii: String = """
    SELECT c_custkey, c_name,
      regexp_replace(regexp_replace(regexp_replace(c_name,
        '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        AS masked,
      regexp_replace(regexp_replace(regexp_replace(c_name,
        '[A-Z]', '#', 'g'), '[a-z]', '*', 'g'), '[0-9]', '0', 'g')
        AS masked_custom
    FROM customer ORDER BY c_custkey
  """

  // telescoping volume/rate effects over exact cell means
  val analyticMixShift: String = """
    WITH byy AS (SELECT o_orderpriority prio,
        CAST(year(o_orderdate) AS INTEGER) yr,
        CAST(count(*) AS BIGINT) n,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) sc
      FROM orders WHERE year(o_orderdate) IN (1996, 1997)
      GROUP BY 1, 2),
    m AS (SELECT prio, yr, n, sc,
        CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) a FROM byy),
    y1 AS (SELECT prio, n n1, sc sc1, a a1 FROM m WHERE yr = 1996),
    y2 AS (SELECT prio p2, n n2, sc sc2, a a2 FROM m WHERE yr = 1997)
    SELECT prio, n1, n2, sc2 - sc1 AS delta_cents,
      ROUND(CAST(n2 - n1 AS DOUBLE) * a1, 2) AS volume_effect,
      ROUND(CAST(n2 AS DOUBLE) * (a2 - a1), 2) AS rate_effect
    FROM y1 JOIN y2 ON prio = p2 ORDER BY prio
  """

  // full-outer book walk; components reconcile exactly in cents
  val analyticRevenueBridge: String = """
    WITH b1 AS (SELECT o_custkey k1,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c1
      FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1),
    b2 AS (SELECT o_custkey k2,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) c2
      FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
    j AS (SELECT * FROM b1 FULL OUTER JOIN b2 ON k1 = k2)
    SELECT CAST(sum(COALESCE(c1, 0)) AS BIGINT) AS start_cents,
      CAST(sum(CASE WHEN k1 IS NULL THEN c2 ELSE 0 END) AS BIGINT)
        AS new_cents,
      CAST(sum(CASE WHEN k2 IS NULL THEN c1 ELSE 0 END) AS BIGINT)
        AS churn_cents,
      CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL AND c2 > c1
        THEN c2 - c1 ELSE 0 END) AS BIGINT) AS expansion_cents,
      CAST(sum(CASE WHEN k1 IS NOT NULL AND k2 IS NOT NULL AND c2 < c1
        THEN c1 - c2 ELSE 0 END) AS BIGINT) AS contraction_cents,
      CAST(sum(COALESCE(c2, 0)) AS BIGINT) AS end_cents
    FROM j
  """

  // nulls cannot match an inner join — the bypass loses nothing
  val scaleNullSkewBypass: String = """
    WITH li AS (SELECT
        CASE WHEN l_suppkey % 97 = 0 THEN NULL ELSE l_suppkey END sk,
        CAST(l_extendedprice AS DECIMAL(12,2)) m FROM lineitem),
    ns AS (SELECT CAST(count(*) AS BIGINT) n_bypassed FROM li
           WHERE sk IS NULL)
    SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_items,
      CAST(sum(m) AS DOUBLE) AS revenue, n_bypassed
    FROM li JOIN supplier ON sk = s_suppkey CROSS JOIN ns
    GROUP BY 1, n_bypassed ORDER BY s_nationkey
  """

  // frozen log-factors; the window sum is exact, one exp at the end
  val winCompoundGrowth: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS BIGINT) cents
      FROM events GROUP BY 1, 2),
    lg AS (SELECT event_type, d, cents,
        lag(cents) OVER (PARTITION BY event_type ORDER BY d) prev
      FROM daily),
    f AS (SELECT event_type, d,
        CAST(ROUND(LN(CAST(cents AS DOUBLE) / CAST(prev AS DOUBLE)), 9)
          AS DECIMAL(28,9)) lf
      FROM lg WHERE prev IS NOT NULL AND prev > 0)
    SELECT event_type, d,
      ROUND(exp(CAST(sum(lf) OVER (PARTITION BY event_type ORDER BY d
        ROWS UNBOUNDED PRECEDING) AS DOUBLE)), 6) AS growth_index
    FROM f ORDER BY event_type, d
  """

  // the CSV roundtrip must land back on the direct aggregate
  val fnFromCsv: String = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_cents
    FROM events GROUP BY 1 ORDER BY event_type
  """

  // ordinals resolve against the select list in both engines
  val sqlGroupByOrdinal: String = """
    SELECT o_orderpriority, CAST(year(o_orderdate) AS INTEGER) yr,
      CAST(count(*) AS BIGINT) n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        AS BIGINT)) AS BIGINT) sum_cents
    FROM orders GROUP BY 1, 2 HAVING count(*) > 5
    ORDER BY 1, 2
  """

  // one exact p̄ division; z mirrored operation-for-operation
  val tsControlChart: String = """
    WITH daily AS (SELECT CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) n,
        CAST(count(*) FILTER (event_type = 'error') AS BIGINT) n_err
      FROM events GROUP BY 1),
    g AS (SELECT CAST(sum(n_err) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
        pbar FROM daily)
    SELECT d, n, n_err,
      ROUND(((CAST(n_err AS DOUBLE) / CAST(n AS DOUBLE)) - pbar)
        / sqrt(pbar * (1.0 - pbar) / CAST(n AS DOUBLE)), 6) AS z
    FROM daily CROSS JOIN g ORDER BY d
  """

  // the canonical json text stated from the source columns
  val fnJsonCanonical: String = """
    SELECT event_id,
      '{"event_id":' || event_id || ',"event_type":"' || event_type
        || '"}' AS json,
      event_type AS rt_type
    FROM events ORDER BY event_id
  """

  // deterministic per-source ranks; shift over the shared vocabulary
  val textRankShift: String = """
    WITH toks AS (SELECT source, unnest(string_split(text, ' ')) tok
      FROM documents WHERE source IN ('src0', 'src1')),
    cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) c
            FROM toks GROUP BY 1, 2),
    rk AS (SELECT source, tok, c,
        CAST(row_number() OVER (PARTITION BY source
          ORDER BY c DESC, tok) AS INTEGER) rk
      FROM cnt),
    a AS (SELECT tok, rk rank_a, c n_a FROM rk WHERE source = 'src0'),
    b AS (SELECT tok tok_b, rk rank_b, c n_b FROM rk
          WHERE source = 'src1')
    SELECT tok, rank_a, rank_b, n_a, n_b,
      CAST(rank_b - rank_a AS INTEGER) AS shift
    FROM a JOIN b ON tok = tok_b ORDER BY rank_a, tok
  """

  // date-shift equi-join lags; frozen deviation products
  val tsAcfTable: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    mu AS (SELECT event_type et,
        CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) mu
      FROM daily GROUP BY 1),
    dev AS (SELECT event_type, d, CAST(c AS DOUBLE) - mu dv
            FROM daily JOIN mu ON event_type = et),
    den AS (SELECT event_type et2,
        sum(CAST(ROUND(dv * dv, 6) AS DECIMAL(28,6))) den
      FROM dev GROUP BY 1),
    pairs AS (SELECT a.event_type, k,
        sum(CAST(ROUND(a.dv * b.dv, 6) AS DECIMAL(28,6))) num,
        CAST(count(*) AS BIGINT) n_pairs
      FROM dev a CROSS JOIN (SELECT unnest(range(1, 8)) k)
        JOIN dev b ON b.event_type = a.event_type
          AND b.d = a.d + CAST(k AS INTEGER)
      GROUP BY 1, 2)
    SELECT p.event_type, CAST(k AS INTEGER) AS k, n_pairs,
      ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
    FROM pairs p JOIN den ON p.event_type = et2
    ORDER BY event_type, k
  """

  // full forward frames only (1..7 FOLLOWING)
  val winForwardFrame: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    w AS (SELECT event_type, d, c,
        sum(c) OVER fr next7, count(*) OVER fr nf
      FROM daily
      WINDOW fr AS (PARTITION BY event_type ORDER BY d
        ROWS BETWEEN 1 FOLLOWING AND 7 FOLLOWING))
    SELECT event_type, d, c, CAST(next7 AS BIGINT) AS next7
    FROM w WHERE nf = 7 ORDER BY event_type, d
  """

  // chained integer differences; lags computed BEFORE the filter
  val tsAcceleration: String = """
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM events GROUP BY 1, 2),
    s1 AS (SELECT event_type, d, c,
        c - lag(c) OVER (PARTITION BY event_type ORDER BY d) v
      FROM daily),
    s2 AS (SELECT event_type, d, v,
        v - lag(v) OVER (PARTITION BY event_type ORDER BY d) a
      FROM s1),
    s3 AS (SELECT event_type, d, v, a,
        lag(a) OVER (PARTITION BY event_type ORDER BY d) prev_a
      FROM s2),
    f AS (SELECT * FROM s3 WHERE a IS NOT NULL)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      CAST(max(abs(v)) AS BIGINT) AS max_abs_velocity,
      CAST(max(abs(a)) AS BIGINT) AS max_abs_accel,
      CAST(count(*) FILTER (prev_a IS NOT NULL AND
        ((a > 0 AND prev_a < 0) OR (a < 0 AND prev_a > 0)))
        AS BIGINT) AS n_inflections
    FROM f GROUP BY 1 ORDER BY event_type
  """

  // match-multiplicity bands over a left outer aggregate join
  val joinFanoutAudit: String = """
    WITH pc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) m
                FROM orders GROUP BY 1),
    j AS (SELECT COALESCE(m, 0) m FROM customer
          LEFT JOIN pc ON c_custkey = o_custkey)
    SELECT CASE WHEN m = 0 THEN '0_none' WHEN m = 1 THEN '1_exact'
        WHEN m <= 5 THEN '2_to_5' ELSE '6_plus' END AS fanout_band,
      CAST(count(*) AS BIGINT) AS n_keys,
      CAST(sum(m) AS BIGINT) AS n_joined_rows
    FROM j GROUP BY 1 ORDER BY fanout_band
  """

  // per-bin gaps frozen at 9 dp; ECE is one division
  val mlEceScore: String = """
    WITH k AS (SELECT CAST(concat('0x', substring(
        md5(CAST(event_id AS VARCHAR)), 1, 6)) AS BIGINT) k,
        CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END y
      FROM events),
    bins AS (SELECT CAST((10 * k + 5) // 16777216 AS INTEGER) bin,
        CAST(count(*) AS BIGINT) n, CAST(sum(y) AS BIGINT) n_pos,
        CAST(sum(k) AS BIGINT) sk
      FROM k GROUP BY 1),
    g AS (SELECT bin, n,
        CAST(ROUND(abs((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
          - (CAST(sk * 2 + n AS DOUBLE)
             / (CAST(n AS DOUBLE) * 33554432.0)))
          * CAST(n AS DOUBLE), 9) AS DECIMAL(28,9)) gap
      FROM bins),
    t AS (SELECT ROUND(CAST(sum(gap) AS DOUBLE)
        / CAST(sum(n) AS DOUBLE), 6) ece FROM g)
    SELECT bin, n, ROUND(CAST(gap AS DOUBLE), 6) AS weighted_gap, ece
    FROM g CROSS JOIN t ORDER BY bin
  """

  // identical to the direct filtered join — routing is physical
  val scaleSemijoinReduction: String = """
    SELECT o_orderpriority, CAST(month(o_orderdate) AS INTEGER) mon,
      CAST(count(*) AS BIGINT) n_items,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1997
    GROUP BY 1, 2 ORDER BY mon
  """

  // bucket = bit length of exact cents − 1 = floor(log2)
  val aggLogHistogram: String = """
    WITH c AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        AS BIGINT) cents FROM orders),
    f AS (SELECT cents, CAST(length(bin(cents)) - 1 AS INTEGER) b
          FROM c WHERE cents > 0)
    SELECT b, CAST(count(*) AS BIGINT) AS n, min(cents) AS min_cents,
      max(cents) AS max_cents, CAST(sum(cents) AS BIGINT) AS sum_cents
    FROM f GROUP BY 1 ORDER BY b
  """

  // two-round BM25: round-1 top-5 donate 3 expansion terms
  val simQueryExpansionPrf: String = s"""
    WITH $bm25Ctes,
    top5 AS (SELECT doc_id FROM bm ORDER BY bm25 DESC, doc_id LIMIT 5),
    expt AS (SELECT term FROM (
      SELECT t.term, count(*) c FROM toks t JOIN top5 USING (doc_id)
      WHERE t.term NOT IN ('spark', 'query', 'merge', 'dup')
      GROUP BY t.term ORDER BY c DESC, t.term LIMIT 3)),
    terms2 AS (SELECT unnest(['spark', 'query', 'merge', 'dup']) term
               UNION ALL SELECT term FROM expt),
    tf2 AS (SELECT doc_id, t.term, count(*) AS tf
            FROM toks t JOIN terms2 USING (term) GROUP BY 1, 2),
    dft2 AS (SELECT term, count(*) AS df FROM tf2 GROUP BY term),
    contrib2 AS (SELECT tf2.doc_id,
        CAST(round(CAST(round(ln(2.0 * (n + 1) / (2 * df + 1)), 9)
              AS DECIMAL(28,9)) *
          ((22.0 * tf * t) / (10.0 * t * tf + 3.0 * t + 9.0 * dl.dl * n)), 9)
          AS DECIMAL(28,9)) AS c
      FROM tf2 JOIN dl ON tf2.doc_id = dl.doc_id
      JOIN dft2 ON tf2.term = dft2.term CROSS JOIN tot),
    bm2 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
              round(CAST(sum(c) AS DOUBLE), 6) AS bm25
            FROM contrib2 GROUP BY doc_id)
    SELECT doc_id, n_terms, bm25 FROM bm2
    ORDER BY bm25 DESC, doc_id LIMIT 10
  """

  // every generated format parses and round-trips
  val fnMultiformatDates: String = """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      CAST(count(*) AS BIGINT) AS n,
      CAST(0 AS BIGINT) AS n_unparsed,
      CAST(count(*) AS BIGINT) AS n_roundtrip
    FROM orders GROUP BY 1 ORDER BY yr
  """

  // k = ceil(n/20) via 20·rn <= n + 19
  val winTopPercent: String = """
    WITH o AS (SELECT CAST(year(o_orderdate) AS INTEGER) yr, o_orderkey,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders),
    r AS (SELECT yr, cents, row_number() OVER (PARTITION BY yr
        ORDER BY cents DESC, o_orderkey) rn FROM o),
    c AS (SELECT yr y2, CAST(count(*) AS BIGINT) n FROM o GROUP BY 1)
    SELECT yr, CAST(count(*) AS BIGINT) AS n_top,
      min(cents) AS threshold_cents,
      CAST(sum(cents) AS BIGINT) AS top_cents
    FROM r JOIN c ON yr = y2 WHERE rn * 20 <= n + 19
    GROUP BY 1 ORDER BY yr
  """

  // the corrupt file contributes nothing; intact content survives
  val sourceIgnoreCorrupt: String = """
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        AS BIGINT) AS sum_cents
    FROM events GROUP BY 1 ORDER BY event_type
  """

  // published content equals the audited source batch
  val pipelineWriteAuditPublish: String = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders GROUP BY 1 ORDER BY o_orderpriority
  """

  // bounded brand×typo cross join; ties break by brand asc
  val fnFuzzyBrandMatch: String = """
    WITH brands AS (SELECT DISTINCT p_brand FROM part),
    typos AS (SELECT p_partkey, p_brand true_brand,
        CAST(p_partkey % (length(p_brand) - 1) + 1 AS INTEGER) pos
      FROM part),
    t2 AS (SELECT p_partkey, true_brand,
        substring(true_brand, 1, pos - 1)
          || substring(true_brand, pos + 1) typo
      FROM typos),
    sc AS (SELECT p_partkey, true_brand, b.p_brand,
        row_number() OVER (PARTITION BY p_partkey
          ORDER BY levenshtein(typo, b.p_brand), b.p_brand) rk
      FROM t2 CROSS JOIN brands b),
    best AS (SELECT * FROM sc WHERE rk = 1)
    SELECT true_brand, CAST(count(*) AS BIGINT) AS n,
      CAST(count(*) FILTER (p_brand = true_brand) AS BIGINT)
        AS n_recovered,
      ROUND(CAST(count(*) FILTER (p_brand = true_brand) AS DOUBLE)
        / CAST(count(*) AS DOUBLE), 6) AS recovery_rate
    FROM best GROUP BY 1 ORDER BY true_brand
  """

  // RE2 has no lookaround — semantics proven by substring counting
  val fnRegexLookahead: String = """
    WITH c AS (SELECT doc_id,
        CAST((length(text) - length(replace(text, 'data merge', '')))
          // 10 AS BIGINT) n_lookahead,
        CAST((length(text) - length(replace(text, 'fast scan', '')))
          // 9 AS BIGINT) n_lookbehind
      FROM documents)
    SELECT doc_id, n_lookahead, n_lookbehind FROM c
    WHERE n_lookahead > 0 OR n_lookbehind > 0 ORDER BY doc_id
  """

  // six unrolled push iterations; per-edge messages frozen at 9 dp
  val graphPersonalizedPagerank: String = {
    def step(i: Int) = s"""
    p$i AS (SELECT b, sum(CAST(ROUND(0.85 * x / CAST(d AS DOUBLE), 9)
        AS DECIMAL(28,9))) inflow
      FROM adj JOIN x${i - 1} ON a = node GROUP BY b),
    x$i AS (SELECT n.node, n.d,
        COALESCE(CAST(inflow AS DOUBLE), 0.0)
          + CASE WHEN n.node = s THEN 0.15 ELSE 0.0 END x
      FROM nodes n LEFT JOIN p$i ON p$i.b = n.node CROSS JOIN seed)"""
    s"""
    WITH $thinnedGraphCte,
    adj AS (SELECT u a, v b FROM und UNION ALL SELECT v, u FROM und),
    deg AS (SELECT a, CAST(count(*) AS BIGINT) d FROM adj GROUP BY 1),
    nodes AS (SELECT a node, d FROM deg),
    seed AS (SELECT min(node) s FROM nodes),
    x0 AS (SELECT node, d, CASE WHEN node = s THEN 1.0 ELSE 0.0 END x
           FROM nodes CROSS JOIN seed),
    ${(1 to 6).map(step).mkString(",")}
    SELECT node, ROUND(x, 6) AS ppr FROM x6
    WHERE ROUND(x, 6) > 0 ORDER BY ppr DESC, node LIMIT 50
  """
  }

  // 1-in-10 rows are malformed; they bucket under _CORRUPT
  val sourceJsonCorruptRecords: String = """
    WITH j AS (SELECT event_id, event_type,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) cents,
        event_id % 10 = 0 corrupt FROM events)
    SELECT CASE WHEN corrupt THEN '_CORRUPT' ELSE event_type END
        AS bucket,
      CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CASE WHEN corrupt THEN 0 ELSE cents END) AS BIGINT)
        AS sum_cents
    FROM j GROUP BY 1 ORDER BY bucket
  """

  // exact byte/token integers; one division per language
  val textBytesPerToken: String = """
    SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
      CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      ROUND(CAST(sum(strlen(text)) AS DOUBLE)
        / CAST(sum(len(string_split(text, ' '))) AS DOUBLE), 6)
        AS bytes_per_token
    FROM documents GROUP BY 1 ORDER BY lang
  """

  // weekend bits: Spark dayofweek 1/7 == DuckDB dayofweek 0/6
  val aggBitOps: String = """
    WITH m AS (SELECT event_type,
        (CASE WHEN CAST(value AS DECIMAL(12,2)) >= 50 THEN 1 ELSE 0 END
         + CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END * 2
         + CASE WHEN day(ts) <= 10 THEN 1 ELSE 0 END * 4
         + CASE WHEN event_id % 2 = 1 THEN 1 ELSE 0 END * 8) mask
      FROM events)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      CAST(bit_and(mask) AS BIGINT) AS and_mask,
      CAST(bit_or(mask) AS BIGINT) AS or_mask,
      CAST(bit_xor(mask) AS BIGINT) AS xor_mask
    FROM m GROUP BY 1 ORDER BY event_type
  """

  // RANGE shares frames across ORDER-value peers; ROWS splits them
  val winRangePeers: String = """
    WITH daily AS (SELECT o_orderpriority, CAST(o_orderdate AS DATE) d,
        CAST(count(*) AS BIGINT) c FROM orders GROUP BY 1, 2),
    f AS (SELECT * FROM daily WHERE year(d) = 1997)
    SELECT o_orderpriority, d, c,
      CAST(sum(c) OVER (PARTITION BY o_orderpriority ORDER BY c
        RANGE UNBOUNDED PRECEDING) AS BIGINT) AS cum_range,
      CAST(sum(c) OVER (PARTITION BY o_orderpriority ORDER BY c, d
        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rows,
      CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY c
        RANGE BETWEEN CURRENT ROW AND CURRENT ROW) AS BIGINT)
        AS n_peers
    FROM f ORDER BY o_orderpriority, c, d
  """

  // to_number must land the formatted strings back on exact cents
  val fnToNumber: String = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders GROUP BY 1 ORDER BY o_orderpriority
  """

  // canonical sorted-distinct-token hash census
  val dedupTokenSetHash: String = """
    WITH h AS (SELECT doc_id,
        md5(array_to_string(list_sort(list_distinct(
          string_split(text, ' '))), ' ')) h
      FROM documents)
    SELECT h, CAST(count(*) AS BIGINT) AS n_docs,
      min(doc_id) AS keep_id
    FROM h GROUP BY 1 HAVING count(*) > 1 ORDER BY h
  """

  // 0.1-wide bands on the 6-dp cosine over the count-capped md5
  // id-sample (P = ceil(n/1500)); identical double floor math and
  // identical coin on both engines
  val simCosineHistogram: String = s"""
    WITH cap AS (SELECT CAST(ceil(count(*) / 1500.0) AS BIGINT) p
                 FROM embeddings),
    s AS (SELECT vec_id, embedding FROM embeddings, cap
          WHERE CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 6)
                  AS BIGINT) % p = 0),
    p AS (SELECT ROUND($cosExpr, 6) c6
      FROM s a JOIN s b ON a.vec_id < b.vec_id)
    SELECT CAST(floor(c6 * 10) AS INTEGER) AS band,
      CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1 ORDER BY band
  """

  // order-grain lifecycle snapshot rolled to month grain
  val joinAccumulatingSnapshot: String = """
    WITH snap AS (SELECT o_orderkey, o_orderdate,
        min(l_shipdate) first_ship, max(l_shipdate) last_ship,
        CAST(count(*) AS BIGINT) n_lines,
        CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
          AS BIGINT)) AS BIGINT) gross_cents
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY 1, 2)
    SELECT strftime(o_orderdate, '%Y-%m') AS om,
      CAST(count(*) AS BIGINT) AS n_orders,
      CAST(sum(n_lines) AS BIGINT) AS n_lines,
      CAST(sum(gross_cents) AS BIGINT) AS gross_cents,
      CAST(sum(date_diff('day', CAST(first_ship AS DATE),
        CAST(last_ship AS DATE))) AS BIGINT) AS sum_span_days
    FROM snap GROUP BY 1 ORDER BY om
  """

  // H(next|prev) from exact counts; cells frozen at 9 dp
  val textBigramCondEntropy: String = """
    WITH toks AS (SELECT lang, string_split(text, ' ') AS t
      FROM documents WHERE len(string_split(text, ' ')) >= 2),
    bp AS (SELECT lang,
        unnest(list_transform(range(1, len(t)),
          i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS b
      FROM toks),
    cells AS (SELECT lang, b.w1 w1, b.w2 w2,
        CAST(count(*) AS BIGINT) n12 FROM bp GROUP BY 1, 2, 3),
    prefix AS (SELECT lang l2, w1 p1, CAST(sum(n12) AS BIGINT) n1
               FROM cells GROUP BY 1, 2),
    tot AS (SELECT lang l3, CAST(sum(n12) AS BIGINT) nt
            FROM cells GROUP BY 1),
    terms AS (SELECT lang, nt,
        CAST(ROUND(CAST(n12 AS DOUBLE)
          * LN(CAST(n1 AS DOUBLE) / CAST(n12 AS DOUBLE)), 9)
          AS DECIMAL(28,9)) term
      FROM cells JOIN prefix ON lang = l2 AND w1 = p1
        JOIN tot ON lang = l3)
    SELECT lang, max(nt) AS n_bigrams,
      ROUND(CAST(sum(term) AS DOUBLE) / CAST(max(nt) AS DOUBLE), 6)
        AS cond_entropy
    FROM terms GROUP BY 1 ORDER BY lang
  """

  // reciprocals frozen at 12 dp; the Pythagorean trio's third mean
  val aggHarmonicMean: String = """
    WITH r AS (SELECT l_returnflag,
        CAST(ROUND(1.0 / l_extendedprice, 12) AS DECIMAL(28,12)) r
      FROM lineitem)
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      ROUND(CAST(count(*) AS DOUBLE) / CAST(sum(r) AS DOUBLE), 6)
        AS harmonic_mean
    FROM r GROUP BY 1 ORDER BY l_returnflag
  """

  // overlay rebuilt with substring algebra; the rest map 1:1
  val fnStringBuilders: String = """
    SELECT p_partkey, p_name,
      substring(p_name, 1, 2) || '###' || substring(p_name, 6)
        AS spliced,
      repeat(substring(p_name, 1, 2), 3) AS repeated,
      lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS padded_key,
      reverse(p_name) AS reversed
    FROM part ORDER BY p_partkey
  """

  // normalization recovers every mangled reference
  val joinNormalizedKeys: String = """
    WITH messy AS (SELECT s_suppkey,
        CASE WHEN s_suppkey % 3 = 0 THEN upper(s_name)
             WHEN s_suppkey % 3 = 1 THEN '  ' || s_name || ' '
             ELSE s_name END ref_name
      FROM supplier),
    raw AS (SELECT CAST(count(*) AS BIGINT) n,
        CAST(count(d.s_nationkey) AS BIGINT) raw_matched
      FROM messy LEFT JOIN supplier d ON ref_name = d.s_name),
    norm AS (SELECT CAST(count(d.s_nationkey) AS BIGINT) norm_matched
      FROM messy LEFT JOIN supplier d
        ON upper(trim(ref_name)) = upper(trim(d.s_name)))
    SELECT n AS n_refs, raw_matched, norm_matched,
      norm_matched - raw_matched AS recovered
    FROM raw CROSS JOIN norm
  """

  // two exact means, one mirrored double ratio
  val analyticWeekendUplift: String = """
    WITH d0 AS (SELECT event_type, CAST(ts AS DATE) d,
        CAST(count(*) AS BIGINT) c
      FROM events GROUP BY 1, 2),
    daily AS (SELECT event_type, d, c,
        dayofweek(d) IN (0, 6) is_we FROM d0)
    SELECT event_type,
      CAST(count(*) FILTER (is_we) AS BIGINT) AS n_we_days,
      CAST(count(*) FILTER (NOT is_we) AS BIGINT) AS n_wd_days,
      ROUND((CAST(sum(CASE WHEN is_we THEN c ELSE 0 END) AS DOUBLE)
          / CAST(count(*) FILTER (is_we) AS DOUBLE))
        / (CAST(sum(CASE WHEN NOT is_we THEN c ELSE 0 END) AS DOUBLE)
          / CAST(count(*) FILTER (NOT is_we) AS DOUBLE)), 6)
        AS weekend_uplift
    FROM daily GROUP BY 1 ORDER BY event_type
  """

  // the nested export must unexplode onto the flat join
  val sourceNestedRoundtrip: String = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
        AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY 1 ORDER BY o_orderpriority
  """

  // explicit floor before every fractional cents cast (Spark
  // truncates decimal→long, DuckDB rounds — never cast a fraction)
  val analyticPriceWaterfall: String = """
    WITH li AS (SELECT strftime(o_orderdate, '%Y-%m') om,
        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
          gross,
        CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2))
          * CAST(l_discount AS DECIMAL(4,2)) * 100) AS BIGINT) disc,
        CAST(floor(CAST(l_extendedprice AS DECIMAL(12,2))
          * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
          * CAST(l_tax AS DECIMAL(4,2)) * 100) AS BIGINT) tax
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
    SELECT om, CAST(sum(gross) AS BIGINT) AS gross_cents,
      CAST(sum(disc) AS BIGINT) AS discount_cents,
      CAST(sum(tax) AS BIGINT) AS tax_cents,
      CAST(sum(gross) - sum(disc) + sum(tax) AS BIGINT)
        AS charged_cents
    FROM li GROUP BY 1 ORDER BY om
  """

  // partition-clustered write ⟹ exactly one file per directory
  val pipelinePartitionFileStats: String = """
    SELECT event_type, CAST(1 AS BIGINT) AS n_files,
      CAST(count(*) AS BIGINT) AS n_rows
    FROM events GROUP BY event_type ORDER BY event_type
  """

  // the builtin's edge semantics re-derived with the floor formula
  val fnWidthBucket: String = """
    WITH b AS (SELECT
        CAST(CASE WHEN o_totalprice < 50000.0 THEN 0
          WHEN o_totalprice >= 350000.0 THEN 7
          ELSE 1 + CAST(floor((o_totalprice - 50000.0) * 6
            / (350000.0 - 50000.0)) AS INTEGER) END AS INTEGER) bucket,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) cents
      FROM orders)
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      min(cents) AS min_cents, max(cents) AS max_cents
    FROM b GROUP BY 1 ORDER BY bucket
  """

  // integer rect algebra; IoU >= 0.3 ⟺ 13·inter >= 3·areas
  val multimodalBboxIou: String = """
    WITH boxes AS (SELECT event_id, CAST(ts AS DATE) d, user_id,
        CAST(event_id % 80 AS BIGINT) x,
        CAST((event_id * 7) % 80 AS BIGINT) y,
        CAST((event_id * 13) % 20 + 5 AS BIGINT) w,
        CAST((event_id * 29) % 20 + 5 AS BIGINT) h
      FROM events WHERE event_type = 'error'),
    p AS (SELECT a.d,
        greatest(0, least(a.x + a.w, b.x + b.w) - greatest(a.x, b.x))
          ix,
        greatest(0, least(a.y + a.h, b.y + b.h) - greatest(a.y, b.y))
          iy,
        a.w * a.h area_a, b.w * b.h area_b
      FROM boxes a JOIN boxes b
        ON a.d = b.d AND a.user_id = b.user_id
          AND a.event_id < b.event_id),
    q AS (SELECT d, ix * iy inter, area_a + area_b areas FROM p)
    SELECT CASE WHEN inter = 0 THEN 'disjoint'
        WHEN inter * 13 >= areas * 3 THEN 'overlap_30plus'
        ELSE 'touch_under_30' END AS band,
      CAST(count(*) AS BIGINT) AS n_pairs
    FROM q GROUP BY 1 ORDER BY band
  """

  // DISTINCT + FILTER branches in one aggregate pass
  val aggDistinctFilter: String = """
    WITH q AS (SELECT l_returnflag, CAST(l_quantity AS BIGINT) q,
        CAST(l_discount AS DECIMAL(4,2)) > 0 disc FROM lineitem)
    SELECT l_returnflag,
      CAST(count(DISTINCT CASE WHEN disc THEN q END) AS BIGINT)
        AS n_q_discounted,
      CAST(count(DISTINCT CASE WHEN NOT disc THEN q END) AS BIGINT)
        AS n_q_fullprice,
      CAST(count(*) AS BIGINT) AS n_rows
    FROM q GROUP BY 1 ORDER BY l_returnflag
  """

  // per-token upper-head/lower-tail algebra checks initcap semantics
  val fnInitcap: String = """
    SELECT p_partkey, p_name,
      array_to_string(list_transform(string_split(p_name, ' '),
        w -> CASE WHEN length(w) = 0 THEN w
          ELSE upper(substring(w, 1, 1)) || lower(substring(w, 2))
        END), ' ') AS title,
      array_to_string(list_transform(string_split(p_name, ' '),
        w -> CASE WHEN length(w) = 0 THEN w
          ELSE upper(substring(w, 1, 1)) || lower(substring(w, 2))
        END), ' ') AS title_from_upper
    FROM part ORDER BY p_partkey
  """

  // bare HAVING gates the implicit single global group
  val sqlHavingGlobal: String = """
    SELECT CAST(count(*) AS BIGINT) AS n,
      CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100
        AS BIGINT)) AS BIGINT) AS sum_cents
    FROM orders HAVING count(*) > 100
  """

  // chr(ascii(c)) is the identity on the ASCII head characters
  val fnCharCodes: String = """
    WITH h AS (SELECT ascii(substring(p_name, 1, 1)) c,
        substring(p_name, 1, 1) ch FROM part)
    SELECT CAST(c AS INTEGER) AS head_code, ch AS head_rt,
      CAST(count(*) AS BIGINT) AS n
    FROM h GROUP BY 1, 2 ORDER BY head_code
  """

  // v3-layout UUID spliced from md5 hex; pure string construction
  val fnUuid3Stable: String = """
    WITH h AS (SELECT o_orderkey,
        md5('order:' || CAST(o_orderkey AS VARCHAR)) h FROM orders)
    SELECT o_orderkey,
      substring(h, 1, 8) || '-' || substring(h, 9, 4) || '-3' ||
      substring(h, 14, 3) || '-' ||
      list_extract(['8', '9', 'a', 'b'],
        ((strpos('0123456789abcdef', substring(h, 17, 1)) - 1) % 4) + 1)
      || substring(h, 18, 3) || '-' || substring(h, 21, 12) AS uuid
    FROM h ORDER BY o_orderkey
  """

  // phrase = the corpus's most frequent adjacent word pair (ties by
  // terms); per-doc occurrence counts are plain adjacent-bigram
  // matches — equivalent to the engine's position-list intersection
  val analyticWelchTtest: String = """
    WITH t AS (SELECT o_orderpriority p, CAST(o_totalprice AS DECIMAL(12,2)) x
               FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    g AS (SELECT p, COUNT(*) n, CAST(SUM(x) AS DOUBLE) s,
                 CAST(SUM(x * x) AS DOUBLE) ss
          FROM t GROUP BY p),
    a AS (SELECT n n1, s s1, ss ss1 FROM g WHERE p = '1-URGENT'),
    b AS (SELECT n n2, s s2, ss ss2 FROM g WHERE p = '5-LOW')
    SELECT CAST(n1 AS BIGINT) n_urgent, CAST(n2 AS BIGINT) n_low,
      ROUND(s1 / n1, 6) mean_urgent, ROUND(s2 / n2, 6) mean_low,
      ROUND((s1 / n1 - s2 / n2) /
        sqrt(((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1 +
             ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2), 6) t_stat,
      ROUND(
        (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1 +
         ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2) *
        (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1 +
         ((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2) /
        ((((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1) *
         (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1) / (n1 - 1) +
         (((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2) *
         (((ss2 - s2 * s2 / n2) / (n2 - 1)) / n2) / (n2 - 1)), 4) welch_df
    FROM a, b
  """

  val analyticMannwhitneyU: String = """
    WITH t AS (SELECT o_orderpriority p,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) c
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
    vc AS (SELECT c,
        SUM(CASE WHEN p = '1-URGENT' THEN 1 ELSE 0 END) na,
        SUM(CASE WHEN p = '5-LOW' THEN 1 ELSE 0 END) nb
      FROM t GROUP BY c),
    cum AS (SELECT c, na, nb,
        COALESCE(SUM(nb) OVER (ORDER BY c
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cumb,
        COALESCE(SUM(na) OVER (ORDER BY c
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cuma
      FROM vc)
    SELECT CAST(SUM(na) AS BIGINT) n_a, CAST(SUM(nb) AS BIGINT) n_b,
      CAST(SUM(na * (2 * cumb + nb)) AS BIGINT) u2_a,
      CAST(SUM(nb * (2 * cuma + na)) AS BIGINT) u2_b
    FROM cum
  """

  val mlChiSquareSelect: String = """
    WITH cells AS (SELECT c_mktsegment segment,
        CAST(c_nationkey AS INTEGER) nation, COUNT(*) obs
      FROM customer GROUP BY 1, 2),
    rt AS (SELECT segment, SUM(obs) row_n FROM cells GROUP BY 1),
    ct AS (SELECT nation, SUM(obs) col_n FROM cells GROUP BY 1),
    tot AS (SELECT SUM(obs) n_total FROM cells)
    SELECT segment, nation, CAST(obs AS BIGINT) obs,
      ROUND(CAST(row_n * col_n AS DOUBLE) / n_total, 6) expected,
      ROUND((obs - CAST(row_n * col_n AS DOUBLE) / n_total) *
            (obs - CAST(row_n * col_n AS DOUBLE) / n_total) /
            (CAST(row_n * col_n AS DOUBLE) / n_total), 6) chi2_contrib
    FROM cells JOIN rt USING (segment) JOIN ct USING (nation), tot
    ORDER BY segment, nation
  """

  val mlQuantileBins: String = """
    WITH r AS (SELECT CAST(l_quantity AS INTEGER) v,
        NTILE(10) OVER (ORDER BY l_quantity, l_orderkey, l_linenumber) b
      FROM lineitem)
    SELECT b AS bin, CAST(COUNT(*) AS BIGINT) n_rows,
      MIN(v) min_q, MAX(v) max_q
    FROM r GROUP BY 1 ORDER BY 1
  """

  val mlCrossvalFolds: String = """
    WITH per AS (SELECT CAST(o_orderkey % 5 AS INTEGER) fold, COUNT(*) n,
        SUM(CAST(o_totalprice AS DECIMAL(12,2))) s,
        SUM(CAST(o_totalprice AS DECIMAL(12,2)) *
            CAST(o_totalprice AS DECIMAL(12,2))) ss
      FROM orders GROUP BY 1),
    tot AS (SELECT SUM(n) tn, SUM(s) ts, SUM(ss) tss FROM per)
    SELECT fold, CAST(n AS BIGINT) n_test,
      ROUND(CAST(ts - s AS DOUBLE) / (tn - n), 6) mean_train,
      ROUND(sqrt(CAST(ss AS DOUBLE) / n -
        2.0 * (CAST(ts - s AS DOUBLE) / (tn - n)) * (CAST(s AS DOUBLE) / n) +
        (CAST(ts - s AS DOUBLE) / (tn - n)) *
        (CAST(ts - s AS DOUBLE) / (tn - n))), 6) rmse
    FROM per, tot ORDER BY fold
  """

  val analyticAbLift: String = """
    WITH u AS (SELECT user_id,
        CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 13
             THEN 1 ELSE 0 END conv
      FROM events GROUP BY 1),
    g AS (SELECT CAST(user_id % 2 AS INTEGER) arm, COUNT(*) users,
        SUM(conv) convs FROM u GROUP BY 1),
    a AS (SELECT users users_a, convs conv_a FROM g WHERE arm = 0),
    b AS (SELECT users users_b, convs conv_b FROM g WHERE arm = 1)
    SELECT CAST(users_a AS BIGINT) users_a, CAST(conv_a AS BIGINT) conv_a,
      CAST(users_b AS BIGINT) users_b, CAST(conv_b AS BIGINT) conv_b,
      ROUND(CAST(conv_a AS DOUBLE) / users_a, 6) rate_a,
      ROUND(CAST(conv_b AS DOUBLE) / users_b, 6) rate_b,
      ROUND((CAST(conv_b AS DOUBLE) / users_b) /
            (CAST(conv_a AS DOUBLE) / users_a) - 1, 6) lift,
      ROUND((CAST(conv_b AS DOUBLE) / users_b -
             CAST(conv_a AS DOUBLE) / users_a) /
        sqrt((CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b)) *
             (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b)) *
             (1.0 / users_a + 1.0 / users_b)), 6) z_score
    FROM a, b
  """

  val joinFuzzyLevenshtein: String = """
    WITH v AS (SELECT DISTINCT unnest(string_split(p_name, ' ')) w FROM part)
    SELECT x.w w1, y.w w2, CAST(levenshtein(x.w, y.w) AS INTEGER) dist
    FROM v x, v y
    WHERE x.w < y.w AND abs(len(x.w) - len(y.w)) <= 1
      AND levenshtein(x.w, y.w) <= 2
    ORDER BY 1, 2
  """

  val textPhraseQueryK3: String = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents
               WHERE len(string_split(text, ' ')) >= 3),
    tri0 AS (SELECT doc_id,
        unnest(list_transform(generate_series(1, len(w) - 2),
          i -> {'a': w[i], 'b': w[i + 1], 'c': w[i + 2]})) p
      FROM t),
    tri AS (SELECT doc_id, p.a AS a, p.b AS b, p.c AS c FROM tri0),
    top AS (SELECT a, b, c FROM tri GROUP BY a, b, c
            ORDER BY count(*) DESC, a, b, c LIMIT 1)
    SELECT tri.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM tri JOIN top USING (a, b, c)
    GROUP BY 1 ORDER BY doc_id
  """

  val textPhraseQuery: String = """
    WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
    bi0 AS (SELECT doc_id,
        unnest(list_transform(generate_series(1, len(w) - 1),
          i -> {'a': w[i], 'b': w[i + 1]})) p
      FROM t),
    bi AS (SELECT doc_id, p.a AS a, p.b AS b FROM bi0),
    top AS (SELECT a, b FROM bi GROUP BY a, b
            ORDER BY count(*) DESC, a, b LIMIT 1)
    SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM bi JOIN top USING (a, b)
    GROUP BY 1 ORDER BY doc_id
  """

  // catalog statistics cross-check: the engine surfaces ANALYZE
  // TABLE's stored rowCount/nullCount/min/max; a direct aggregation
  // over the data must reproduce them exactly (ANALYZE's row count
  // and integer min/max are exact, not sampled)
  val scaleCboStats: String = """
    SELECT 'customer' AS tbl, 'c_custkey' AS key_col,
      CAST(count(*) AS BIGINT) AS n_rows,
      CAST(count(*) - count(c_custkey) AS BIGINT) AS n_nulls,
      CAST(min(c_custkey) AS BIGINT) AS min_key,
      CAST(max(c_custkey) AS BIGINT) AS max_key FROM customer
    UNION ALL SELECT 'lineitem', 'l_orderkey', CAST(count(*) AS BIGINT),
      CAST(count(*) - count(l_orderkey) AS BIGINT),
      CAST(min(l_orderkey) AS BIGINT), CAST(max(l_orderkey) AS BIGINT)
      FROM lineitem
    UNION ALL SELECT 'nation', 'n_nationkey', CAST(count(*) AS BIGINT),
      CAST(count(*) - count(n_nationkey) AS BIGINT),
      CAST(min(n_nationkey) AS BIGINT), CAST(max(n_nationkey) AS BIGINT)
      FROM nation
    UNION ALL SELECT 'orders', 'o_orderkey', CAST(count(*) AS BIGINT),
      CAST(count(*) - count(o_orderkey) AS BIGINT),
      CAST(min(o_orderkey) AS BIGINT), CAST(max(o_orderkey) AS BIGINT)
      FROM orders
    UNION ALL SELECT 'region', 'r_regionkey', CAST(count(*) AS BIGINT),
      CAST(count(*) - count(r_regionkey) AS BIGINT),
      CAST(min(r_regionkey) AS BIGINT), CAST(max(r_regionkey) AS BIGINT)
      FROM region
    UNION ALL SELECT 'supplier', 's_suppkey', CAST(count(*) AS BIGINT),
      CAST(count(*) - count(s_suppkey) AS BIGINT),
      CAST(min(s_suppkey) AS BIGINT), CAST(max(s_suppkey) AS BIGINT)
      FROM supplier
    ORDER BY tbl
  """

  // theta-method (theta=2) integer replay: rational OLS trend
  // (num/den, all integers), alpha=1/2 SES as (s+z)//2 over the
  // t-ordered theta-line numerators (// truncates toward zero exactly
  // like Spark DIV), one double division at the end
  val tsThetaForecast: String = """
    WITH RECURSIVE daily AS (SELECT CAST(ts AS DATE) d,
        CAST(sum(CAST(value AS DECIMAL(12,2)) * 100) AS BIGINT) y
      FROM events GROUP BY 1),
    pts AS (SELECT CAST(date_diff('day', (SELECT min(d) FROM daily), d)
        + 1 AS BIGINT) t, y FROM daily),
    m AS (SELECT CAST(count(*) AS BIGINT) n,
        CAST(sum(t) AS BIGINT) st, CAST(sum(y) AS BIGINT) sy,
        CAST(sum(t * t) AS BIGINT) stt, CAST(sum(t * y) AS BIGINT) sty
      FROM pts),
    c AS (SELECT n, st, sy, n * sty - st * sy AS bnum,
        n * stt - st * st AS bden,
        n * (n * stt - st * st) AS den,
        sy * (n * stt - st * st) - (n * sty - st * sy) * st AS c0
      FROM m),
    zs AS (SELECT row_number() OVER (ORDER BY t) ri, t,
        2 * y * den - (c0 + n * bnum * t) AS z
      FROM pts, c),
    rec AS (
      -- recurse on the DENSE rank ri, not raw t: a day with zero
      -- events would leave a gap in t and make the t-indexed lookup
      -- return NULL (nulling every forecast) while the Spark side
      -- folds the actual sorted t-list; ri == t on gap-free data so
      -- current outputs are unchanged (round-14 ADVICE)
      SELECT CAST(1 AS BIGINT) i, (SELECT z FROM zs WHERE ri = 1) s
      UNION ALL
      SELECT i + 1, (s + (SELECT z FROM zs WHERE ri = rec.i + 1)) // 2
      FROM rec WHERE i < (SELECT n FROM m)),
    ses AS (SELECT s FROM rec WHERE i = (SELECT n FROM m))
    SELECT h, round(CAST(s + c0 + n * bnum * (n + h) AS DOUBLE) /
        (2.0 * CAST(den AS DOUBLE)), 6) AS forecast
    FROM (SELECT unnest(range(1, 8)) AS h), ses, c
    ORDER BY h
  """

  // rank-sum via value-domain histograms: 2U = 2*sum cx(v)*cy(w<v) +
  // sum cx(v)*cy(v); exact pooled tie correction; the naive
  // triangular join here mirrors the engine's bucket-offset shape
  val analyticMannWhitneyU: String = """
    WITH ev AS (SELECT event_type,
        CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) v
      FROM events WHERE event_type IN ('purchase', 'view')),
    h AS (SELECT v,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
          AS BIGINT) cx,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
          AS BIGINT) cy
      FROM ev GROUP BY 1),
    wb AS (SELECT CAST(sum(a.cx * b.cy) AS BIGINT) w_below
           FROM h a JOIN h b ON b.v < a.v),
    tt AS (SELECT CAST(sum(cx * cy) AS BIGINT) w_tie,
        CAST(sum(cx) AS BIGINT) m, CAST(sum(cy) AS BIGINT) nn,
        CAST(sum((cx + cy) * (cx + cy) * (cx + cy) - (cx + cy))
          AS BIGINT) tcorr
      FROM h)
    SELECT m, nn AS n,
      CAST(w_below * 2 + w_tie AS DOUBLE) / 2.0 AS u,
      round((CAST(w_below * 2 + w_tie AS DOUBLE) / 2.0 -
          CAST(m * nn AS DOUBLE) / 2.0) /
        sqrt(CAST(m * nn AS DOUBLE) / 12.0 *
          (CAST(m + nn + 1 AS DOUBLE) - CAST(tcorr AS DOUBLE) /
            (CAST(m + nn AS DOUBLE) * CAST(m + nn - 1 AS DOUBLE)))), 6)
        AS z
    FROM wb, tt
  """

  // four exact integer cells; OR and Woolf log-CI are the only double
  // math, same expression shape on both engines
  val analyticOddsRatio: String = """
    WITH cells AS (SELECT
        CAST(sum(CASE WHEN event_type = 'purchase' AND hi THEN 1 ELSE 0 END) AS BIGINT) a,
        CAST(sum(CASE WHEN event_type = 'purchase' AND NOT hi THEN 1 ELSE 0 END) AS BIGINT) b,
        CAST(sum(CASE WHEN event_type = 'view' AND hi THEN 1 ELSE 0 END) AS BIGINT) c,
        CAST(sum(CASE WHEN event_type = 'view' AND NOT hi THEN 1 ELSE 0 END) AS BIGINT) d
      FROM (SELECT event_type,
          CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) >= 5000 hi
        FROM events WHERE event_type IN ('purchase', 'view')))
    SELECT a, b, c, d,
      round(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE), 6) AS odds_ratio,
      round(exp(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE)) -
        1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6) AS ci_lo,
      round(exp(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE)) +
        1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6) AS ci_hi
    FROM cells
  """

  // apriori L3: exact triple counts from the bounded-width in-basket
  // self-join at the binary-exact 1/256 ceil threshold
  val mlFpmFrequentTriples: String = """
    WITH b AS (SELECT DISTINCT l_orderkey o, p_brand i
               FROM lineitem JOIN part ON l_partkey = p_partkey),
    th AS (SELECT CAST(ceil(0.00390625 * count(DISTINCT o)) AS BIGINT) t
           FROM b),
    s3 AS (SELECT a.i item1, c.i item2, e.i item3, count(*) freq
           FROM b a JOIN b c ON a.o = c.o AND a.i < c.i
                    JOIN b e ON a.o = e.o AND c.i < e.i
           GROUP BY 1, 2, 3)
    SELECT item1, item2, item3, CAST(freq AS BIGINT) AS freq
    FROM s3, th WHERE freq >= t
    ORDER BY item1, item2, item3
  """

  // BH step-up in z-space against precomputed two-sided critical
  // values (no erf on either engine); exact decimal moments feed the
  // Welch z exactly as the engine side does
  val analyticFdrBh: String = """
    WITH mom AS (SELECT event_type, CAST(count(*) AS BIGINT) n,
        sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT)) s,
        sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT) *
            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS HUGEINT)) ss
      FROM events GROUP BY 1),
    m2 AS (SELECT event_type, n,
        CAST(s AS DOUBLE) / CAST(n AS DOUBLE) m,
        (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE) -
         CAST(s AS DOUBLE) * CAST(s AS DOUBLE)) /
        (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) v
      FROM mom),
    p AS (SELECT a.event_type ta, b.event_type tb,
        (a.m - b.m) / sqrt(a.v / a.n + b.v / b.n) z
      FROM m2 a JOIN m2 b ON a.event_type < b.event_type),
    r AS (SELECT ta, tb, z,
        row_number() OVER (ORDER BY abs(z) DESC, ta, tb) rn FROM p),
    c AS (SELECT ta, tb, z, rn,
        list_extract([2.807034, 2.575829, 2.432379, 2.326348, 2.241403,
                      2.170090, 2.108358, 2.053749, 2.004654, 1.959964],
                     CAST(rn AS INTEGER)) crit
      FROM r),
    im AS (SELECT max(CASE WHEN abs(z) >= crit THEN rn ELSE 0 END) imax
           FROM c)
    SELECT ta AS type_a, tb AS type_b, round(z, 6) AS z,
      CAST(rn AS BIGINT) AS bh_rank,
      round(CAST(crit AS DOUBLE), 6) AS crit_z,
      CAST(CASE WHEN rn <= imax THEN 1 ELSE 0 END AS BIGINT) AS reject
    FROM c, im ORDER BY type_a, type_b
  """

  // Misra-Gries no-false-negative guarantee makes the verified output
  // exactly the true heavy hitters: a direct HAVING mirrors it
  val aggMisraGriesTopk: String = """
    WITH b AS (SELECT p_brand FROM lineitem
               JOIN part ON l_partkey = p_partkey),
    n AS (SELECT count(*) nt FROM b)
    SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
      CAST(nt AS BIGINT) AS n_total
    FROM b, n GROUP BY p_brand, nt
    HAVING count(*) * 32 > nt
    ORDER BY p_brand
  """

  // int-scaled vectors, BIGINT centroid sums (order-free), sequential
  // list_dot_product == Spark's aggregate-over-zip_with fold, argmax
  // tie-broken by language — engine-identical predictions
  val mlPermutationImportance: String = """
    WITH lab AS (SELECT e.vec_id, d.lang,
        list_transform(e.embedding::DOUBLE[],
          x -> CAST(round(x * 10000000.0) AS BIGINT)) xi
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id),
    nn AS (SELECT count(*) n FROM lab),
    don AS (SELECT a.vec_id, a.lang, a.xi, b.xi xj
      FROM lab a JOIN lab b
        ON b.vec_id = (a.vec_id + 1) % (SELECT n FROM nn)),
    cent AS (SELECT lang, i, CAST(sum(xi[i]) AS BIGINT) s
      FROM lab, (SELECT unnest(range(1, 65)) i) ii GROUP BY 1, 2),
    cl AS (SELECT lang, list(s ORDER BY i) c FROM cent GROUP BY 1),
    clw AS (SELECT lang clang, c,
        sqrt(list_dot_product(c::DOUBLE[], c::DOUBLE[])) nrm FROM cl),
    var AS (SELECT vec_id, lang, v,
        list_transform(range(0, 64), ii -> CASE
          WHEN v > 0 AND ii // 16 = v - 1 THEN xj[CAST(ii + 1 AS INTEGER)]
          ELSE xi[CAST(ii + 1 AS INTEGER)] END) xv
      FROM don, (SELECT unnest(range(0, 5)) v) vv),
    sc AS (SELECT vec_id, lang, v, clang,
        list_dot_product(xv::DOUBLE[], c::DOUBLE[]) / nrm score
      FROM var, clw),
    pred AS (SELECT vec_id, lang, v, clang,
        row_number() OVER (PARTITION BY v, vec_id
          ORDER BY score DESC, clang) rn FROM sc),
    acc AS (SELECT v, CAST(count(*) AS BIGINT) n,
        CAST(sum(CASE WHEN clang = lang THEN 1 ELSE 0 END) AS BIGINT) nc
      FROM pred WHERE rn = 1 GROUP BY 1),
    base AS (SELECT CAST(nc AS DOUBLE) / n b FROM acc WHERE v = 0)
    SELECT CASE WHEN v = 0 THEN 'base'
        ELSE concat('block', CAST(v - 1 AS VARCHAR)) END AS variant,
      n, nc AS n_correct,
      round(CAST(nc AS DOUBLE) / n, 6) AS accuracy,
      round(b - CAST(nc AS DOUBLE) / n, 6) AS importance
    FROM acc, base ORDER BY variant
  """
}
