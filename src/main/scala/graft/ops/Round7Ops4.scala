package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-7 widening, part 5: EXISTS/NOT EXISTS subqueries, grouping_id,
  * binary codecs, left-outer interval join, PII audit, SQL WINDOW
  * clause, character n-grams, and nearest (bidirectional) as-of.
  */
object Round7Ops4 {

  /** Correlated EXISTS + NOT EXISTS in one query — Catalyst plans the
    * pair as a left-semi and a left-anti hash join on the correlation
    * key (no per-row subquery execution, no row explosion): existence
    * checks over a 100 TB fact cost one keyed shuffle each.
    */
  def sqlExistsCorrelated(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g7d_orders")
    lineitem(spark, sfDir).createOrReplaceTempView("g7d_lineitem")
    spark.sql("""
      SELECT o_orderstatus, count(*) AS n_orders
      FROM g7d_orders o
      WHERE EXISTS (SELECT 1 FROM g7d_lineitem l
                    WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45)
        AND NOT EXISTS (SELECT 1 FROM g7d_lineitem l2
                        WHERE l2.l_orderkey = o.o_orderkey
                          AND l2.l_discount > 0.09)
      GROUP BY o_orderstatus ORDER BY o_orderstatus
    """)
  }

  /** GROUPING SETS disambiguation: `grouping()` flags tell a subtotal
    * row's NULL apart from a data NULL — the detail reporting layers
    * need to consume rollups safely. Flags cast to INT on both engines
    * so the schema agrees.
    */
  def aggGroupingId(spark: SparkSession, sfDir: String): DataFrame = {
    lineitem(spark, sfDir).createOrReplaceTempView("g7d_lineitem_g")
    spark.sql("""
      SELECT l_returnflag, l_linestatus,
        CAST(grouping(l_returnflag) AS INT) AS g_rf,
        CAST(grouping(l_linestatus) AS INT) AS g_ls,
        count(*) AS n_items,
        CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM g7d_lineitem_g
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY g_rf, g_ls, l_returnflag, l_linestatus
    """)
  }

  /** Binary codec surface: UTF-8 → base64/hex and back — the plumbing
    * every opaque-payload (multimodal) column crosses on its way in and
    * out of text formats. The round-trip equality is asserted per row
    * IN the result, so the oracle pins both directions. Narrow
    * codegen'd projection.
    */
  def fnBinaryCodec(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .select($"doc_id",
        // Spark's base64 is MIME-chunked (\r\n every 76 chars) since 3.3's
        // java.util.Base64 switch; strip to the RFC 4648 canonical form
        // every other engine (and DuckDB's to_base64) emits.
        regexp_replace(base64($"text".cast(BinaryType)), "\r\n", "").as("b64"),
        substring(hex($"text".cast(BinaryType)), 1, 32).as("hex32"),
        octet_length($"text").cast(LongType).as("n_bytes"),
        (expr("CAST(unbase64(base64(CAST(text AS BINARY))) AS STRING)") === $"text")
          .as("roundtrip_ok"))
      .orderBy($"doc_id")
  }

  /** Left-outer interval join (batch mirror of the streaming path in
    * [[Streaming.intervalJoinOuterStream]]): every click keeps a row;
    * unmatched clicks carry NULLs — the attribution view that inner
    * interval joins silently drop. Same user_id equi-key keeps it a
    * hash join with the time window as residual condition.
    */
  def streamIntervalJoinOuter(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = events(spark, sfDir)
    val clicks = e.filter($"event_type" === "click")
      .select($"user_id", $"event_id".as("click_id"), $"ts".as("click_ts"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"))
    clicks.join(purchases,
        $"user_id" === $"p_user" &&
        $"purchase_ts" >= $"click_ts" &&
        $"purchase_ts" < $"click_ts" + expr("INTERVAL '10' MINUTE"),
        "left_outer")
      .select($"user_id", $"click_id", $"purchase_id",
        (expr("unix_micros(CAST(purchase_ts AS TIMESTAMP))") -
          expr("unix_micros(CAST(click_ts AS TIMESTAMP))")).as("gap_us"))
      .orderBy($"user_id", $"click_id", $"purchase_id".asc_nulls_first)
  }

  /** PII exposure audit: per-source hit counts and rates for email /
    * phone patterns (injected deterministically into a known subset, so
    * the rates are meaningful and fully oracle-checked). The governance
    * face of `text_pii_mask` — one scan, codegen'd rlike, tiny
    * aggregate.
    */
  def pipelinePiiAudit(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = concat($"text",
      when(pmod($"doc_id", lit(3)) === 0,
        concat(lit(" contact user"), $"doc_id".cast(StringType),
          lit("@example.com"))).otherwise(lit("")),
      when(pmod($"doc_id", lit(5)) === 0,
        concat(lit(" call +1-555-"),
          lpad(pmod($"doc_id", lit(10000)).cast(StringType), 4, "0")))
        .otherwise(lit("")))
    documents(spark, sfDir)
      .withColumn("raw", raw)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"raw".rlike("[a-z0-9.]+@[a-z0-9.]+"), 1L).otherwise(0L))
          .as("n_email"),
        sum(when($"raw".rlike("\\+[0-9][0-9-]{5,}"), 1L).otherwise(0L))
          .as("n_phone"))
      .select($"source", $"n_docs", $"n_email", $"n_phone",
        expr("CAST(n_email AS DOUBLE) / CAST(n_docs AS DOUBLE)").as("email_rate"),
        expr("CAST(n_phone AS DOUBLE) / CAST(n_docs AS DOUBLE)").as("phone_rate"))
      .orderBy($"source")
  }

  /** SQL WINDOW clause: one named frame definition shared by several
    * window functions (vs restating the OVER spec) — same physical
    * plan, single shuffle+sort per distinct frame, and the form wide
    * analytics queries actually use.
    */
  def sqlWindowClause(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g7d_orders_w")
    spark.sql("""
      SELECT o_orderkey, o_custkey, o_totalprice,
        rank() OVER w AS rnk,
        CAST(count(*) OVER w AS INT) AS n_seen,
        CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w2 AS DOUBLE)
          AS run_total
      FROM g7d_orders_w
      WINDOW
        w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ROWS UNBOUNDED PRECEDING),
        w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING)
      ORDER BY o_orderkey
    """)
  }

  /** Character trigram profile per language — the feature family real
    * language-ID models use (vs the word-list heuristic in
    * `text_lang_id`). Explode is bounded by text length; the shuffle
    * carries |langs × distinct trigrams|, i.e. vocabulary not corpus.
    */
  def textCharNgrams(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // Round 20: the 0.6 MB documents file is ONE scan split, so the
    // trigram explode (≈1.5 M substring allocations) + partial count
    // ran serial at 2.5 s with 0.03 MB shuffle. Guard the stage's
    // parallelism (one narrow (lang, text) exchange, no-op when the
    // scan splits naturally — ScaleTechniques.ensureParallelism).
    val grams = ScaleTechniques.ensureParallelism(documents(spark, sfDir)
      .filter(length($"text") >= 3)
      .select($"lang", $"text"))
      .select($"lang", explode(expr(
        "transform(sequence(1, length(text) - 2), i -> substring(text, i, 3))"
      )).as("gram"))
      .groupBy($"lang", $"gram").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"lang").orderBy($"n".desc, $"gram")
    grams.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 20)
      .orderBy($"lang", $"rn")
  }

  /** Nearest as-of: each click paired with the user's closest purchase
    * in EITHER direction (ties → the earlier, i.e. backward, side).
    * Both candidates come from the same single user-keyed window
    * shuffle (backward last + forward first over one union), then a
    * pure-integer microsecond comparison picks the winner — no second
    * shuffle, no join. The signed gap (negative = purchase before
    * click) keeps the direction auditable.
    */
  def joinAsofNearest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val wB = Window.partitionBy($"user_id").orderBy($"um", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy($"user_id").orderBy($"um", $"event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    events(spark, sfDir)
      .filter($"event_type".isin("click", "purchase"))
      .withColumn("um", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
      .withColumn("p_id", when($"event_type" === "purchase", $"event_id"))
      .withColumn("p_um", when($"event_type" === "purchase", $"um"))
      .withColumn("b_id", last($"p_id", ignoreNulls = true).over(wB))
      .withColumn("b_um", last($"p_um", ignoreNulls = true).over(wB))
      .withColumn("f_id", first($"p_id", ignoreNulls = true).over(wF))
      .withColumn("f_um", first($"p_um", ignoreNulls = true).over(wF))
      .filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id",
        expr("""CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                     WHEN f_id IS NULL THEN b_id
                     WHEN b_id IS NULL THEN f_id
                     WHEN um - b_um <= f_um - um THEN b_id
                     ELSE f_id END""").as("nearest_purchase_id"),
        expr("""CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
                     WHEN f_id IS NULL THEN b_um - um
                     WHEN b_id IS NULL THEN f_um - um
                     WHEN um - b_um <= f_um - um THEN b_um - um
                     ELSE f_um - um END""").as("gap_us"))
      .orderBy($"click_id")
  }
}
