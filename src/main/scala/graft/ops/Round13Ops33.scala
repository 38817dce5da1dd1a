package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 33: exact LCS/ROUGE-L via the wavefront
  * fold, all-integer Page–Hinkley change detection, and radix
  * conversions.
  */
object Round13Ops33 {

  /** ROUGE-L between consecutive documents: the longest common token
    * subsequence, run as the same anti-diagonal wavefront fold as
    * ts_dtw_distance — a (prev, pp) BIGINT array pair carried through
    * one runtime `aggregate`, so the O(n·m) DP never materializes and
    * every cell is exact integer arithmetic (out-of-range cells hold
    * 0, which IS the LCS boundary value). Tokens are capped at the
    * first 24 per doc, so each pair costs a bounded ~48-step fold and
    * pairs parallelize embarrassingly — the scale shape of a
    * pairwise near-dup scorer.
    */
  def textLcsRougel(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = documents(spark, sfDir)
      .filter($"doc_id" < 60)
      .select($"doc_id", slice(split($"text", " "), 1, 24).as("tk"))
      .filter(size($"tk") >= 2)
    val p = t.as("x").join(t.as("y"),
        col("y.doc_id") === col("x.doc_id") + 1)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.tk").as("a"), col("y.tk").as("b"),
        size(col("x.tk")).cast(LongType).as("na"),
        size(col("y.tk")).cast(LongType).as("nb"))
    val z = "CAST(0 AS BIGINT)"
    val lcs = expr(s"""
      aggregate(
        sequence(3, CAST(na + nb AS INT)),
        named_struct(
          'prev', transform(sequence(1, CAST(na AS INT)), i ->
            CASE WHEN i = 1 AND element_at(a, 1) = element_at(b, 1)
              THEN CAST(1 AS BIGINT) ELSE $z END),
          'pp', transform(sequence(1, CAST(na AS INT)), i -> $z)),
        (st, dg) -> named_struct(
          'prev', transform(sequence(1, CAST(na AS INT)), i ->
            CASE WHEN dg - i >= 1 AND dg - i <= nb THEN
              CASE WHEN element_at(a, i) = element_at(b, dg - i)
                THEN IF(i > 1, element_at(st.pp, i - 1), $z) + 1
                ELSE greatest(
                  IF(i > 1, element_at(st.prev, i - 1), $z),
                  element_at(st.prev, i))
              END
            ELSE $z END),
          'pp', st.prev),
        st -> element_at(st.prev, CAST(na AS INT)))""")
    p.withColumn("lcs_len", lcs)
      .select($"doc_a", $"doc_b", $"na".as("n_a"), $"nb".as("n_b"),
        $"lcs_len",
        round(lit(2.0) * $"lcs_len" / ($"na" + $"nb"), 6).as("rouge_l_f1"))
      .orderBy($"doc_a")
  }

  /** Page–Hinkley change detection on daily revenue, fully integer:
    * with mean μ = T/n kept as the exact rational T over n, the PH
    * statistic n·PH_t = n·cumsum_t − t·T and its running minimum stay
    * BIGINT, so the alarm comparison (excess beyond 2% of total
    * revenue, cross-multiplied) is exact — no float threshold ever
    * drifts a flag. Two calendar-bounded global windows; the heavy
    * part (daily cents) is one map-side-combinable groupBy.
    */
  def tsPageHinkley(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // window-free cumulative state: prefix sums and running minima
    // are built as array folds over the calendar-bounded series (the
    // plan pin bans the unpartitioned cumulative Window this used)
    val arr = orders(spark, sfDir)
      .groupBy($"o_orderdate".cast(DateType).as("d"))
      .agg(sum((money($"o_totalprice") * 100).cast(LongType)).as("c"))
      .agg(array_sort(collect_list(struct($"d", $"c"))).as("s"))
      .select($"s", expr("transform(s, x -> x.c)").as("cs"))
      .select($"s", $"cs",
        expr("aggregate(cs, CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("t_cents"),
        size($"cs").cast(LongType).as("n"))
      .withColumn("cums", expr("""aggregate(cs,
        CAST(array() AS ARRAY<BIGINT>),
        (acc, x) -> concat(acc, array(
          IF(size(acc) = 0, CAST(0 AS BIGINT),
             element_at(acc, size(acc))) + x)))"""))
      .withColumn("phs", expr(
        "transform(sequence(1, CAST(n AS INT)), i -> " +
          "n * element_at(cums, i) - i * t_cents)"))
      .withColumn("mins", expr("""aggregate(phs,
        CAST(array() AS ARRAY<BIGINT>),
        (acc, x) -> concat(acc, array(least(
          IF(size(acc) = 0, CAST(0 AS BIGINT),
             element_at(acc, size(acc))), x))))"""))
    arr.select(posexplode($"s").as(Seq("p", "x")),
        $"phs", $"mins", $"t_cents", $"n")
      .select($"x.d".as("d"), $"x.c".as("day_cents"),
        expr("element_at(phs, p + 1)").as("ph_stat"),
        expr("element_at(phs, p + 1) - least(CAST(0 AS BIGINT), element_at(mins, p + 1))")
          .as("excess"),
        when(expr("(element_at(phs, p + 1) - least(CAST(0 AS BIGINT), element_at(mins, p + 1))) * 50")
          > $"t_cents" * $"n", 1L).otherwise(0L).as("alarm"))
      .orderBy($"d")
  }

  /** Radix conversions on the order key: hex / binary / base-7 /
    * octal digit strings — pure codegen'd expressions, no UDF.
    */
  def fnBaseConv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .filter($"o_orderkey" <= 40)
      .select($"o_orderkey",
        hex($"o_orderkey").as("hex_key"),
        bin($"o_orderkey").as("bin_key"),
        conv($"o_orderkey".cast(StringType), 10, 7).as("base7_key"),
        conv($"o_orderkey".cast(StringType), 10, 8).as("oct_key"))
      .orderBy($"o_orderkey")
  }
}
