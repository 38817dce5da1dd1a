package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 28: from_csv parsing, ordinal GROUP BY,
  * control chart, canonical JSON roundtrip, token rank shift, ACF
  * table.
  */
object Round11Ops28 {

  /** from_csv over an embedded CSV string column — the
    * message-in-a-column pattern (CSV payloads inside a transport
    * table): construct the line, parse it back under an explicit
    * schema, and prove the roundtrip by aggregating the PARSED
    * fields onto the source numbers. Parsing is per-row codegen'd —
    * no second file pass.
    */
  def fnFromCsv(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .select(concat($"event_id", lit(","), $"event_type", lit(","),
        (money($"value") * 100).cast(LongType)).as("line"))
      .select(expr(
        "from_csv(line, 'event_id BIGINT, event_type STRING, cents BIGINT')")
        .as("r"))
      .groupBy($"r.event_type".as("event_type"))
      .agg(count(lit(1)).as("n"), sum($"r.cents").as("sum_cents"))
      .orderBy($"event_type")
  }

  /** Ordinal GROUP BY / ORDER BY with HAVING over an alias — the
    * porting surface every warehouse migration hits first: positions
    * resolve against the select list, HAVING sees the aggregate.
    */
  def sqlGroupByOrdinal(spark: SparkSession, sfDir: String): DataFrame = {
    orders(spark, sfDir).createOrReplaceTempView("g11_orders_ord")
    spark.sql("""
      SELECT o_orderpriority, CAST(year(o_orderdate) AS INT) yr,
        CAST(count(*) AS BIGINT) n,
        CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
          AS BIGINT) sum_cents
      FROM g11_orders_ord
      GROUP BY 1, 2 HAVING count(*) > 5
      ORDER BY 1, 2
    """)
  }

  /** p-chart (attribute control chart): each day's error rate scored
    * against the global rate's binomial band — z = (p − p̄)/√(p̄(1−p̄)/n)
    * with p̄ ONE exact division and the z expression mirrored
    * operation-for-operation. Emits the z score, not a flag: the
    * threshold comparison belongs to the consumer, the engine owes
    * the deterministic statistic.
    */
  def tsControlChart(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy(to_date($"ts").as("d"))
      .agg(count(lit(1)).as("n"),
        count(when($"event_type" === "error", 1)).as("n_err"))
    val g = daily.agg(sum($"n").as("tn"), sum($"n_err").as("te"))
      .select(($"te".cast(DoubleType) / $"tn".cast(DoubleType)).as("pbar"))
    daily.crossJoin(broadcast(g))
      .select($"d", $"n", $"n_err",
        round((($"n_err".cast(DoubleType) / $"n".cast(DoubleType)) - $"pbar") /
          sqrt($"pbar" * (lit(1.0) - $"pbar") / $"n".cast(DoubleType)), 6)
          .as("z"))
      .orderBy($"d")
  }

  /** Canonical JSON export roundtrip: to_json over a struct emits the
    * canonical no-whitespace field-ordered form; from_json parses it
    * back and the fields must equal the source columns. The oracle
    * states the EXPECTED json text from the source columns directly,
    * so Spark's serialization format is pinned semantically.
    */
  def fnJsonCanonical(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val withJson = events(spark, sfDir)
      .select($"event_id", $"event_type",
        to_json(struct($"event_id", $"event_type")).as("json"))
    withJson
      .select($"event_id", $"json",
        from_json($"json", StructType(Seq(
          StructField("event_id", LongType),
          StructField("event_type", StringType))))
          .getField("event_type").as("rt_type"))
      .orderBy($"event_id")
  }

  /** Vocabulary rank shift between two sources — the corpus-drift
    * lens: every shared token's frequency rank in src0 vs src1
    * (count desc, token asc — deterministic), with the shift. Ranks
    * come from source-partitioned windows over the token rollup;
    * output is vocabulary-sized.
    */
  def textRankShift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, sfDir)
      .filter($"source".isin("src0", "src1"))
      .select($"source", explode(split($"text", " ")).as("tok"))
      .groupBy($"source", $"tok").agg(count(lit(1)).as("c"))
    val ranked = toks.withColumn("rk", row_number().over(
      Window.partitionBy($"source").orderBy($"c".desc, $"tok")))
    val a = ranked.filter($"source" === "src0")
      .select($"tok", $"rk".as("rank_a"), $"c".as("n_a"))
    val b = ranked.filter($"source" === "src1")
      .select($"tok".as("tok_b"), $"rk".as("rank_b"), $"c".as("n_b"))
    a.join(b, $"tok" === $"tok_b")
      .select($"tok", $"rank_a", $"rank_b", $"n_a", $"n_b",
        ($"rank_b" - $"rank_a").as("shift"))
      .orderBy($"rank_a", $"tok")
  }

  /** The autocorrelation table (lags 1–7) per event type — the ACF
    * diagnostic every forecasting run prints. Lag pairs come from a
    * date-shift equi-join (no dynamic window offsets); deviation
    * products freeze at 6 dp as DECIMAL before summation, and each
    * ACF value divides two exact sums once. Numerators and the
    * shared denominator both flow from the same frozen deviations.
    */
  def tsAcfTable(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg(count(lit(1)).as("c"))
    val mu = daily.groupBy($"event_type".as("et"))
      .agg((sum($"c").cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("mu"))
    val dev = daily.join(mu, $"event_type" === $"et")
      .select($"event_type", $"d", ($"c".cast(DoubleType) - $"mu").as("dv"))
    val den = dev.groupBy($"event_type".as("et2"))
      .agg(sum(round($"dv" * $"dv", 6).cast(DecimalType(28, 6))).as("den"))
    val lagged = dev.withColumn("k", explode(array((1 to 7).map(lit): _*)))
      .select($"event_type", $"d", $"k", $"dv")
    val pairs = lagged.as("a").join(
        dev.select($"event_type".as("e2"), $"d".as("d2"), $"dv".as("dv2")),
        col("a.event_type") === $"e2" &&
        $"d2" === expr("date_add(a.d, a.k)"))
      .groupBy(col("a.event_type").as("event_type"), col("a.k").as("k"))
      .agg(sum(round(col("a.dv") * $"dv2", 6).cast(DecimalType(28, 6)))
        .as("num"), count(lit(1)).as("n_pairs"))
    pairs.join(den, $"event_type" === $"et2")
      .select($"event_type", $"k", $"n_pairs",
        round($"num".cast(DoubleType) / $"den".cast(DoubleType), 6)
          .as("acf"))
      .orderBy($"event_type", $"k")
  }
}
