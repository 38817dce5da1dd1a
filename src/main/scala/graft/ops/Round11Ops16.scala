package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 16: exact naive Bayes, learning curve,
  * YTD cumulative, rolling min/max, positional index, CR4
  * concentration.
  */
object Round11Ops16 {

  private def u24(key: Column): Column =
    expr(s"CAST(conv(substring(md5(CAST(${key.toString} AS STRING)), 1, 6), 16, 10) AS BIGINT)")

  /** Multinomial naive Bayes from first principles, EXACT: md5-80/20
    * split, Laplace-smoothed per-(term,lang) log-probabilities and
    * log-priors each rounded into the 9-dp DECIMAL lane, so the
    * per-document score is an exact decimal sum (order-free at any
    * parallelism) and the argmax (score desc, lang asc) is engine-
    * identical. Unseen test terms hit the smoothed floor via a left
    * join against the training table — never a vocabulary broadcast
    * collect. The oracled twin of the MLlib ml_naive_bayes op.
    */
  def mlNbSqlExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val dec9 = DecimalType(28, 9)
    val docs = documents(spark, sfDir)
      .withColumn("is_train", pmod(u24($"doc_id"), lit(5)) < 4)
    val trainTok = docs.filter($"is_train")
      .select($"lang", explode(split($"text", " ")).as("term"))
    // per-lang token totals and class doc counts (5-row tables)
    val langTot = trainTok.groupBy($"lang").agg(count(lit(1)).as("nl"))
    val vocab = trainTok.select($"term").distinct()
      .agg(count(lit(1)).as("v"))
    val classCnt = docs.filter($"is_train")
      .groupBy($"lang").agg(count(lit(1)).as("ndocs"))
    val nTrain = docs.filter($"is_train").agg(count(lit(1)).as("nt"))
    // smoothed log p(term|lang) for observed pairs, 9-dp lane
    val tl = trainTok.groupBy($"term", $"lang").agg(count(lit(1)).as("c"))
      .join(broadcast(langTot), Seq("lang"))
      .join(broadcast(vocab))
      .select($"term", $"lang",
        round(log(($"c" + 1).cast(DoubleType) /
          ($"nl" + $"v").cast(DoubleType)), 9).cast(dec9).as("lp"))
    // floor log-prob per lang for unseen terms
    val floorLp = langTot.join(broadcast(vocab))
      .select($"lang", round(log(lit(1.0) /
        ($"nl" + $"v").cast(DoubleType)), 9).cast(dec9).as("lp0"))
    val prior = classCnt.join(broadcast(nTrain))
      .select($"lang", round(log($"ndocs".cast(DoubleType) /
        $"nt".cast(DoubleType)), 9).cast(dec9).as("lprior"))
    // test docs: every (doc term) × every candidate lang
    val testTok = docs.filter(!$"is_train")
      .select($"doc_id", $"lang".as("truth"),
        explode(split($"text", " ")).as("term"))
    val langs = langTot.select($"lang".as("cand"))
    val scored = testTok.crossJoin(broadcast(langs))
      .join(tl.withColumnRenamed("lang", "cand"), Seq("term", "cand"), "left")
      .join(broadcast(floorLp.withColumnRenamed("lang", "cand")), Seq("cand"))
      .select($"doc_id", $"truth", $"cand",
        coalesce($"lp", $"lp0").as("lp"))
      .groupBy($"doc_id", $"truth", $"cand")
      .agg(sum($"lp").cast(dec9).as("toksum"))
      .join(broadcast(prior.withColumnRenamed("lang", "cand")), Seq("cand"))
      .select($"doc_id", $"truth", $"cand",
        ($"toksum" + $"lprior").cast(dec9).as("score"))
    val pred = scored
      .withColumn("rn", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"score".desc, $"cand")))
      .filter($"rn" === 1)
    pred.groupBy($"truth")
      .agg(count(lit(1)).as("n"),
        sum(when($"cand" === $"truth", 1L).otherwise(0L)).as("n_correct"))
      .withColumn("accuracy",
        round($"n_correct".cast(DoubleType) / $"n".cast(DoubleType), 6))
      .orderBy($"truth")
  }

  /** Learning curve of the majority-class baseline: nested md5
    * training fractions (10/20/40/80%) against the fixed held-out
    * 20%, all counts exact. The curve shows whether more data moves
    * a baseline — the first sanity check any training pipeline runs.
    * One corpus pass per fraction over a 4-row fraction table via
    * conditional aggregation — not 4 scans.
    */
  def mlLearningCurve(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val base = events(spark, sfDir)
      .select($"event_type",
        pmod(u24($"event_id"), lit(100)).as("slot"),
        (money($"value") >= lit(50)).cast(LongType).as("y"))
    // slots 80-99 are the holdout; fraction f trains on slots < f
    val fracs = Seq(10, 20, 40, 80).toDF("frac")
    val trainStats = base.filter($"slot" < 80).crossJoin(broadcast(fracs))
      .filter($"slot" < $"frac")
      .groupBy($"frac")
      .agg(count(lit(1)).as("n_train"), sum($"y").as("pos_train"))
      .withColumn("pred_pos", $"pos_train" * 2 > $"n_train")
    val hold = base.filter($"slot" >= 80)
      .agg(count(lit(1)).as("n_test"), sum($"y").as("pos_test"))
    trainStats.join(broadcast(hold))
      .select($"frac", $"n_train",
        when($"pred_pos", lit(1)).otherwise(lit(0)).as("majority_label"),
        $"n_test",
        round(when($"pred_pos", $"pos_test".cast(DoubleType))
          .otherwise(($"n_test" - $"pos_test").cast(DoubleType)) /
          $"n_test".cast(DoubleType), 6).as("holdout_accuracy"))
      .orderBy($"frac")
  }

  /** Year-to-date cumulative revenue per nation: monthly rollup in
    * exact cents, then a running sum over a (nation, year)-
    * PARTITIONED window — the windowed series is |nations|·|months|,
    * independent of corpus size. The YTD restart at each January is
    * the partition boundary, not a CASE hack.
    */
  def tsYtdCumulative(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val monthly = orders(spark, sfDir)
      .join(customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation(spark, sfDir)),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name", year($"o_orderdate").as("yr"),
        month($"o_orderdate").as("mon"))
      .agg((sum(money($"o_totalprice")) * 100).cast(LongType).as("cents"))
    val w = Window.partitionBy($"n_name", $"yr").orderBy($"mon")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("ytd_cents", sum($"cents").over(w))
      .orderBy($"n_name", $"yr", $"mon")
  }

  /** Rolling 7-row min/max envelope of daily revenue per event type —
    * the monotonic-deque primitive behind band indicators, as
    * type-partitioned frames over the bounded daily rollup. Pure
    * integer cents; no protocol at all.
    */
  def winRollingMinmax(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val daily = events(spark, sfDir)
      .groupBy($"event_type", to_date($"ts").as("d"))
      .agg((sum(money($"value")) * 100).cast(LongType).as("cents"))
    val w = Window.partitionBy($"event_type").orderBy($"d")
      .rowsBetween(-6, 0)
    daily
      .withColumn("roll_min", min($"cents").over(w))
      .withColumn("roll_max", max($"cents").over(w))
      .withColumn("nf", count(lit(1)).over(w))
      .filter($"nf" === 7)
      .select($"event_type", $"d", $"cents", $"roll_min", $"roll_max")
      .orderBy($"event_type", $"d")
  }

  /** Positional inverted index for the 10 highest-df terms: every
    * posting carries its sorted 1-based position list — the phrase-
    * query structure. Positions come from posexplode (never a JVM
    * split-loop), the list is array_sort→joined (deterministic
    * rendering), and the df ranking ties on term. Postings stay
    * bounded: 10 terms × their documents.
    */
  def textPositionalIndex(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, sfDir)
      .select($"doc_id", posexplode(split($"text", " ")).as(Seq("p", "term")))
      .select($"doc_id", ($"p" + 1).as("pos"), $"term")
    val topTerms = toks.select($"term", $"doc_id").distinct()
      .groupBy($"term").agg(count(lit(1)).as("df"))
      .orderBy($"df".desc, $"term").limit(10)
    toks.join(broadcast(topTerms), Seq("term"))
      .groupBy($"term", $"df", $"doc_id")
      .agg(expr("array_join(transform(array_sort(collect_list(pos)), " +
        "x -> CAST(x AS STRING)), ',')").as("positions"),
        count(lit(1)).as("tf"))
      .orderBy($"term", $"doc_id")
      .select($"term", $"df", $"doc_id", $"tf", $"positions")
  }

  /** Four-firm concentration ratio (CR4) per region: the top-4
    * suppliers' share of regional supply revenue. Ranking runs under
    * a region-PARTITIONED window over the bounded supplier rollup;
    * shares divide exact cents once per region. Complements the HHI
    * op with the antitrust-standard cousin.
    */
  def analyticCr4(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val supRev = lineitem(spark, sfDir)
      .join(supplier(spark, sfDir), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation(spark, sfDir)),
        $"s_nationkey" === $"n_nationkey")
      .join(broadcast(region(spark, sfDir)),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"s_suppkey")
      .agg((sum(money($"l_extendedprice")) * 100).cast(DecimalType(38, 0))
        .as("cents"))
    val w = Window.partitionBy($"r_name")
      .orderBy($"cents".desc, $"s_suppkey")
    supRev
      .withColumn("rk", row_number().over(w))
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(when($"rk" <= 4, $"cents").otherwise(lit(0)))
          .cast(DecimalType(38, 0)).as("top4"),
        sum($"cents").cast(DecimalType(38, 0)).as("total"))
      .select($"r_name", $"n_suppliers",
        round($"top4".cast(DoubleType) / $"total".cast(DoubleType), 6)
          .as("cr4"))
      .orderBy($"r_name")
  }
}
