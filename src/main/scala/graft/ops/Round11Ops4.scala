package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 4: evaluation metrics over deterministic
  * pseudo-scores (log loss, calibration, NDCG), local clustering
  * coefficients on the co-supply graph, Lorenz/Gini revenue
  * concentration, and Markov event-transition estimation.
  */
object Round11Ops4 {

  /** The repo's md5-uniform protocol (sample_weighted and the
    * reservoir ops): first 6 md5 hex digits of the key → 24-bit
    * integer k, uniform on [0, 2²⁴). The derived probability
    * p = (k + 0.5)/2²⁴ is EXACT in a double (2⁴⁵-scaled integer over
    * a power of two), never 0 or 1, and identical on any engine.
    */
  private def u24(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    expr(s"CAST(conv(substring(md5(CAST(${key.toString} AS STRING)), 1, 6), 16, 10) AS BIGINT)")

  /** Binary cross-entropy (log loss) of a deterministic pseudo-model
    * per event type: label = 2-dp value ≥ 50, score p from the
    * md5-uniform protocol. Evaluation metrics are the training-data
    * pipeline's scoreboard; this op pins the EXACT protocol — p and
    * 1−p are dyadic rationals (exact doubles), ln is the one library
    * call and lands in the round-9dp DECIMAL lane, and y ∈ {0,1}
    * SELECTS one of the two rounded decimals per row (no float
    * mixing), so the sum is order-free and engine-identical. One hash
    * aggregate over the events scan; nothing corpus-sized moves.
    */
  def mlLogLoss(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val scored = events(spark, sfDir)
      .withColumn("k", u24($"event_id"))
      .withColumn("p", ($"k".cast(DoubleType) + 0.5) / 16777216.0)
      .withColumn("y", (money($"value") >= lit(50)).cast(IntegerType))
      .withColumn("loss",
        when($"y" === 1, round(-log($"p"), 9).cast(DecimalType(28, 9)))
          .otherwise(round(-log(lit(1.0) - $"p"), 9).cast(DecimalType(28, 9))))
    scored.groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"y").cast(LongType).as("n_pos"),
        round(sum($"loss").cast(DoubleType) / count(lit(1)), 6).as("log_loss"))
      .orderBy($"event_type")
  }

  /** Calibration-by-decile of the same pseudo-model: bin =
    * ⌊10·p⌋ computed in pure integer math ((10k+5) div 2²⁴), observed
    * positive rate vs mean predicted per bin — the reliability-diagram
    * table. mean_p avoids float accumulation entirely: Σp =
    * (2·Σk + n)/2²⁵ with Σk an exact BIGINT sum, one double division
    * at the end. A perfectly calibrated model has obs_rate ≈ mean_p
    * per bin; the op is the audit that detects when it doesn't.
    */
  def mlCalibrationBins(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    events(spark, sfDir)
      .withColumn("k", u24($"event_id"))
      .withColumn("bin", expr("CAST((10 * k + 5) DIV 16777216 AS INT)"))
      .withColumn("y", (money($"value") >= lit(50)).cast(IntegerType))
      .groupBy($"bin")
      .agg(count(lit(1)).as("n"),
        sum($"y").cast(LongType).as("n_pos"),
        sum($"k").as("sk"))
      .select($"bin", $"n", $"n_pos",
        round(($"sk" * 2 + $"n").cast(DoubleType) /
          ($"n".cast(DoubleType) * 33554432.0), 6).as("mean_p"),
        round($"n_pos".cast(DoubleType) / $"n", 6).as("obs_rate"))
      .orderBy($"bin")
  }

  /** NDCG@15 of the BM25 ranking with graded relevance = matched-term
    * count: per-position discounted gains rel/log2(pos+1) (round-9dp
    * DECIMAL lane for the one log2 call) and the ideal re-ranking from
    * the SAME 15 rows, fused as one scalar ndcg broadcast back onto
    * the position table. Both rankings use the window-free
    * collect/array_sort/posexplode shape — state is 15 structs; the
    * corpus-sized work is bm25Scores' already-bounded plan.
    */
  def mlNdcgBm25(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val top = Round11Ops3.textBm25Retrieval(spark, sfDir)
      .agg(collect_list(struct($"bm25".as("s"), $"doc_id".as("id"),
        $"n_terms".as("rel"))).as("arr"))
    def positions(sortS: Boolean) = top
      .select(posexplode(array_sort($"arr", (l, r) => {
        val (ps, pi) = if (sortS) (l("s"), l("id")) else (l("rel"), l("id"))
        val (qs, qi) = if (sortS) (r("s"), r("id")) else (r("rel"), r("id"))
        when(ps > qs, -1).when(ps < qs, 1)
          .when(pi < qi, -1).when(pi > qi, 1).otherwise(0)
      })).as(Seq("pos", "v")))
      .select(($"pos" + 1).as("pos"), $"v.id".as("doc_id"),
        $"v.rel".as("rel"),
        round($"v.rel".cast(DoubleType) / log2($"pos" + 2), 9)
          .cast(DecimalType(28, 9)).as("gain"))
    val ranked = positions(sortS = true)
    val dcg = ranked.agg(sum($"gain").as("dcg"))
    val idcg = positions(sortS = false).agg(sum($"gain").as("idcg"))
    ranked
      .crossJoin(broadcast(dcg)).crossJoin(broadcast(idcg))
      .select($"pos", $"doc_id", $"rel",
        $"gain".cast(DoubleType).as("gain"),
        round($"dcg".cast(DoubleType) / $"idcg".cast(DoubleType), 6).as("ndcg"))
      .orderBy($"pos")
  }

  /** Local clustering coefficient per node of the thinned co-supply
    * graph: closed wedges / possible wedges = 2T / (deg·(deg−1)).
    * Wedge enumeration is the adjacency self-join (bounded: degree ≤
    * 2k by the top-k thinning, so wedges per node ≤ C(2k,2) — a
    * CONSTANT per node at any corpus size); closure is a semi-join
    * against the canonical edge list. Nodes of degree < 2 have no
    * defined coefficient and are excluded, matching the oracle.
    */
  def graphClusteringCoeff(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val und = Round10Ops4.thinnedGraph(spark, sfDir)
    val adj = und.select($"u".as("a"), $"v".as("b"))
      .unionAll(und.select($"v".as("a"), $"u".as("b")))
    val deg = adj.groupBy($"a".as("node")).agg(count(lit(1)).as("degree"))
    val wedges = adj.as("x").join(adj.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.a").as("node"), col("x.b").as("u"), col("y.b").as("v"))
    val closed = wedges.join(und, Seq("u", "v"), "left_semi")
      .groupBy($"node").agg(count(lit(1)).as("tri"))
    deg.filter($"degree" >= 2)
      .join(closed, Seq("node"), "left")
      .select($"node", $"degree",
        coalesce($"tri", lit(0L)).as("triangles"),
        round(coalesce($"tri", lit(0L)).cast(DoubleType) * 2 /
          ($"degree" * ($"degree" - 1)), 6).as("coeff"))
      .orderBy($"node")
  }

  /** Lorenz curve by customer-revenue decile + the Gini coefficient:
    * G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over customers ranked
    * ascending by (revenue, custkey). The GLOBAL rank is the
    * two-phase bucket pattern (analytic_pareto_abc): range-bucket on
    * revenue, rank within each bucket under a PARTITIONED window,
    * offset by the lower buckets' counts via the tiny triangular
    * bucket join — no unpartitioned window, no corpus on one task.
    * i·xᵢ accumulates as BIGINT×DECIMAL (exact, order-free); the one
    * double division per output row happens at display time.
    */
  def analyticLorenzGini(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = orders(spark, sfDir)
      .groupBy($"o_custkey").agg(sum(money($"o_totalprice")).as("x"))
    val bucketed = rev.withColumn("b",
      floor($"x".cast(DoubleType) / 16384.0).cast(LongType))
    val within = bucketed.withColumn("rk_in",
      row_number().over(Window.partitionBy($"b").orderBy($"x", $"o_custkey")))
    val bcnt = bucketed.groupBy($"b").agg(count(lit(1)).as("bn"))
    val offsets = bcnt.as("t1")
      .join(bcnt.as("t2"), $"t2.b" < $"t1.b", "left")
      .groupBy($"t1.b".as("b"))
      .agg(coalesce(sum($"t2.bn"), lit(0L)).as("n_before"))
    val ranked = within.join(offsets, "b")
      .select($"o_custkey", $"x", ($"n_before" + $"rk_in").as("i"))
    val tot = rev.agg(count(lit(1)).as("n"), sum($"x").as("t"))
    val gini = ranked.agg(sum($"i" * $"x").as("sixi"))
      .crossJoin(broadcast(tot))
      .select(round(
        ($"sixi" * 2 - $"t" * ($"n" + 1)).cast(DoubleType) /
          ($"t" * $"n").cast(DoubleType), 6).as("gini"))
    val dec = ranked.crossJoin(broadcast(tot))
      .withColumn("decile", expr("CAST((i - 1) * 10 DIV n AS INT) + 1"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_cust"), sum($"x").as("rev_d"))
    val cum = dec.as("a").join(dec.as("b"), $"b.decile" <= $"a.decile")
      .groupBy($"a.decile".as("decile"))
      .agg(sum($"b.rev_d").as("cum_rev"))
    dec.join(cum, "decile")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(gini))
      .select($"decile", $"n_cust",
        $"rev_d".cast(DoubleType).as("revenue"),
        round($"cum_rev".cast(DoubleType) / $"t".cast(DoubleType), 6)
          .as("cum_share"),
        $"gini")
      .orderBy($"decile")
  }

  /** First-order Markov transition matrix over each user's event
    * sequence: P(next = b | current = a) estimated from lead() pairs
    * under the user-partitioned event order (ts, event_id). One
    * window pass + two bounded-key aggregates (|event types|² rows);
    * the from-state totals broadcast back for the probability
    * division — exact integer counts, one double division per cell.
    */
  def analyticMarkovTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val pairs = events(spark, sfDir)
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
    val trans = pairs.groupBy($"event_type".as("from_type"),
        $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy($"from_type").agg(sum($"n").as("tot"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select($"from_type", $"to_type", $"n",
        round($"n".cast(DoubleType) / $"tot", 6).as("p"))
      .orderBy($"from_type", $"to_type")
  }
}
