package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 34: exact AdaBoost over decision stumps —
  * the full boosting loop (weighted error, argmin stump, weight
  * update, renormalization) in pure integer arithmetic, unrolled for
  * a fixed 3 rounds the way graph_weighted_pagerank unrolls its
  * iterations.
  *
  * Exactness scheme: weights start at 1; a round with total q and
  * chosen-stump error mass p multiplies wrong rows by (q−p) and right
  * rows by p (the unnormalized (1−ε)/ε update with every weight
  * scaled by p — ratios, hence all subsequent argmins, are
  * unchanged). Renormalization divides all weights by
  * greatest(1, Σ div 1e9), keeping every product under 2^63 at any
  * SF while preserving ~9 significant digits of the distribution.
  * The only reals are the α_t = ln((q−p)/p) vote coefficients,
  * frozen at 9 dp as DECIMAL before the per-row vote sum, so the
  * ensemble sign is exact and engine-independent.
  */
object Round13Ops34 {

  private val Scale = 1000000000L

  private def base(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .filter($"o_orderkey" < 500)
      .select($"o_orderkey".as("k"),
        when($"o_orderstatus" === "F", 1).otherwise(-1).as("y"),
        when(money($"o_totalprice") > 150000, 1).otherwise(-1).as("h1"),
        when(substring($"o_orderpriority", 1, 1).cast(IntegerType) <= 2, 1)
          .otherwise(-1).as("h2"),
        when(month($"o_orderdate") <= 6, 1).otherwise(-1).as("h3"),
        when($"o_custkey" % 2 === 0, 1).otherwise(-1).as("h4"),
        lit(1L).as("w"),
        lit(BigDecimal(0)).cast(DecimalType(24, 9)).as("vote"))
  }

  /** One boosting round: returns (scalar frame with q/p/kk, frame
    * with updated+renormalized weights and the vote accumulated).
    */
  private def boostRound(df: DataFrame): (DataFrame, DataFrame) = {
    def errOf(h: String): Column =
      sum(when(col(h) =!= col("y"), col("w")).otherwise(0L))
    val e = df.agg(sum(col("w")).as("q"), errOf("h1").as("p1"),
      errOf("h2").as("p2"), errOf("h3").as("p3"), errOf("h4").as("p4"))
    val s = e.select(col("q"),
      least(col("p1"), col("p2"), col("p3"), col("p4")).as("p"),
      when(col("p1") <= col("p2") && col("p1") <= col("p3") &&
        col("p1") <= col("p4"), 1)
        .when(col("p2") <= col("p3") && col("p2") <= col("p4"), 2)
        .when(col("p3") <= col("p4"), 3).otherwise(4).as("kk"))
    val upd = df.crossJoin(broadcast(s))
      .withColumn("ch", when(col("kk") === 1, col("h1"))
        .when(col("kk") === 2, col("h2"))
        .when(col("kk") === 3, col("h3")).otherwise(col("h4")))
      .withColumn("alpha",
        round(log((col("q") - col("p")).cast(DoubleType) / col("p")), 9)
          .cast(DecimalType(22, 9)))
      .withColumn("wu", when(col("ch") =!= col("y"),
        col("w") * (col("q") - col("p"))).otherwise(col("w") * col("p")))
      .withColumn("vote", col("vote") + col("alpha") * col("ch"))
    val d = upd.agg(sum(col("wu")).as("s"))
      .select(greatest(lit(1L), expr(s"s div $Scale")).as("d"))
    val next = upd.crossJoin(broadcast(d))
      .select(col("k"), col("y"), col("h1"), col("h2"), col("h3"),
        col("h4"), expr("wu div d").as("w"),
        col("vote").cast(DecimalType(24, 9)).as("vote"))
    (s, next)
  }

  private def rounds(spark: SparkSession, sfDir: String)
      : (Seq[DataFrame], DataFrame) = {
    var df = base(spark, sfDir)
    val picked = (1 to 3).map { _ =>
      val (s, next) = boostRound(df)
      // Round 20: cut lineage per round (the kcore/BFS lesson) — the
      // frame is o_orderkey<500-bounded (tiny at any SF) but each
      // round's plan embedded ALL previous rounds' crossJoin(broadcast
      // (agg)) subtrees, and every one of the ~5 scalar aggregates per
      // round re-planned and re-executed the whole chain (r20
      // before-dump: 15 jobs, 1.48 s for ~125 rows of actual data —
      // all planning/scheduling)
      df = next.localCheckpoint(true)
      s
    }
    (picked, df)
  }

  /** Per-round boosting trace: chosen stump, exact integer error
    * mass / total weight, error rate and the log-odds factor.
    */
  def mlAdaboostStumps(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (picked, _) = rounds(spark, sfDir)
    picked.zipWithIndex.map { case (s, i) =>
      s.select(lit((i + 1).toLong).as("boost_round"),
        $"kk".cast(LongType).as("stump"), $"p".as("err_num"),
        $"q".as("total_w"),
        round($"p".cast(DoubleType) / $"q", 6).as("err_rate"),
        // + 0.0 normalizes IEEE negative zero (a ~-1e-7 factor rounds
        // to -0.0 in DuckDB but 0.0 in Spark)
        (round(log(($"q" - $"p").cast(DoubleType) / $"p"), 6) + lit(0.0))
          .as("log_odds_factor"))
    }.reduce(_ union _).orderBy($"boost_round")
  }

  /** In-sample accuracy of the 3-round ensemble sign(Σ α_t·h_t):
    * the vote is an exact DECIMAL sum of 9dp-frozen coefficients, so
    * the decision boundary (vote > 0) is bit-stable; ties (vote = 0)
    * deterministically predict −1 on both engines.
    */
  def mlAdaboostVoteAcc(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, fin) = rounds(spark, sfDir)
    fin.agg(count(lit(1)).as("n"),
        sum(when(($"vote" > 0 && $"y" === 1) ||
          ($"vote" <= 0 && $"y" === -1), 1L).otherwise(0L))
          .as("n_correct"))
      .select($"n", $"n_correct",
        round($"n_correct".cast(DoubleType) / $"n", 6).as("accuracy"))
  }
}
