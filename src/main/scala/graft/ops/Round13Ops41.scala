package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 41: exact L2 gradient boosting over
  * decision stumps — residuals stay integer cents (learning rate 1/2
  * applied with truncating division), split scores are one mirrored
  * double formula, and the whole 3-round loop is unrolled the way
  * ml_adaboost_stumps unrolls its weight updates.
  */
object Round13Ops41 {

  private val Cuts: Seq[(Int, String)] = Seq(
    1 -> "m <= 3", 2 -> "m <= 6", 3 -> "m <= 9",
    4 -> "p <= 2", 5 -> "p <= 3", 6 -> "c <= 3")

  private def base(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = orders(spark, sfDir)
      .filter($"o_orderkey" < 2000)
      .select($"o_orderkey".as("k"),
        (money($"o_totalprice") * 100).cast(LongType).as("y"),
        month($"o_orderdate").as("m"),
        substring($"o_orderpriority", 1, 1).cast(IntegerType).as("p"),
        ($"o_custkey" % 7).cast(IntegerType).as("c"))
    val g = t.agg(sum($"y").as("sy"), count(lit(1)).as("ny"))
    t.crossJoin(broadcast(g))
      .select($"k", $"m", $"p", $"c",
        ($"y" - expr("sy div ny")).as("r"))
  }

  /** One boosting round over residual column r: returns (chosen-split
    * scalar frame, frame with updated residuals). Everything happens
    * on ONE single-row aggregate — the argmax is a CASE chain over
    * six score columns, never a 6-way union re-executing the
    * aggregate per candidate (the first version did exactly that,
    * and the recomputation compounded across unrolled rounds to a
    * 17 s op; this form benches at well under a second).
    */
  private def boostRound(df: DataFrame): (DataFrame, DataFrame) = {
    val aggCols = Seq(sum(col("r")).as("s"), count(lit(1)).as("n")) ++
      Cuts.flatMap { case (i, cond) => Seq(
        sum(when(expr(cond), 1L).otherwise(0L)).as(s"nl$i"),
        sum(when(expr(cond), col("r")).otherwise(0L)).as(s"sl$i")) }
    val e = df.agg(aggCols.head, aggCols.tail: _*)
    def scoreOf(i: Int): Column = {
      val nl = col(s"nl$i"); val sl = col(s"sl$i")
      when(nl === 0 || nl === col("n"), lit(-1.0)).otherwise {
        val num = col("n").cast(DoubleType) * sl -
          nl.cast(DoubleType) * col("s")
        num * num / (nl.cast(DoubleType) *
          (col("n") - nl).cast(DoubleType) * col("n").cast(DoubleType))
      }
    }
    val scored = Cuts.foldLeft(e) { case (acc, (i, _)) =>
      acc.withColumn(s"sc$i", scoreOf(i))
    }
    // argmax with ties to the smallest cut id, as a CASE chain: cut i
    // wins iff its score >= every LATER candidate's (the same chain
    // shape as ml_adaboost_stumps' argmin)
    val ids = Cuts.map(_._1)
    val cutCol = ids.init.foldLeft(when(lit(false), 0L)) { (acc, i) =>
      acc.when(ids.filter(_ > i)
        .map(j => col(s"sc$i") >= col(s"sc$j"))
        .reduce(_ && _), i.toLong)
    }.otherwise(ids.last.toLong)
    def ofCut(prefix: String): Column =
      ids.init.foldLeft(when(lit(false), lit(0L))) { (acc, i) =>
        acc.when(col("cut") === i, col(s"$prefix$i"))
      }.otherwise(col(s"$prefix${ids.last}"))
    def scOfCut: Column =
      ids.init.foldLeft(when(lit(false), lit(0.0))) { (acc, i) =>
        acc.when(col("cut") === i, col(s"sc$i"))
      }.otherwise(col(s"sc${ids.last}"))
    val pick = scored.withColumn("cut", cutCol)
      .select(col("cut"), col("n"), col("s"),
        ofCut("nl").as("nl"), ofCut("sl").as("sl"),
        scOfCut.as("score"))
    val condOfCut = expr("CASE cut " + Cuts.map { case (i, cond) =>
      s"WHEN $i THEN ($cond)" }.mkString(" ") + " END")
    val next = df.crossJoin(broadcast(pick))
      .withColumn("pred", when(condOfCut, expr("sl div nl"))
        .otherwise(expr("(s - sl) div (n - nl)")))
      .select(col("k"), col("m"), col("p"), col("c"),
        (col("r") - expr("pred div 2")).as("r"))
    (pick, next)
  }

  private def rounds(spark: SparkSession, sfDir: String)
      : (Seq[DataFrame], DataFrame, DataFrame) = {
    val b = base(spark, sfDir)
    var df = b
    val picked = (1 to 3).map { _ =>
      val (s, next) = boostRound(df)
      df = next
      s
    }
    (picked, b, df)
  }

  /** Per-round boosting trace: chosen cut, leaf populations and
    * integer-cent leaf predictions, variance-reduction score.
    */
  def mlGbmStumpRounds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (picked, _, _) = rounds(spark, sfDir)
    picked.zipWithIndex.map { case (s, i) =>
      s.select(lit((i + 1).toLong).as("boost_round"), $"cut",
        $"nl".as("n_left"),
        expr("sl div nl").as("pred_left_cents"),
        expr("(s - sl) div (n - nl)").as("pred_right_cents"),
        round($"score" / 1e12, 6).as("score_e12"))
    }.reduce(_ union _).orderBy($"boost_round")
  }

  /** Fit quality of the 3-round ensemble: RMSE of centered residuals
    * before and after boosting (exact DECIMAL sums of squared cents)
    * and the SSE ratio — how much variance three stumps at learning
    * rate 1/2 actually removed.
    */
  def mlGbmResidualMse(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val (_, b0, b3) = rounds(spark, sfDir)
    def sse(df: DataFrame): DataFrame =
      df.agg(sum(($"r".cast(DecimalType(38, 0)) * $"r")
        .cast(DecimalType(38, 0))).as("sse"), count(lit(1)).as("n"))
    val s0 = sse(b0).select($"sse".as("sse0"), $"n")
    val s3 = sse(b3).select($"sse".as("sse3"))
    s0.crossJoin(broadcast(s3))
      .select($"n",
        round(sqrt($"sse0".cast(DoubleType) / $"n"), 2).as("rmse0_cents"),
        round(sqrt($"sse3".cast(DoubleType) / $"n"), 2).as("rmse3_cents"),
        round($"sse3".cast(DoubleType) / $"sse0".cast(DoubleType), 6)
          .as("sse_ratio"))
  }
}
