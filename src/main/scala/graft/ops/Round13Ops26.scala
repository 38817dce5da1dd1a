package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 26: CUPED variance reduction and the Theil
  * within/between inequality decomposition.
  */
object Round13Ops26 {

  /** CUPED adjustment for the two-arm experiment (arm = user mod 2):
    * the post-period purchase count Y is adjusted by the PRE-period
    * count X via θ = cov(X,Y)/var(X), shrinking variance without
    * moving the expected lift — the standard trick that halves
    * experiment runtimes. Pre/post split at the span midpoint; all
    * nine moment partials are exact integers from ONE per-user
    * aggregate; θ, adjusted means, and the variance-reduction ratio
    * are the fixed-shape double epilogue.
    */
  def analyticCupedAdjustment(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = events(spark, sfDir).filter($"event_type" === "purchase")
      // events.ts is TIMESTAMP_NTZ; the session is pinned UTC, so the
      // LTZ cast is epoch-identical and unix_micros matches epoch_us
      .select($"user_id", unix_micros($"ts".cast(TimestampType)).as("us"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
    val per = ev.crossJoin(broadcast(mid))
      .groupBy($"user_id")
      .agg(sum(when($"us" < $"mid_us", 1L).otherwise(0L)).as("x"),
        sum(when($"us" >= $"mid_us", 1L).otherwise(0L)).as("y"))
      .select(pmod($"user_id", lit(2)).cast(IntegerType).as("arm"),
        $"x", $"y")
    val g = per.groupBy($"arm")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"x").as("sxx"), sum($"x" * $"y").as("sxy"),
        sum($"y" * $"y").as("syy"))
    val tot = g.agg(sum($"n").as("tn"), sum($"sx").as("tsx"),
      sum($"sy").as("tsy"), sum($"sxx").as("tsxx"), sum($"sxy").as("tsxy"))
    // pooled theta from the GLOBAL pre/post moments (independent of arm)
    val tnD = $"tn".cast(DoubleType)
    val theta = (($"tsxy".cast(DoubleType) -
      $"tsx".cast(DoubleType) * $"tsy".cast(DoubleType) / tnD) /
      ($"tsxx".cast(DoubleType) -
        $"tsx".cast(DoubleType) * $"tsx".cast(DoubleType) / tnD))
    val xbar = $"tsx".cast(DoubleType) / tnD
    val th = tot.select(round(theta, 6).as("th"), round(xbar, 6).as("xb"))
    val nD = $"n".cast(DoubleType)
    val my = $"sy".cast(DoubleType) / nD
    val mx = $"sx".cast(DoubleType) / nD
    val varY = ($"syy".cast(DoubleType) * nD -
      $"sy".cast(DoubleType) * $"sy".cast(DoubleType)) / (nD * nD)
    // var of (Y − θX) from the same partials:
    // var(Y) − 2θcov + θ²var(X), each from exact sums
    val covXY = ($"sxy".cast(DoubleType) * nD -
      $"sx".cast(DoubleType) * $"sy".cast(DoubleType)) / (nD * nD)
    val varX = ($"sxx".cast(DoubleType) * nD -
      $"sx".cast(DoubleType) * $"sx".cast(DoubleType)) / (nD * nD)
    val varAdj = varY - lit(2.0) * $"th" * covXY + $"th" * $"th" * varX
    g.crossJoin(broadcast(th))
      .select($"arm", $"n",
        round(my, 6).as("mean_post"),
        round(my - $"th" * (mx - $"xb"), 6).as("mean_cuped"),
        round(varY, 6).as("var_post"),
        round(varAdj, 6).as("var_cuped"),
        round(varAdj / varY, 6).as("var_ratio"))
      .orderBy($"arm")
  }

  /** Theil-T inequality decomposition over customer revenue by market
    * segment: T = T_within + T_between, the split that says whether
    * inequality lives INSIDE segments or ACROSS them. Per-customer
    * terms freeze at 9 dp as DECIMAL (the analytic_theil_index
    * protocol); the between term needs only the 5 segment means. The
    * identity is pinned in Round13Spec26 against the directly
    * computed global T.
    */
  def analyticTheilDecomposition(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val rev = orders(spark, sfDir)
      .join(customer(spark, sfDir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment".as("segment"), $"o_custkey")
      .agg(sum(money($"o_totalprice")).as("x"))
    val segs = rev.groupBy($"segment".as("s2"))
      .agg(sum($"x").as("tx"), count(lit(1)).as("ns"))
    val tot = segs.agg(sum($"tx").as("gx"), sum($"ns").as("gn"))
    val muG = $"gx".cast(DoubleType) / $"gn".cast(DoubleType)
    val muS = $"tx".cast(DoubleType) / $"ns".cast(DoubleType)
    val within = rev.join(broadcast(segs), $"segment" === $"s2")
      .select($"segment", $"ns",
        round(($"x".cast(DoubleType) / muS) *
          log($"x".cast(DoubleType) / muS), 9)
          .cast(DecimalType(28, 9)).as("term"))
      .groupBy($"segment")
      .agg(max($"ns").as("n_cust"), sum($"term").as("st"))
      .select($"segment", $"n_cust",
        round($"st".cast(DoubleType) / $"n_cust".cast(DoubleType), 6)
          .as("theil_within"))
    val segs2 = segs.select($"s2", $"tx".as("tx2"), $"ns".as("ns2"))
    val muS2 = $"tx2".cast(DoubleType) / $"ns2".cast(DoubleType)
    within.join(broadcast(segs2), $"segment" === $"s2")
      .crossJoin(broadcast(tot))
      .select($"segment", $"n_cust",
        $"theil_within",
        // income share s_k = tx/gx weights the within terms; the
        // between term compares segment mean to the global mean
        round($"tx2".cast(DoubleType) / $"gx".cast(DoubleType), 6)
          .as("income_share"),
        round(($"tx2".cast(DoubleType) / $"gx".cast(DoubleType)) *
          log(muS2 / muG), 6).as("between_term"))
      .orderBy($"segment")
  }
}
