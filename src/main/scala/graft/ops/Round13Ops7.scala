package graft.ops

import graft.Tables._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 7: statistical modeling with exact oracles
  * — Kneser-Ney smoothed bigram LM, closed-form ridge regression from
  * sufficient statistics, and a fully SQL-expressible 2-round Lloyd
  * k-means whose centroids freeze at 6 dp between rounds so both
  * engines chain identical assignments (the oracle-checked complement
  * to the MLlib ml_kmeans_cluster, which can only be
  * scalatest-verified).
  */
object Round13Ops7 {

  /** Kneser-Ney smoothed bigram probabilities (D=0.75) for the 25 most
    * frequent bigrams — the n-gram LM smoothing that actually ships.
    * All four count families (bigram count, context count, distinct
    * continuations, distinct histories) are exact integers from ONE
    * bigram-type table (itself one explode→aggregate over the corpus,
    * vocabulary²-bounded, shuffled on the bigram key);
    * P_KN = max(c₁₂−D,0)/c₁ + D·N₁₊(w₁·)/c₁ · N₁₊(·w₂)/T is the
    * per-row double epilogue.
    */
  def textKneserNeyBigram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val toks = documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("t"))
    val bi = toks.filter(size($"t") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 1), i -> struct(" +
          "element_at(t, i) AS w1, element_at(t, i + 1) AS w2))")).as("g"))
      .groupBy($"g.w1".as("w1"), $"g.w2".as("w2"))
      .agg(count(lit(1)).as("c12"))
    val ctx = bi.groupBy($"w1").agg(sum($"c12").as("c1"),
      count(lit(1)).as("n1f"))
    val hist = bi.groupBy($"w2").agg(count(lit(1)).as("n1b"))
    val types = bi.agg(count(lit(1)).as("t_types"))
    val pkn = greatest($"c12" - lit(0.75), lit(0.0)) / $"c1" +
      lit(0.75) * ($"n1f".cast(DoubleType) / $"c1") *
        ($"n1b".cast(DoubleType) / $"t_types")
    bi.join(ctx, Seq("w1"))
      .join(hist, Seq("w2"))
      .crossJoin(broadcast(types))
      .orderBy($"c12".desc, $"w1", $"w2")
      .limit(25)
      .select($"w1", $"w2", $"c12", $"c1", round(pkn, 6).as("p_kn"))
      .orderBy($"c12".desc, $"w1", $"w2")
  }

  /** Two-feature ridge regression (λ=1000) of per-order revenue on
    * line count and total quantity, solved in CLOSED FORM from nine
    * exact integer sufficient statistics — the 100 TB shape: one
    * keyed aggregate to per-order features, one global aggregate to
    * the normal-equation partials, zero iterative passes. w₁/w₂ come
    * from the centered 2×2 solve and freeze at 6 dp BEFORE the
    * intercept consumes them, so the chained epilogue is identical in
    * both engines.
    */
  def mlRidgeClosedForm(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val per = lineitem(spark, sfDir)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("x1"),
        sum($"l_quantity".cast(IntegerType)).as("x2"),
        sum((money($"l_extendedprice") * 100).cast(LongType)).as("y"))
    val p = per.agg(count(lit(1)).as("n"),
      sum($"x1").as("sx1"), sum($"x2").as("sx2"), sum($"y").as("sy"),
      sum($"x1" * $"x1").as("s11"), sum($"x1" * $"x2").as("s12"),
      sum($"x2" * $"x2").as("s22"),
      sum($"x1" * $"y").as("s1y"), sum($"x2" * $"y").as("s2y"))
    val nD = $"n".cast(DoubleType)
    val lam = lit(1000.0)
    val a = $"s11".cast(DoubleType) -
      $"sx1".cast(DoubleType) * $"sx1".cast(DoubleType) / nD + lam
    val b = $"s12".cast(DoubleType) -
      $"sx1".cast(DoubleType) * $"sx2".cast(DoubleType) / nD
    val c = $"s22".cast(DoubleType) -
      $"sx2".cast(DoubleType) * $"sx2".cast(DoubleType) / nD + lam
    val d = $"s1y".cast(DoubleType) -
      $"sx1".cast(DoubleType) * $"sy".cast(DoubleType) / nD
    val e = $"s2y".cast(DoubleType) -
      $"sx2".cast(DoubleType) * $"sy".cast(DoubleType) / nD
    val det = a * c - b * b
    p.withColumn("w1", round((c * d - b * e) / det, 6))
      .withColumn("w2", round((a * e - b * d) / det, 6))
      .withColumn("b0", round(($"sy".cast(DoubleType) -
        $"w1" * $"sx1" - $"w2" * $"sx2") / nD, 4))
      .select($"n", $"w1", $"w2", $"b0".as("intercept"),
        lit(1000.0).as("lambda"))
  }

  /** Two fixed Lloyd rounds of k-means (k=3) on the (quantity,
    * price-cents) plane with pinned integer seeds — oracle-checked
    * end to end, unlike the MLlib variant. Each assignment is a
    * broadcast of the 3-row centroid table against the point set
    * (argmin of an IDENTICAL double expression over frozen-decimal
    * centroids, ties to the smallest centroid id), each update one
    * hash aggregate to exact integer sums with the new centroid
    * frozen at 6 dp — so round 2 consumes bit-identical centroids in
    * both engines. Per-point squared distances freeze at 4 dp before
    * the inertia sum. This is the at-scale shape: iterations are
    * passes, never driver loops.
    */
  def mlKmeansSqlExact(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // point identity is the FULL tuple: the synthetic corpus reuses
    // (orderkey, linenumber) pairs, but (okey, lnum, x, y) is unique
    // at every SF (asserted in Round13Spec7 via the partition count)
    // Round 20: a parallelism guard (repartition the single-split scan
    // to 32) was measured here and REVERTED — the per-row work (three
    // squared distances + a CASE) is too cheap: shuffling the 600 k-row
    // point set (read twice, once per assignment pass) cost more than
    // the serialized map it parallelized (warm 1.25 s → 1.64 s).
    val pts = lineitem(spark, sfDir)
      .select($"l_orderkey".as("okey"), $"l_linenumber".as("lnum"),
        $"l_quantity".cast(IntegerType).as("x"),
        (money($"l_extendedprice") * 100).cast(LongType).as("y"))
    val seeds = Seq((1, 10.0, 1500000.0), (2, 25.0, 3000000.0),
        (3, 40.0, 6000000.0))
      .toDF("cid", "cx", "cy")
      .select($"cid", $"cx".cast(DecimalType(18, 6)),
        $"cy".cast(DecimalType(18, 6)))
    // assignment as a PURE PROJECTION: the 3 centroids pivot into one
    // broadcast row and the argmin is a least()/CASE chain — no
    // crossJoin fan-out, no per-point re-aggregation (the first cut
    // grouped 1.8M exploded rows per round and was the board's most
    // expensive query at 5.8 s; this shape is one codegen'd map pass).
    // Tie-break ≤ chains pick the smallest cid, matching the oracle's
    // ROW_NUMBER ORDER BY d2, cid.
    def assign(cents: DataFrame): DataFrame = {
      val row = cents.groupBy().agg(
        max(when($"cid" === 1, $"cx")).as("cx1"),
        max(when($"cid" === 1, $"cy")).as("cy1"),
        max(when($"cid" === 2, $"cx")).as("cx2"),
        max(when($"cid" === 2, $"cy")).as("cy2"),
        max(when($"cid" === 3, $"cx")).as("cx3"),
        max(when($"cid" === 3, $"cy")).as("cy3"))
      def dd(cx: Column, cy: Column): Column =
        ($"x" - cx.cast(DoubleType)) * ($"x" - cx.cast(DoubleType)) +
          ($"y" - cy.cast(DoubleType)) * ($"y" - cy.cast(DoubleType))
      pts.crossJoin(broadcast(row))
        .withColumn("d1", dd($"cx1", $"cy1"))
        .withColumn("dm2", dd($"cx2", $"cy2"))
        .withColumn("dm3", dd($"cx3", $"cy3"))
        .select($"okey", $"lnum", $"x", $"y",
          when($"d1" <= $"dm2" && $"d1" <= $"dm3", 1)
            .when($"dm2" <= $"dm3", 2).otherwise(3).as("cid"),
          least($"d1", $"dm2", $"dm3").as("d2"))
    }
    def update(asg: DataFrame): DataFrame = asg
      .groupBy($"cid")
      .agg(sum($"x").as("sx"), sum($"y").as("sy"), count(lit(1)).as("nc"))
      .select($"cid",
        round($"sx".cast(DoubleType) / $"nc", 6)
          .cast(DecimalType(18, 6)).as("cx"),
        round($"sy".cast(DoubleType) / $"nc", 6)
          .cast(DecimalType(18, 6)).as("cy"))
    val c1 = update(assign(seeds))
    val a2 = assign(c1)
    val stats = a2.groupBy($"cid")
      .agg(count(lit(1)).as("n_points"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(round($"d2", 4).cast(DecimalType(28, 4))).as("inertia"))
    stats.select($"cid", $"n_points",
        round($"sx".cast(DoubleType) / $"n_points", 6).as("cx"),
        round($"sy".cast(DoubleType) / $"n_points", 6).as("cy"),
        // the exact decimal sum is ~1e16-1e17: beyond 2^53 the
        // decimal→double cast can differ by 1 ulp between engines, so
        // the output freezes at 1e6 granularity (9 significant digits)
        round($"inertia".cast(DoubleType), -6).as("inertia"))
      .orderBy($"cid")
  }
}
