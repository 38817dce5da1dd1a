package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 2: statistical inference (Welch t,
  * Mann-Whitney U, chi-square, A/B lift), ML data-prep (exact
  * distributed quantile binning, cross-validation folds), fuzzy
  * string joining, and n-gram novelty scoring. Every op is
  * oracle-checked; double math happens only as the LAST step over
  * exact integer/decimal partials so both engines evaluate the same
  * IEEE expression on identical inputs.
  */
object Round13Ops2 {

  /** Welch's unequal-variance t-test between two order-priority
    * populations on the order total. The distributed work is ONE hash
    * aggregate producing exact decimal partials (n, Σx, Σx²) per
    * group — the same shape at any scale; the t statistic and
    * Welch-Satterthwaite df are a 2-row driver-free scalar epilogue.
    * Sample variance from partials: (Σx² − (Σx)²/n) / (n−1).
    */
  def analyticWelchTtest(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val g = orders(spark, sfDir)
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .withColumn("x", money($"o_totalprice"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"), sum($"x" * $"x").as("ss"))
    val a = g.filter($"o_orderpriority" === "1-URGENT")
      .select($"n".as("n1"), $"s".as("s1"), $"ss".as("ss1"))
    val b = g.filter($"o_orderpriority" === "5-LOW")
      .select($"n".as("n2"), $"s".as("s2"), $"ss".as("ss2"))
    val m1 = $"s1".cast(DoubleType) / $"n1"
    val m2 = $"s2".cast(DoubleType) / $"n2"
    val v1 = ($"ss1".cast(DoubleType) -
      $"s1".cast(DoubleType) * $"s1".cast(DoubleType) / $"n1") / ($"n1" - 1)
    val v2 = ($"ss2".cast(DoubleType) -
      $"s2".cast(DoubleType) * $"s2".cast(DoubleType) / $"n2") / ($"n2" - 1)
    val se2 = v1 / $"n1" + v2 / $"n2"
    val tStat = (m1 - m2) / sqrt(se2)
    val df = se2 * se2 /
      ((v1 / $"n1") * (v1 / $"n1") / ($"n1" - 1) +
       (v2 / $"n2") * (v2 / $"n2") / ($"n2" - 1))
    a.crossJoin(b).select(
      $"n1".as("n_urgent"), $"n2".as("n_low"),
      round(m1, 6).as("mean_urgent"), round(m2, 6).as("mean_low"),
      round(tStat, 6).as("t_stat"), round(df, 4).as("welch_df"))
  }

  /** Mann-Whitney U (rank-sum) between the same two priority groups,
    * kept EXACT by integer math: 2U_A = Σ_v n_A(v)·(2·cumB<(v) + n_B(v))
    * over the distinct-value table, so no tie-averaged fractional
    * ranks ever materialize. The corpus pass is one hash aggregate to
    * per-value counts; the cumulative is a single O(k) `aggregate`
    * fold over the SORTED distinct-value array (the repo's
    * collect_list→array_sort shape — PlanSpec bans unpartitioned
    * Windows board-wide, and the fold's input is bounded by value
    * cardinality, not row count). U_A + U_B = 2·n_A·n_B asserted in
    * spec.
    */
  def analyticMannwhitneyU(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = orders(spark, sfDir)
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select($"o_orderpriority".as("p"),
        (money($"o_totalprice") * 100).cast(LongType).as("c"))
    t.groupBy($"c").agg(
        sum(when($"p" === "1-URGENT", 1L).otherwise(0L)).as("na"),
        sum(when($"p" === "5-LOW", 1L).otherwise(0L)).as("nb"))
      .agg(array_sort(collect_list(struct($"c", $"na", $"nb"))).as("a"))
      .select(expr("""
        aggregate(a,
          named_struct('cuma', CAST(0 AS BIGINT), 'cumb', CAST(0 AS BIGINT),
                       'u2a', CAST(0 AS BIGINT), 'u2b', CAST(0 AS BIGINT)),
          (acc, x) -> named_struct(
            'cuma', acc.cuma + x.na,
            'cumb', acc.cumb + x.nb,
            'u2a', acc.u2a + x.na * (2 * acc.cumb + x.nb),
            'u2b', acc.u2b + x.nb * (2 * acc.cuma + x.na)))""").as("st"))
      .select($"st.cuma".as("n_a"), $"st.cumb".as("n_b"),
        $"st.u2a".as("u2_a"), $"st.u2b".as("u2_b"))
  }

  /** Chi-square feature-association table: market segment × nation
    * contingency with per-cell expected counts and chi² contributions
    * — the feature-selection screen run before training a categorical
    * model. Observed/marginal counts are exact integers from one hash
    * aggregate; expected and contribution are per-cell double math
    * (no cross-cell double summation, so no float-order hazard —
    * consumers sum the rounded contributions if they want the global
    * statistic). Marginals join back as tiny broadcast tables.
    */
  def mlChiSquareSelect(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cells = customer(spark, sfDir)
      .groupBy($"c_mktsegment".as("segment"),
        $"c_nationkey".cast(IntegerType).as("nation"))
      .agg(count(lit(1)).as("obs"))
    val rowT = cells.groupBy($"segment").agg(sum($"obs").as("row_n"))
    val colT = cells.groupBy($"nation").agg(sum($"obs").as("col_n"))
    val tot = cells.agg(sum($"obs").as("n_total"))
    val e = ($"row_n" * $"col_n").cast(DoubleType) / $"n_total"
    cells
      .join(broadcast(rowT), Seq("segment"))
      .join(broadcast(colT), Seq("nation"))
      .crossJoin(broadcast(tot))
      .select($"segment", $"nation", $"obs",
        round(e, 6).as("expected"),
        round(($"obs" - e) * ($"obs" - e) / e, 6).as("chi2_contrib"))
      .orderBy($"segment", $"nation")
  }

  /** Exact equal-frequency decile binning WITHOUT a global sort: the
    * serial formulation (NTILE(10) over a total order) is a
    * single-task window at any scale, so this op re-derives the exact
    * same bins from the per-VALUE count table — row-index ranges per
    * value from one O(k) `aggregate` fold over the sorted
    * distinct-value array (50 values here; bounded by value
    * cardinality — the collect_list→array_sort shape PlanSpec
    * prescribes instead of an unpartitioned Window), ntile's boundary
    * formula (first N mod k tiles take one extra row) evaluated per
    * bin, and per-bin counts/min/max from interval overlap. The
    * oracle runs the serial NTILE formulation — result identity is
    * the proof the rewrite is exact.
    */
  def mlQuantileBins(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 10
    val vals = lineitem(spark, sfDir)
      .groupBy($"l_quantity".cast(IntegerType).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = vals
      .agg(array_sort(collect_list(struct($"v", $"cnt"))).as("a"))
      .select(explode(expr("""
        aggregate(a,
          named_struct('acc', CAST(0 AS BIGINT),
            'out', CAST(array() AS ARRAY<STRUCT<v: INT, cnt: BIGINT,
                                                lo: BIGINT, hi: BIGINT>>)),
          (s, x) -> named_struct(
            'acc', s.acc + x.cnt,
            'out', concat(s.out, array(named_struct(
              'v', x.v, 'cnt', x.cnt, 'lo', s.acc, 'hi', s.acc + x.cnt)))),
          s -> s.out)""")).as("r"))
      .select($"r.v".as("v"), $"r.cnt".as("cnt"), $"r.lo".as("lo"), $"r.hi".as("hi"))
    val tot = vals.agg(sum($"cnt").as("n")).select($"n")
    val bins = spark.range(1, k + 1).toDF("bin")
      .crossJoin(broadcast(tot))
      .withColumn("base", expr(s"n div $k"))
      .withColumn("rem", $"n" % k)
      .withColumn("start_i",
        ($"bin" - 1) * $"base" + least($"bin" - 1, $"rem"))
      .withColumn("end_i",
        $"start_i" + $"base" + when($"bin" <= $"rem", 1L).otherwise(0L))
    cum.join(broadcast(bins), $"lo" < $"end_i" && $"hi" > $"start_i")
      .groupBy($"bin")
      .agg(
        sum(least($"hi", $"end_i") - greatest($"lo", $"start_i")).as("n_rows"),
        min($"v").as("min_q"), max($"v").as("max_q"))
      .orderBy($"bin")
  }

  /** Deterministic 5-fold cross-validation scaffolding with a
    * mean-predictor baseline: folds are pmod(o_orderkey, 5), the
    * train-fold mean comes from GLOBAL-minus-FOLD exact decimal
    * partials (one aggregate pass total — no per-fold rescan, the
    * trick that matters when the table is 100 TB), and the test RMSE
    * expands from the same partials:
    * mse = Σx²/n − 2m·Σx/n + m². Double math only in the epilogue.
    */
  def mlCrossvalFolds(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val per = orders(spark, sfDir)
      .withColumn("x", money($"o_totalprice"))
      .groupBy(pmod($"o_orderkey", lit(5)).cast(IntegerType).as("fold"))
      .agg(count(lit(1)).as("n"), sum($"x").as("s"), sum($"x" * $"x").as("ss"))
    val tot = per.agg(sum($"n").as("tn"), sum($"s").as("ts"), sum($"ss").as("tss"))
    val m = ($"ts" - $"s").cast(DoubleType) / ($"tn" - $"n")
    val mse = $"ss".cast(DoubleType) / $"n" -
      lit(2.0) * m * ($"s".cast(DoubleType) / $"n") + m * m
    per.crossJoin(broadcast(tot))
      .select($"fold", $"n".as("n_test"),
        round(m, 6).as("mean_train"), round(sqrt(mse), 6).as("rmse"))
      .orderBy($"fold")
  }

  /** Two-arm A/B readout over the event stream: arm = pmod(user_id,2),
    * conversion = the user is a power purchaser (>13 purchase events —
    * the corpus's per-user median; every user fires at least one of
    * every type, so an any-purchase definition degenerates to rate 1.0
    * in both arms and a 0/0 z-score). One aggregate to per-user
    * conversion flags (the only corpus-sized pass), one to per-arm
    * integer counts; rate/lift/pooled z-score are a 2-row scalar
    * epilogue over exact integers.
    */
  def analyticAbLift(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val u = events(spark, sfDir)
      .groupBy($"user_id")
      .agg(when(
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)) > 13, 1L)
        .otherwise(0L).as("conv"))
    val g = u.groupBy(pmod($"user_id", lit(2)).cast(IntegerType).as("arm"))
      .agg(count(lit(1)).as("users"), sum($"conv").as("convs"))
    val a = g.filter($"arm" === 0)
      .select($"users".as("users_a"), $"convs".as("conv_a"))
    val b = g.filter($"arm" === 1)
      .select($"users".as("users_b"), $"convs".as("conv_b"))
    val ra = $"conv_a".cast(DoubleType) / $"users_a"
    val rb = $"conv_b".cast(DoubleType) / $"users_b"
    val pp = ($"conv_a" + $"conv_b").cast(DoubleType) / ($"users_a" + $"users_b")
    val z = (rb - ra) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / $"users_a" + lit(1.0) / $"users_b"))
    a.crossJoin(b).select(
      $"users_a", $"conv_a", $"users_b", $"conv_b",
      round(ra, 6).as("rate_a"), round(rb, 6).as("rate_b"),
      round(rb / ra - 1, 6).as("lift"), round(z, 6).as("z_score"))
  }

  /** Fuzzy vocabulary self-join: edit-distance ≤ 2 pairs over the
    * distinct part-name lexicon, with the length-difference prune
    * (|len a − len b| ≤ 1 is implied by distance ≤ 2 only partially —
    * it's a deliberate tighter blocking key) evaluated BEFORE the
    * quadratic levenshtein kernel. The join is vocabulary² — the
    * standard fuzzy-match shape: at 100 TB the corpus pass is the
    * distinct() (shuffle on the word), and the pair join runs over
    * the vocabulary table, which grows sublinearly with the corpus;
    * production systems add prefix/length bucketing as the equi-key,
    * which this op's length prune stands in for.
    */
  def joinFuzzyLevenshtein(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val vocab = part(spark, sfDir)
      .select(explode(split($"p_name", " ")).as("w")).distinct()
    vocab.as("x").join(vocab.as("y"),
        col("x.w") < col("y.w") &&
        abs(length(col("x.w")) - length(col("y.w"))) <= 1 &&
        levenshtein(col("x.w"), col("y.w")) <= 2)
      .select(col("x.w").as("w1"), col("y.w").as("w2"),
        levenshtein(col("x.w"), col("y.w")).as("dist"))
      .orderBy($"w1", $"w2")
  }
}
