package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-14 widening, part 3: Misra-Gries heavy hitters — the
  * deterministic-guarantee member of the sketch family (HLL and
  * Count-Min are probabilistic; MG's bound holds on every run).
  */
object Round14Ops3 {

  /** Mergeable Misra-Gries summary with k counters over String keys.
    *
    * Invariant maintained by reduce AND merge: for every key,
    * true_count − N/(k+1) ≤ estimate ≤ true_count, and — the property
    * the 2-pass op below builds on — NO key whose true count exceeds
    * N/(k+1) is ever absent from the summary (Misra & Gries 1982;
    * mergeability per Agarwal et al., PODS'12: sum the two maps, then
    * subtract the (k+1)-th largest count from everything and drop the
    * non-positive remainder).
    */
  class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty
    override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
      b.get(x) match {
        case Some(v) => b.updated(x, v + 1)
        case None if b.size < k => b.updated(x, 1L)
        // decrement-all step: one "vote" is cancelled against every
        // counter (and the arriving key's implicit 1)
        case None => b.flatMap { case (kk, v) =>
          if (v > 1) Some(kk -> (v - 1)) else None }
      }
    override def merge(x: Map[String, Long], y: Map[String, Long]): Map[String, Long] = {
      val sum = y.foldLeft(x) { case (acc, (kk, v)) =>
        acc.updated(kk, acc.getOrElse(kk, 0L) + v) }
      if (sum.size <= k) sum
      else {
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (kk, v) =>
          if (v - cut > 0) Some(kk -> (v - cut)) else None }
      }
    }
    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Benjamini-Hochberg FDR control over the C(5,2) = 10 pairwise
    * Welch z-tests between event-type mean values — the
    * multiple-testing correction an experimentation pipeline applies
    * before reading any per-pair "significant". No normal CDF is
    * evaluated (libm erf differs between engines): the BH step-up rule
    * p(i) ≤ α·i/m is applied in z-space against the 10 PRECOMPUTED
    * two-sided critical values Φ⁻¹(1 − α·i/(2m)) at α = 0.05, embedded
    * as shared literals. z comes from exact DECIMAL cent moments (the
    * welch_ttest recipe); ranking the 10 tests is the window-free
    * collect → array_sort → posexplode shape, and the step-up cut
    * (reject ALL ranks ≤ the largest passing rank) is an array fold —
    * the per-pair moments are the only corpus-scale work: one grouped
    * pass. Output: per pair, z, BH rank, critical value, 0/1 reject.
    */
  def analyticFdrBh(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val crit = "array(2.807034D, 2.575829D, 2.432379D, 2.326348D, " +
      "2.241403D, 2.170090D, 2.108358D, 2.053749D, 2.004654D, 1.959964D)"
    val mom = events(spark, sfDir)
      .select($"event_type", (money($"value") * 100).cast(DecimalType(38, 0)).as("c"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"c").as("s"),
        sum(($"c" * $"c").cast(DecimalType(38, 0))).as("ss"))
      .select($"event_type", $"n",
        ($"s".cast(DoubleType) / $"n".cast(DoubleType)).as("m"),
        // unbiased sample variance from exact moments
        (($"n".cast(DoubleType) * $"ss".cast(DoubleType) -
          $"s".cast(DoubleType) * $"s".cast(DoubleType)) /
          ($"n".cast(DoubleType) * ($"n" - 1).cast(DoubleType))).as("v"))
    val pairs = mom.as("a").join(mom.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("ta"), col("b.event_type").as("tb"),
        ((col("a.m") - col("b.m")) /
          sqrt(col("a.v") / col("a.n") + col("b.v") / col("b.n"))).as("z"))
    pairs
      .agg(expr("array_sort(collect_list(struct(-abs(z) AS na, ta, tb, z)))").as("arr"))
      .withColumn("imax", expr(
        s"array_max(transform(arr, (x, i) -> " +
        s"IF(-x.na >= element_at($crit, i + 1), i + 1, 0)))"))
      .select($"imax", posexplode($"arr").as(Seq("i0", "p")))
      .select($"p.ta".as("type_a"), $"p.tb".as("type_b"),
        round($"p.z", 6).as("z"), ($"i0" + 1).as("bh_rank"),
        round(element_at(expr(crit), ($"i0" + 1).cast(IntegerType)), 6).as("crit_z"),
        when($"i0" + 1 <= $"imax", 1L).otherwise(0L).as("reject"))
      .orderBy($"type_a", $"type_b")
  }

  /** Exact heavy hitters via Misra-Gries candidate generation
    * (k = 31): pass 1 folds the corpus into one O(k)-state mergeable
    * summary per partition (no groupBy over the full key domain —
    * at 100 TB the domain may not fit anywhere); pass 2 exact-counts
    * ONLY the ≤ k candidates behind a broadcast semi-filter and keeps
    * keys with count·(k+1) > N (integer-exact threshold, no float
    * boundary). MG's no-false-negative guarantee makes the OUTPUT
    * deterministic and oracle-checkable even though the summary's
    * exact contents depend on merge order: every key above N/(k+1)
    * is always among the candidates, so the verified set is exactly
    * the true heavy hitters on every run — which is what the DuckDB
    * HAVING mirror computes directly. (The eviction path, which a
    * uniform corpus never exercises end-to-end, is pinned separately
    * in Round14Spec on a constructed skewed stream.)
    */
  def aggMisraGriesTopk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = 31
    val brands = lineitem(spark, sfDir)
      .join(part(spark, sfDir), $"l_partkey" === $"p_partkey")
      .select($"p_brand")
    val cands = brands.select($"p_brand".as[String])
      .select(new MisraGries(k).toColumn.name("cands"))
      .select(explode($"cands").as("p_brand"))
    val tot = brands.agg(count(lit(1)).as("n_total"))
    brands.join(broadcast(cands), "p_brand")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tot))
      .filter($"n" * (k + 1) > $"n_total")
      .select($"p_brand", $"n", $"n_total")
      .orderBy($"p_brand")
  }
}
