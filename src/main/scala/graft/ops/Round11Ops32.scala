package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-11 widening, part 32: LDA topics, currency parsing,
  * token-set hash dedup, cosine histogram, accumulating snapshot,
  * bigram conditional entropy.
  */
object Round11Ops32 {

  /** LDA topic modeling (MLlib online variational Bayes, fixed seed)
    * over the document term-count matrix — the corpus-exploration
    * staple. Emits each topic's top-5 term indices and weights. No
    * oracle: the fit is engine-specific; the spec pins determinism,
    * topic count, and weight normalization.
    *
    * Round 19: optimizer em → online. EM rides GraphX and
    * materializes per-(doc, term) edge state with k-dim attributes —
    * at corpus scale that is a second copy of the corpus per
    * iteration, plus the netlib surface the GMM rewrite engineered
    * out. Online VB (Hoffman et al. 2010, the MLlib default) keeps
    * only the k×V topic matrix as driver/executor state and streams
    * seeded minibatches — the 100 TB-shaped optimizer. Same seeded
    * determinism (Round11Spec29 pins two identical fits), same
    * output shape.
    */
  def mlLdaTopics(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.ml.feature.CountVectorizer
    import org.apache.spark.ml.clustering.LDA
    val docs = documents(spark, sfDir)
      .select($"doc_id", split($"text", " ").as("toks"))
    val cv = new CountVectorizer().setInputCol("toks").setOutputCol("tf")
      .setVocabSize(64).fit(docs)
    val tf = cv.transform(docs)
    val lda = new LDA().setK(4).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("tf").setOptimizer("online")
    val model = lda.fit(tf)
    val topics = model.describeTopics(5)
    topics.select($"topic",
        posexplode(arrays_zip($"termIndices", $"termWeights")))
      .select($"topic", ($"pos" + 1).as("rank"),
        $"col.termIndices".as("term_idx"),
        round($"col.termWeights", 6).as("weight"))
      .orderBy($"topic", $"rank")
  }

  /** Locale-formatted number parsing: amounts arrive as grouped
    * strings ("1,234,567.89") and to_number recovers the exact
    * DECIMAL under a format mask — the feed-normalization twin of
    * the date rescue. The aggregate must land back on the source
    * cents exactly.
    */
  def fnToNumber(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderkey", $"o_orderpriority",
        format_number(money($"o_totalprice"), 2).as("txt"))
      .select($"o_orderpriority",
        expr("to_number(txt, '999,999,999.99')").as("amt"))
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(($"amt" * 100).cast(LongType)).as("sum_cents"))
      .orderBy($"o_orderpriority")
  }

  /** Bag-of-words dedup: the canonical token-SET hash (distinct
    * tokens, sorted, joined) groups documents that are permutations
    * or repetition-variants of the same vocabulary — the reordering
    * dup class that raw-text hashing misses entirely. Same
    * one-shuffle census shape as dedup_exact_hash, one
    * canonicalization earlier.
    */
  def dedupTokenSetHash(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    documents(spark, sfDir)
      .select($"doc_id",
        md5(concat_ws(" ",
          array_sort(array_distinct(split($"text", " "))))).as("h"))
      .groupBy($"h")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("keep_id"))
      .filter($"n_docs" > 1)
      .orderBy($"h")
  }

  /** Pairwise-cosine histogram — the corpus-geometry audit before
    * choosing any similarity threshold: grid-join pairs (the
    * no-broadcast gridPairs shape) bucketed into 0.1-wide cosine
    * bands by integer floor math on the 6-dp-rounded cosine.
    *
    * Round 14: the histogram runs on a COUNT-CAPPED uniform id sample
    * — P = ceil(n/1500), keep ids whose md5-coin ≡ 0 (mod P) — so the
    * pair volume is ~1500²/2 ≈ 1.1M at ANY corpus size. The 10×
    * scale probe measured the previous all-pairs form at 78× for 10×
    * data (quadratic by construction); a fixed-size uniform sample is
    * the statistically right estimator for a distribution audit, and
    * the cap makes the op linear (one count + one filtered scan)
    * while P=1 at small SFs keeps it exhaustive there. The md5 coin
    * is engine-portable, so the oracle draws the identical sample.
    */
  def simCosineHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = LlmOps.embeddingsWithNorm(spark, sfDir)
    val cap = t.agg(ceil(count(lit(1)) / 1500.0).cast(LongType).as("p"))
    val s = t.crossJoin(broadcast(cap))
      .filter(pmod(expr(
        "CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 6), 16, 10) AS BIGINT)"),
        $"p") === 0)
      .select($"vec_id", $"embedding", $"nrm")
    LlmOps.gridPairs(s, "vec_id", 8)
      .withColumn("c6",
        round(LlmOps.dot($"embedding_a", $"embedding_b") /
          ($"nrm_a" * $"nrm_b"), 6))
      .withColumn("band", floor($"c6" * 10).cast(IntegerType))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy($"band")
  }

  /** Accumulating-snapshot fact: one row per order carrying its
    * lifecycle milestones — first/last shipment, line count, exact
    * gross — the warehouse table that replaces N fact scans with one.
    * A single orderkey-shuffled aggregate; month-grain rollup keeps
    * the oracle-checked output bounded while the per-order grain is
    * the real artifact.
    */
  def joinAccumulatingSnapshot(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val snap = orders(spark, sfDir)
      .join(lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderkey", $"o_orderdate")
      .agg(min($"l_shipdate").as("first_ship"),
        max($"l_shipdate").as("last_ship"),
        count(lit(1)).as("n_lines"),
        sum((money($"l_extendedprice") * 100).cast(LongType)).as("gross_cents"))
    snap
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("om"))
      .agg(count(lit(1)).as("n_orders"),
        sum($"n_lines").as("n_lines"),
        sum($"gross_cents").as("gross_cents"),
        sum(datediff($"last_ship".cast(DateType),
          $"first_ship".cast(DateType)).cast(LongType)).as("sum_span_days"))
      .orderBy($"om")
  }

  /** Conditional bigram entropy H(next | prev) — the entropy-RATE
    * lens on corpus repetitiveness (low rate = templated text even
    * when the unigram mix looks rich). Exact bigram/prefix counts;
    * each cell does one log and freezes at 9 dp (freeze-then-sum),
    * then ONE division by the bigram total.
    */
  def textBigramCondEntropy(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bi = documents(spark, sfDir)
      .select($"lang", split($"text", " ").as("t"))
      .filter(size($"t") >= 2)
      .select($"lang", explode(expr(
        "transform(sequence(1, size(t) - 1), " +
          "i -> struct(element_at(t, i) AS w1, element_at(t, i + 1) AS w2))"))
        .as("b"))
      .select($"lang", $"b.w1", $"b.w2")
    val cells = bi.groupBy($"lang", $"w1", $"w2").agg(count(lit(1)).as("n12"))
    val prefix = cells.groupBy($"lang".as("l2"), $"w1".as("p1"))
      .agg(sum($"n12").as("n1"))
    val tot = cells.groupBy($"lang".as("l3")).agg(sum($"n12").as("nt"))
    cells
      .join(prefix, $"lang" === $"l2" && $"w1" === $"p1")
      .join(tot, $"lang" === $"l3")
      .select($"lang", $"nt",
        round(($"n12".cast(DoubleType)) *
          log($"n1".cast(DoubleType) / $"n12".cast(DoubleType)), 9)
          .cast(DecimalType(28, 9)).as("term"))
      .groupBy($"lang")
      .agg(max($"nt").as("n_bigrams"), sum($"term").as("st"))
      .select($"lang", $"n_bigrams",
        round($"st".cast(DoubleType) / $"n_bigrams".cast(DoubleType), 6)
          .as("cond_entropy"))
      .orderBy($"lang")
  }
}
