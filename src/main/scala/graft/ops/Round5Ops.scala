package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-5 widening: keyed MERGE/upsert, an AQE-skew demonstration
  * join, and the approximate (SRP-banded) scale path for
  * embedding-cosine near-dup.
  */
object Round5Ops {

  /** Keyed MERGE/upsert — the update-else-insert half of an
    * incremental ingestion pipeline (pipeline_incremental_dedup covers
    * insert-if-absent). Staged changes are derived deterministically
    * from the target so the oracle can mirror them: keys % 97 == 0 get
    * a price bump + status 'U' (update branch), keys % 101 == 0 spawn
    * a shifted new key with status 'N' (insert branch). The merge
    * itself is the canonical distributed shape: one shuffle FULL OUTER
    * join on the key, per-column coalesce(update, target) — no
    * broadcast, no driver state; at 100 TB this is exactly Delta/
    * Iceberg's MERGE join stage. Money is added in DECIMAL(12,2)
    * (exact adds, no fp rounding drift vs the oracle) and the OUTPUT
    * column is cast to DOUBLE per the SURVEY §2 determinism protocol —
    * raw DECIMAL output columns hash differently across engines in the
    * driver even when every value matches (round-5 lesson).
    */
  def pipelineUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val t = orders(spark, sfDir).select($"o_orderkey".as("key"),
      money($"o_totalprice").as("price"), $"o_orderstatus".as("status"))
    val upd = t.filter(pmod($"key", lit(97)) === 0)
      .select($"key".as("u_key"),
        ($"price" + lit(BigDecimal("100.00"))).cast(D12_2).as("u_price"),
        lit("U").as("u_status"))
    val ins = t.filter(pmod($"key", lit(101)) === 0)
      .select(($"key" + 1000000000L).as("u_key"), $"price".as("u_price"),
        lit("N").as("u_status"))
    t.join(upd.unionAll(ins), $"key" === $"u_key", "full_outer")
      .select(coalesce($"key", $"u_key").as("o_orderkey"),
        coalesce($"u_price", $"price").cast(DoubleType).as("o_totalprice"),
        coalesce($"u_status", $"status").as("o_orderstatus"))
      .orderBy($"o_orderkey")
  }

  /** Skewed fact-dim join shaped for AQE's OptimizeSkewedJoin: ~75% of
    * the (amplified) fact rows hash to hot key 0, the rest spread over
    * 16 keys. The merge hint keeps the tiny dim off the broadcast path
    * so the skew actually lands in a shuffle join — PlanSpec lowers
    * the skew thresholds and asserts the skew split fires; the result
    * itself is conf-independent and oracle-checked. At 100 TB this is
    * the declared answer to identical-document signature skew
    * (SCALE.md): no manual salting needed when AQE can split the hot
    * partition at runtime.
    */
  def skewAqeJoin(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val fact = lineitem(spark, sfDir)
      .select(
        when(pmod($"l_orderkey", lit(4)) < 3, 0L)
          .otherwise(pmod($"l_orderkey", lit(16)) + 1).as("k"),
        money($"l_quantity").as("qty"))
      // x2 amplification: just enough that the hot partition is
      // detectably skewed in bytes at sf0.001 (PlanSpec lowers the AQE
      // thresholds to match). Round 5 used x8, which made this single
      // demo query 14% of the whole bench at sf0.1 — the skew-split
      // demonstration doesn't need the extra bytes.
      .withColumn("rep", explode(array((0 until 2).map(lit): _*)))
      // multi-mapper barrier: AQE can only split a skewed reduce
      // partition at MAP-output boundaries, and a single-file toy scan
      // is one map task — the hot partition would be one indivisible
      // block. At 100 TB scans have thousands of map tasks and this is
      // automatic; here the spread over (k, rep) restores that shape.
      .repartition(
        spark.conf.get("spark.sql.shuffle.partitions", "32").toInt,
        col("k"), col("rep"))
    val dim = spark.range(0, 17)
      .select($"id".as("dk"), concat(lit("g"), $"id").as("grp"))
    fact.join(dim.hint("merge"), $"k" === $"dk")
      .groupBy($"grp")
      .agg(count(lit(1)).as("n"),
        // DOUBLE on output (not raw DECIMAL) per the determinism
        // protocol — the decimal sum is exact, the cast is the last step
        sum($"qty").cast(DoubleType).as("sum_qty"))
      .orderBy($"grp")
  }

  /** Approximate scale path for embedding near-dup: sign-random-
    * projection (SRP / simhash-for-cosine, Charikar STOC'02) banding —
    * L bands of r hyperplane sign bits each; a pair is a candidate iff
    * some band's r bits all agree (P = p^r per band, p = 1 - θ/π),
    * then candidates are verified with the EXACT compiled cosine.
    * Candidate volume is sublinear in pairs on real (clustered)
    * embedding corpora; this corpus's threshold 0.4 sits near SRP's
    * floor (p(0.4) ≈ 0.63, so banding can't reach recall 1 with real
    * pruning — the mathematical reason the EXACT grid plan in
    * dedup_near_embedding stays the oracle-checked operator and this
    * one is recall-asserted in Round5Spec instead). Planes are a
    * fixed-seed Gaussian matrix — a few KB broadcast in the UDF
    * closure, constant in the corpus.
    */
  def dedupNearEmbeddingAnn(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val bands = 8; val rowsPerBand = 3; val dims = 64
    val rng = new scala.util.Random(42L)
    val planes = Array.fill(bands * rowsPerBand, dims)(rng.nextGaussian())
    val bandSigs = udf { (v: Seq[Float]) =>
      Array.tabulate(bands) { band =>
        var sig = 0L
        var i = 0
        while (i < rowsPerBand) {
          val p = planes(band * rowsPerBand + i)
          var dot = 0.0
          var d = 0
          val n = math.min(v.length, dims)
          while (d < n) { dot += p(d) * v(d); d += 1 }
          sig = (sig << 1) | (if (dot > 0) 1L else 0L)
          i += 1
        }
        sig
      }
    }
    val t = LlmOps.embeddingsWithNorm(spark, sfDir)
      .select($"vec_id", $"embedding", $"nrm",
        posexplode(bandSigs($"embedding")))
      .select($"vec_id", $"embedding", $"nrm",
        $"pos".as("band"), $"col".as("sig"))
    // (band, sig) equi-join — shuffle-partitioned candidate
    // generation, nothing corpus-sized broadcast; band multiplicity
    // removed by the final distinct (same shape as dedup_minhash_lsh)
    t.as("x").join(t.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
        col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos",
        LlmOps.dot(col("x.embedding"), col("y.embedding")) /
          (col("x.nrm") * col("y.nrm")))
      .filter($"cos" >= 0.4)
      .select(col("x.vec_id").as("id_a"), col("y.vec_id").as("id_b"),
        round($"cos", 6).as("cosine"))
      .distinct()
      .orderBy($"id_a", $"id_b")
  }
}
