package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scale-up generator for the 10x scale probe
  * (round-13 verdict task 1: "SCALE.md is analysis, not evidence").
  *
  * Reads the driver's read-only sf0.1 testdata and writes an N-times
  * larger dataset with the SAME schemas, key-contiguity, value
  * distributions and referential integrity to a /tmp directory.
  * Nothing here is random: every perturbation is an xxhash64 of the
  * (key, copy) pair, so two runs produce byte-identical tables.
  *
  * Scaling rules per table:
  *   - region/nation: fixed dimensions (TPC-H semantics) — copied.
  *   - customer/supplier/part/orders/lineitem/events: N copies with
  *     keys offset by copy*cardinality; formatted names regenerated
  *     from the new key so name<->key stays bijective.
  *   - documents: copy 0 verbatim; copy k>0 recombines the first half
  *     of doc i with the second half of doc (i + 911*k mod n), so the
  *     corpus grows with genuinely NEW texts (replicating texts
  *     verbatim would give every doc 9 exact clones and blow the
  *     near-dup candidate structure up quadratically — a data
  *     artifact, not an engine property).
  *   - embeddings: copy k>0 adds +/-5% hash noise per component, so
  *     ANN/near-dup geometry stays realistic instead of 10 coincident
  *     points per vector.
  *
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> <copies>
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src    = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out    = args.lift(1).getOrElse("/tmp/graft_sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def fanout(df: DataFrame): DataFrame =
      df.withColumn("copy", explode(sequence(lit(0), lit(copies - 1))))

    def save(df: DataFrame, name: String, parts: Int): Unit = {
      df.repartition(parts)
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"  $name: written")
    }

    val nCust = 15000L; val nSupp = 1000L; val nPart = 20000L
    val nOrd = 150000L; val nEvt = 100000L; val nDoc = 5000L; val nVec = 2000L

    // The key-offset bijectivity (and the documents pmod-donor inner
    // join) silently breaks if the source dir's cardinalities differ
    // from these constants — a wrong nDoc drops/misroutes documents
    // instead of failing. Assert them against the actual tables BEFORE
    // the first save(), so a mismatch cannot leave a partially written
    // output directory behind (round-14/15 ADVICE).
    Seq("customer" -> nCust, "supplier" -> nSupp, "part" -> nPart,
      "orders" -> nOrd, "events" -> nEvt, "documents" -> nDoc,
      "embeddings" -> nVec).foreach { case (t, n) =>
      val actual = Tables(spark, src, t).count()
      require(actual == n, s"ScaleGen cardinality mismatch: $t has " +
        s"$actual rows in $src but the generator assumes $n - key " +
        "offsets would collide or misroute; fix the constants first")
    }
    // The events fan-out offsets user_id by copy*1500; a source dir
    // whose user-id domain exceeds 1500 would silently collide user
    // ids across copies (round-15 ADVICE).
    val maxUid = Tables.events(spark, src)
      .agg(max($"user_id")).head.getLong(0)
    require(maxUid <= 1500L, s"ScaleGen user-id domain mismatch: " +
      s"max(user_id)=$maxUid in $src exceeds the 1500 offset stride - " +
      "copies would collide; raise the stride first")

    // fixed dimensions
    save(Tables.region(spark, src), "region", 1)
    save(Tables.nation(spark, src), "nation", 1)

    save(fanout(Tables.customer(spark, src)).select(
      ($"c_custkey" + $"copy" * nCust).as("c_custkey"),
      format_string("Customer#%09d", $"c_custkey" + $"copy" * nCust).as("c_name"),
      $"c_nationkey",
      // +/- up to $5 hash cents so balances aren't 10x duplicated
      ($"c_acctbal" + (pmod(xxhash64($"c_custkey", $"copy"), lit(1001)) - 500) / 100.0).as("c_acctbal"),
      $"c_mktsegment"), "customer", 2)

    save(fanout(Tables.supplier(spark, src)).select(
      ($"s_suppkey" + $"copy" * nSupp).as("s_suppkey"),
      format_string("Supplier#%09d", $"s_suppkey" + $"copy" * nSupp).as("s_name"),
      $"s_nationkey",
      ($"s_acctbal" + (pmod(xxhash64($"s_suppkey", $"copy"), lit(1001)) - 500) / 100.0).as("s_acctbal")),
      "supplier", 1)

    save(fanout(Tables.part(spark, src)).select(
      ($"p_partkey" + $"copy" * nPart).as("p_partkey"),
      $"p_name", $"p_brand", $"p_type", $"p_size", $"p_retailprice"),
      "part", 2)

    save(fanout(Tables.orders(spark, src)).select(
      ($"o_orderkey" + $"copy" * nOrd).as("o_orderkey"),
      ($"o_custkey" + $"copy" * nCust).as("o_custkey"),
      $"o_orderstatus",
      ($"o_totalprice" + (pmod(xxhash64($"o_orderkey", $"copy"), lit(2001)) - 1000) / 100.0).as("o_totalprice"),
      $"o_orderdate", $"o_orderpriority"), "orders", 4)

    save(fanout(Tables.lineitem(spark, src)).select(
      ($"l_orderkey" + $"copy" * nOrd).as("l_orderkey"),
      ($"l_partkey" + $"copy" * nPart).as("l_partkey"),
      ($"l_suppkey" + $"copy" * nSupp).as("l_suppkey"),
      $"l_linenumber", $"l_quantity",
      ($"l_extendedprice" + (pmod(xxhash64($"l_orderkey", $"l_linenumber", $"copy"), lit(501)) - 250) / 100.0).as("l_extendedprice"),
      $"l_discount", $"l_tax", $"l_returnflag", $"l_linestatus", $"l_shipdate"),
      "lineitem", 8)

    // events: same 30-day window (time range does not scale; event
    // density per day does), user population scales with copies
    save(fanout(Tables.events(spark, src)).select(
      ($"event_id" + $"copy" * nEvt).as("event_id"),
      // jitter ts within +/-500ms per copy so per-microsecond order
      // stats don't see 10 exactly coincident streams
      when($"copy" === 0, $"ts").otherwise(expr(
        "timestampadd(MILLISECOND, pmod(xxhash64(event_id, copy), 1001) - 500, ts)")).as("ts"),
      ($"user_id" + $"copy" * 1500L).as("user_id"),
      $"event_type", $"value", $"props"), "events", 4)

    // documents: recombine halves of two docs for copies > 0
    val docs = Tables.documents(spark, src)
    val donor = docs.select($"doc_id".as("d_id"), $"text".as("d_text"))
    val docScaled = fanout(docs)
      .withColumn("d_id", pmod($"doc_id" + $"copy" * 911L, lit(nDoc)))
      .join(donor, "d_id")
      .select(
        ($"doc_id" + $"copy" * nDoc).as("doc_id"),
        when($"copy" === 0, $"text").otherwise(concat(
          substring($"text", 1, 10000).substr(lit(1), (length($"text") / 2).cast("int")),
          $"d_text".substr((length($"d_text") / 2).cast("int"), lit(100000)))).as("text"),
        $"lang", $"source")
      .withColumn("n_chars", length($"text").cast("long"))
    save(docScaled, "documents", 2)

    // embeddings: +/-5% per-component hash noise for copies > 0
    val emb = Tables.embeddings(spark, src)
    save(fanout(emb).select(
      ($"vec_id" + $"copy" * nVec).as("vec_id"),
      when($"copy" === 0, $"embedding").otherwise(
        zip_with($"embedding",
          transform(sequence(lit(0), lit(63)),
            i => ((pmod(xxhash64($"vec_id", $"copy", i), lit(2001)) - 1000) / 20000.0).cast("float")),
          (e, n) => (e + n).cast("float"))).as("embedding"),
      $"label"), "embeddings", 1)

    println(s"ScaleGen done: $out (x$copies)")
    spark.stop()
  }
}
