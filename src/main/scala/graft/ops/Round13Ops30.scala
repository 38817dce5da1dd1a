package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 widening, part 30: string shaping functions and xor
  * parity aggregation.
  */
object Round13Ops30 {

  /** The string-shaping surface in one pass: lpad fixed-width keys,
    * translate digit classes, overlay a region marker, repeat a
    * separator — the formatting primitives export feeds live on.
    * Top-30 by key so the oracle is a direct row-for-row mirror.
    */
  def fnStringPaddingTranslate(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .filter($"o_orderkey" <= 30)
      .select($"o_orderkey",
        lpad($"o_orderkey".cast(StringType), 10, "0").as("padded_key"),
        translate($"o_orderpriority", "12345", "#####").as("masked_priority"),
        // first-char mask as concat+substr (DuckDB has no overlay)
        concat(lit("*"), substring($"o_orderstatus", 2, 100))
          .as("masked_status"),
        concat($"o_orderstatus", lit("|"),
          repeat(lit("-"), 5)).as("ruled"))
      .orderBy($"o_orderkey")
  }

  /** XOR parity aggregation: bit_xor folds every order's cents per
    * priority — the order-independent integrity fingerprint that
    * detects single-row corruption without sorting anything (xor is
    * commutative/associative, so map-side partials combine freely —
    * the cheapest checksum that scales). Count parity rides along.
    */
  def aggBitXorParity(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    orders(spark, sfDir)
      .select($"o_orderpriority".as("priority"),
        (money($"o_totalprice") * 100).cast(LongType).as("cents"))
      .groupBy($"priority")
      .agg(count(lit(1)).as("n"),
        bit_xor($"cents").as("xor_cents"),
        (count(lit(1)) % 2 === 0).as("even_count"),
        bit_and($"cents").as("and_cents"),
        bit_or($"cents").as("or_cents"))
      .orderBy($"priority")
  }
}
