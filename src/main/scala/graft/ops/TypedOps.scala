package graft.ops

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed Dataset surface: a custom `Aggregator` (the type-safe
  * TypedColumn path) computing the quantity-weighted average price
  * with EXACT integer-cent accumulation — commutative/associative, so
  * partition merge order cannot perturb the result (same guarantee as
  * the decimal protocol, expressed in the typed API).
  */
object TypedOps {

  /** buffer = (Σ qty×price [exact, scaled 10⁻⁴], Σ qty [exact cents])
    * as primitive Longs — the values are 2-dp DECIMAL by the data
    * protocol, so every per-row product (≤ 5000 × 10⁷) and any
    * realistic group total fit a Long with ~100× headroom at 100 TB
    * group sizes; Math.addExact/multiplyExact turn a hypothetical wrap
    * into a loud ArithmeticException instead of a silent wrong answer.
    * (The round-9 BigDecimal buffer was allocation-bound: two boxed
    * BigDecimal adds per row dominated the bench at 3× the cost of the
    * whole shuffle.)
    */
  object WeightedAvgPrice
      extends Aggregator[(Double, Double), (Long, Long), Double] {
    // exact 2dp recovery straight to integer cents: the data protocol
    // stores 2dp decimals as nearest-binary doubles, so rint(v*100)
    // is the exact value
    private def cents(v: Double): Long = math.rint(v * 100).toLong
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), in: (Double, Double)): (Long, Long) = {
      val q = cents(in._1); val p = cents(in._2)
      (Math.addExact(b._1, Math.multiplyExact(q, p)), Math.addExact(b._2, q))
    }
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (Math.addExact(x._1, y._1), Math.addExact(x._2, y._2))
    // double(exact sum) / double(exact sum): one correctly-rounded
    // conversion each + one division — bit-identical to the oracle's
    // CAST(sum_decimal AS DOUBLE) division. valueOf(long, scale)
    // rescales exactly; doubleValue is the same correctly-rounded
    // conversion the BigDecimal buffer produced, so the hash protocol
    // sees an unchanged result.
    override def finish(b: (Long, Long)): Double =
      java.math.BigDecimal.valueOf(b._1, 4).doubleValue() /
        java.math.BigDecimal.valueOf(b._2, 2).doubleValue()
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def aggTypedAggregator(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    lineitem(spark, sfDir)
      .select($"l_returnflag".as[String],
        struct($"l_quantity", $"l_extendedprice").as[(Double, Double)])
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(WeightedAvgPrice.toColumn.name("weighted_avg_price"))
      .toDF("l_returnflag", "weighted_avg_price")
      .orderBy($"l_returnflag")
  }

  /** The typed per-group iterator surface (`KeyValueGroupedDataset
    * .flatMapGroups`): 30-minute-gap sessionization written as
    * imperative per-user logic — the API a user reaches for when group
    * semantics don't fit any aggregate. Groups are sorted in memory
    * (events-per-user is bounded ~100); for unbounded groups the scale
    * form is a sort-within-partitions secondary sort or the streaming
    * `session_window` op, which this mirrors (same gap rule, plus a
    * 1-based session index).
    */
  def typedFlatmapSessions(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val gapMinutes = 30L
    graft.Tables.events(spark, sfDir)
      .select($"user_id".as[Long], $"ts".as[java.time.LocalDateTime],
        $"event_id".as[Long])
      .groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, java.time.LocalDateTime, Long)]) =>
        val es = it.toArray.sortWith { (a, b) =>
          if (a._2 != b._2) a._2.isBefore(b._2) else a._3 < b._3
        }
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Int, java.time.LocalDateTime, java.time.LocalDateTime, Long)]
        var idx = 0
        var start: java.time.LocalDateTime = null
        var last: java.time.LocalDateTime = null
        var n = 0L
        def close(): Unit =
          if (n > 0) out += ((uid, idx, start, last, n))
        es.foreach { case (_, ts, _) =>
          val newSession = last == null ||
            !java.time.Duration.between(last, ts)
              .minusMinutes(gapMinutes).isNegative
          if (newSession) { close(); idx += 1; start = ts; n = 0 }
          last = ts; n += 1
        }
        close()
        out.iterator
      }
      .toDF("user_id", "session_idx", "session_start", "last_event", "n_events")
      .orderBy($"user_id", $"session_idx")
  }

  /** TPC-H Q3 shape: unshipped-revenue top-10 for one market segment —
    * the BASELINE.md q3 anchor (dim filter → two fact joins → group →
    * global top-k via TakeOrderedAndProject).
    */
  def joinQ3Topk(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cut = ntz("1996-03-15 00:00:00")
    val one = lit(1).cast(D4_2)
    customer(spark, sfDir).filter($"c_mktsegment" === "BUILDING")
      .join(orders(spark, sfDir), $"c_custkey" === $"o_custkey")
      .filter($"o_orderdate" < cut)
      .join(lineitem(spark, sfDir), $"o_orderkey" === $"l_orderkey")
      .filter($"l_shipdate" > cut)
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(sum(money($"l_extendedprice") * (one - rate($"l_discount"))).as("_rev"))
      .select($"l_orderkey", $"o_orderdate", $"_rev".cast(DoubleType).as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
}
