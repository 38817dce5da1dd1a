package graft

import graft.ops.Round13Ops30
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 30: string-shaping invariants, xor-parity algebra.
  */
class Round13Spec30 extends AnyFunSuite with SparkFixture {

  test("padding/translate: widths fixed, digits masked, originals intact") {
    import spark.implicits._
    val rows = Round13Ops30.fnStringPaddingTranslate(spark, sf)
      .as[(Long, String, String, String, String)].collect()
    assert(rows.nonEmpty && rows.length <= 31) // keys 0..30
    rows.foreach { case (k, pad, pri, st, ruled) =>
      assert(pad.length === 10 && pad.endsWith(k.toString))
      assert(!pri.exists(_.isDigit), s"digits must be masked: $pri")
      assert(st.startsWith("*"))
      assert(ruled.endsWith("|-----"))
    }
  }

  test("xor parity: xor of all groups equals xor of the whole table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Round13Ops30.aggBitXorParity(spark, sf)
      .as[(String, Long, Long, Boolean, Long, Long)].collect()
    assert(rows.length === 5)
    val whole = Tables.orders(spark, sf)
      .agg(bit_xor((Tables.money($"o_totalprice") * 100).cast("long")))
      .as[Long].head()
    assert(rows.map(_._3).reduce(_ ^ _) === whole,
      "xor is associative across the partition")
    rows.foreach { case (_, n, _, even, a, o) =>
      assert(even === (n % 2 == 0))
      assert((a & o) === a, "AND is a subset of OR bitwise")
    }
  }
}
