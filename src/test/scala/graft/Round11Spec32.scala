package graft

import graft.ops.Round11Ops35
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 35: filtered distinct, initcap, global
  * HAVING, char codes. */
class Round11Spec32 extends AnyFunSuite with SparkFixture {

  test("distinct filter: branch vocabularies bounded by the full one") {
    import spark.implicits._
    val rows = Round11Ops35.aggDistinctFilter(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val full = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_quantity".cast("long")))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (rf, d, f, n) =>
      assert(d <= full(rf) && f <= full(rf))
      assert(n > 0)
    }
  }

  test("initcap: title case normalizes regardless of input case") {
    import spark.implicits._
    val rows = Round11Ops35.fnInitcap(spark, sf)
      .limit(200).as[(Long, String, String, String)].collect()
    rows.foreach { case (_, name, t, tu) =>
      assert(t === tu, "initcap is case-insensitive on input")
      t.split(" ").filter(_.nonEmpty).foreach { w =>
        assert(w.head.isUpper || !w.head.isLetter)
        assert(w.tail.forall(c => !c.isLetter || c.isLower))
      }
      assert(t.equalsIgnoreCase(name))
    }
  }

  test("global HAVING: one row when the batch clears the floor") {
    import spark.implicits._
    val rows = Round11Ops35.sqlHavingGlobal(spark, sf)
      .as[(Long, Long)].collect()
    assert(rows.length === 1)
    assert(rows.head._1 === Tables.orders(spark, sf).count())
  }

  test("char codes: roundtrip identity, counts reconcile") {
    import spark.implicits._
    val rows = Round11Ops35.fnCharCodes(spark, sf)
      .as[(Int, String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (code, rt, n) =>
      assert(rt.length === 1 && rt.head.toInt === code)
      assert(n > 0)
    }
    assert(rows.map(_._3).sum === Tables.part(spark, sf).count())
  }
}
