package graft

import graft.ops.Round11Ops28
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 28: from_csv, ordinal GROUP BY, control
  * chart, canonical JSON, rank shift, ACF table. */
class Round11Spec25 extends AnyFunSuite with SparkFixture {

  test("from_csv: parsed aggregate equals the direct aggregate") {
    import spark.implicits._
    val rows = Round11Ops28.fnFromCsv(spark, sf)
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    val direct = Tables.events(spark, sf)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum((Tables.money($"value") * 100).cast("long")).as("s"))
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(rows === direct)
  }

  test("ordinal group by: every group exceeds the HAVING floor") {
    import spark.implicits._
    val rows = Round11Ops28.sqlGroupByOrdinal(spark, sf)
      .as[(String, Int, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, n, _) => assert(n > 5) }
  }

  test("control chart: z scores center near zero over the month") {
    import spark.implicits._
    val rows = Round11Ops28.tsControlChart(spark, sf)
      .as[(Date, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val meanZ = rows.map(_._4).sum / rows.length
    assert(math.abs(meanZ) < 1.0, s"mean z $meanZ")
    rows.foreach { case (_, n, ne, _) => assert(ne <= n) }
  }

  test("canonical json: parse returns the source value") {
    import spark.implicits._
    val rows = Round11Ops28.fnJsonCanonical(spark, sf)
      .limit(200).as[(Long, String, String)].collect()
    rows.foreach { case (id, json, rt) =>
      assert(json.startsWith(s"""{"event_id":$id,"event_type":""""))
      assert(json.contains(rt))
    }
  }

  test("rank shift: ranks positive, shift consistent") {
    import spark.implicits._
    val rows = Round11Ops28.textRankShift(spark, sf)
      .as[(String, Int, Int, Long, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, ra, rb, na, nb, sh) =>
      assert(ra >= 1 && rb >= 1 && na > 0 && nb > 0)
      assert(sh === rb - ra)
    }
    assert(rows.map(_._2).distinct.length === rows.length,
      "src0 ranks are unique")
  }

  test("ACF: lag-0 normalization implies |acf| <= 1 (plus rounding)") {
    import spark.implicits._
    val rows = Round11Ops28.tsAcfTable(spark, sf)
      .as[(String, Int, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq === (1 to 7))
    }
    rows.foreach { case (_, _, np, a) =>
      assert(np > 0)
      assert(math.abs(a) <= 1.2, s"acf $a within loose bound")
    }
  }
}
