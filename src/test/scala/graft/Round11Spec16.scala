package graft

import graft.ops.Round11Ops19
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 19: survival curve, OOV rate, dynamic
  * partition overwrite, concurrent orders, weighted median,
  * hierarchical lookup. */
class Round11Spec16 extends AnyFunSuite with SparkFixture {

  test("survival: monotone non-increasing, starts at 1.0") {
    import spark.implicits._
    val rows = Round11Ops19.analyticSurvivalRetention(spark, sf)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(0, 7, 14, 30, 60, 90))
    assert(rows.head._4 === 1.0, "every user survives to day 0")
    rows.map(_._2).sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1))
    }
    val nUsers = Tables.events(spark, sf).select($"user_id").distinct().count()
    assert(rows.head._3 === nUsers)
  }

  test("OOV rate: rates in [0,1], token totals reconcile") {
    import spark.implicits._
    val rows = Round11Ops19.textOovRate(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nt, no, r) =>
      assert(no <= nt && r >= 0.0 && r <= 1.0)
    }
    val totalToks = Tables.documents(spark, sf)
      .select(size(split($"text", " "))).as[Int].collect().map(_.toLong).sum
    assert(rows.map(_._2).sum === totalToks)
  }

  test("dynamic partition overwrite: only the purchase partition changed") {
    import spark.implicits._
    val rows = Round11Ops19.sourceDynamicPartitionOverwrite(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    val direct = Tables.events(spark, sf)
      .select($"event_type", (Tables.money($"value") * 100)
        .cast("long").as("cents"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
      .as[(String, Long, Long)].collect().toSeq
    val dm = direct.map(r => r._1 -> r).toMap
    rows.foreach { case (et, n, s) =>
      val (_, dn, ds) = dm(et)
      assert(n === dn)
      if (et == "purchase") assert(s === 2 * ds) else assert(s === ds)
    }
    assert(rows.map(_._1).toSet === dm.keySet)
  }

  test("concurrent orders: depth non-negative, ends at zero") {
    import spark.implicits._
    val rows = Round11Ops19.analyticConcurrentOrders(spark, sf)
      .as[(Date, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, depth) => assert(depth >= 0) }
    val last = rows.maxBy(_._1.toLocalDate.toEpochDay)
    assert(last._2 === 0, "all orders eventually close")
    val peak = rows.map(_._2).max
    assert(peak > 0)
  }

  test("weighted median: half the weight on each side") {
    import spark.implicits._
    val rows = Round11Ops19.aggWeightedMedian(spark, sf)
      .as[(String, Double, Long)].collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity".cast("long"))
      .as[(String, Double, Long)].collect()
    rows.foreach { case (rf, med, tot) =>
      val g = li.filter(_._1 == rf)
      assert(g.map(_._3).sum === tot)
      val below = g.filter(_._2 <= med).map(_._3).sum
      val above = g.filter(_._2 >= med).map(_._3).sum
      assert(2 * below >= tot, s"$rf: weight at or below median")
      assert(2 * above >= tot, s"$rf: weight at or above median")
    }
  }

  test("hierarchical lookup: every part gets a benchmark at some level") {
    import spark.implicits._
    val rows = Round11Ops19.joinHierarchicalLookup(spark, sf)
      .as[(Long, String, String, Double, Double, String)].collect()
    assert(rows.length === Tables.part(spark, sf).count())
    rows.foreach { case (_, _, _, _, bench, level) =>
      assert(bench > 0)
      assert(Set("brand_type", "brand", "global").contains(level))
    }
    // levels consistent within a (brand, type) cell
    rows.groupBy(r => (r._2, r._3)).foreach { case (_, g) =>
      assert(g.map(_._6).distinct.length === 1)
      assert(g.map(_._5).distinct.length === 1)
    }
  }
}
