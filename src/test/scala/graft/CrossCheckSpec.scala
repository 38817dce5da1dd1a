package graft

import graft.ops.{Aggregates, Relational}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential checks INSIDE Spark: recompute an operator with a
  * structurally different plan and require identical results — guards
  * logic drift independently of the DuckDB oracle.
  */
class CrossCheckSpec extends AnyFunSuite with SparkFixture {

  test("moment-sum stats agree with the built-in Welford aggregates to 1e-6") {
    import spark.implicits._
    val ours = Aggregates.aggStats(spark, sf)
      .select($"l_returnflag", $"sd_qty", $"var_qty", $"corr_qty_price",
        $"covar_qty_disc")
      .as[(String, Double, Double, Double, Double)].collect().toMap2
    val builtin = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(stddev_samp($"l_quantity"), var_samp($"l_quantity"),
        corr($"l_quantity", $"l_extendedprice"),
        covar_samp($"l_quantity", $"l_discount"))
      .as[(String, Double, Double, Double, Double)].collect().toMap2
    ours.foreach { case (k, (a1, a2, a3, a4)) =>
      val (b1, b2, b3, b4) = builtin(k)
      // ours is rounded to 4dp, builtins are not: tolerance = half-ulp
      // of the rounding (5e-5) + formula noise
      assert(math.abs(a1 - b1) < 1e-4 && math.abs(a2 - b2) < 1e-4 &&
        math.abs(a3 - b3) < 1e-4 && math.abs(a4 - b4) < 1e-4)
    }
  }

  test("max_by argmax agrees with the window-rank formulation") {
    import spark.implicits._
    val viaAgg = Aggregates.aggMinmaxBy(spark, sf)
      .select($"o_custkey", $"max_order").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".desc)
    val viaWin = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)].collect().toMap
    assert(viaAgg === viaWin)
  }

  test("window as-of join agrees with a naive per-purchase scan") {
    import spark.implicits._
    val viaOp = Relational.joinAsofLastEvent(spark, sf)
      .select($"purchase_id", $"last_click_id")
      .as[(Long, Option[Long])].collect().toMap
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"event_type")
      .as[(Long, Long, java.time.LocalDateTime, String)].collect()
    val clicks = ev.filter(_._4 == "click")
    val naive = ev.filter(_._4 == "purchase").map { case (pid, u, pts, _) =>
      val prior = clicks.filter(c => c._2 == u &&
        (c._3.isBefore(pts) || (c._3 == pts && c._1 < pid)))
      pid -> (if (prior.isEmpty) None
              else Some(prior.reduceLeft { (x, y) =>
                if (y._3.isAfter(x._3) || (y._3 == x._3 && y._1 > x._1)) y else x
              }._1))
    }.toMap
    assert(viaOp === naive)
  }

  implicit private class Tup5Ops[A, B, C, D, E](rows: Array[(A, B, C, D, E)]) {
    def toMap2: Map[A, (B, C, D, E)] =
      rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
