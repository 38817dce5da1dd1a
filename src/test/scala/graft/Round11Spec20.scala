package graft

import graft.ops.Round11Ops23
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 23: ABC/XYZ matrix, run checksum, hybrid
  * skew join, role-playing dims, DISTINCT aggregates, harmonic
  * centrality. */
class Round11Spec20 extends AnyFunSuite with SparkFixture {

  test("abc/xyz: parts partition into the matrix exactly once") {
    import spark.implicits._
    val rows = Round11Ops23.analyticAbcXyzMatrix(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val nParts = Tables.lineitem(spark, sf)
      .select($"l_partkey").distinct().count()
    assert(rows.map(_._3).sum === nParts)
    rows.foreach { case (a, x, n, rev) =>
      assert(Set("A", "B", "C").contains(a) && Set("X", "Y", "Z").contains(x))
      assert(n > 0 && rev > 0)
    }
  }

  test("run checksum: ALL row XORs consistent with per-type rows") {
    import spark.implicits._
    val rows = Round11Ops23.pipelineRunChecksum(spark, sf)
      .as[(String, Long, Long)].collect()
    val all = rows.filter(_._1 == "ALL")
    val types = rows.filterNot(_._1 == "ALL")
    assert(all.length === 1 && types.nonEmpty)
    assert(all.head._2 === types.map(_._2).sum)
    assert(all.head._3 === types.map(_._3).reduce(_ ^ _),
      "XOR checksum composes across groups")
  }

  test("hybrid skew join: identical to the plain join result") {
    import spark.implicits._
    val rows = Round11Ops23.skewHybridJoin(spark, sf)
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"),
        sum(Tables.money($"l_extendedprice")).cast("double").as("r"))
      .as[(Int, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(rows === plain)
  }

  test("role-playing dims: no same-nation rows, volume positive") {
    import spark.implicits._
    val rows = Round11Ops23.joinRolePlayingDims(spark, sf)
      .as[(String, String, Int, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sn, cn, _, v) =>
      assert(sn !== cn)
      assert(v > 0)
    }
  }

  test("distinct aggregates: match a driver-side distinct set") {
    import spark.implicits._
    val rows = Round11Ops23.aggSumAvgDistinct(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    val qs = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_quantity".cast("long"))
      .as[(String, Long)].collect()
    rows.foreach { case (rf, nd, sd, avg) =>
      val set = qs.filter(_._1 == rf).map(_._2).toSet
      assert(nd === set.size)
      assert(sd === set.sum)
      assert(math.abs(avg - set.sum.toDouble / set.size) < 1e-4)
    }
  }

  test("harmonic centrality: bounded by 12/d weights times reach") {
    import spark.implicits._
    val rows = Round11Ops23.graphHarmonicCentrality(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, hs, h) =>
      assert(hs > 0, "every node reaches at least one neighbor")
      assert(math.abs(h - hs / 12.0) < 1e-6)
    }
  }
}
