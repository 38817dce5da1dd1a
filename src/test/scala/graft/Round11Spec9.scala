package graft

import graft.ops.Round11Ops12
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 12: Brier, Gini split, bounce rate,
  * burstiness, feature hashing, tile grid. */
class Round11Spec9 extends AnyFunSuite with SparkFixture {

  test("brier: in [0,1], near 1/3 for a random model vs rare positives") {
    import spark.implicits._
    val rows = Round11Ops12.mlBrierScore(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.map(_._2).sum === Tables.events(spark, sf).count())
    rows.foreach { case (_, n, np, b) =>
      assert(np >= 0 && np <= n)
      assert(b >= 0.0 && b <= 1.0)
    }
  }

  test("gini split: 23 thresholds, partitions consistent, impurity in [0,0.5]") {
    import spark.implicits._
    val rows = Round11Ops12.mlGiniSplit(spark, sf)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
    assert(rows.length === 23)
    val total = rows.head._2 + rows.head._4
    rows.foreach { case (_, nl, pl, nr, pr, g) =>
      assert(nl + nr === total && pl <= nl && pr <= nr)
      assert(g >= 0.0 && g <= 0.5 + 1e-9)
    }
  }

  test("bounce rate: sessions partition, rate consistent with counts") {
    import spark.implicits._
    val rows = Round11Ops12.analyticBounceRate(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, ns, nb, r) =>
      assert(nb <= ns)
      assert(math.abs(r - nb.toDouble / ns) < 1e-5)
    }
  }

  test("burstiness: 20 terms, VMR >= ~0 and monotone in output order") {
    import spark.implicits._
    val rows = Round11Ops12.textBurstiness(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.length === 20)
    rows.foreach { case (_, df, tf, vmr) =>
      assert(df >= 1 && tf >= 50 && vmr >= -1e-9)
    }
    assert(rows.map(_._4).sliding(2).forall(w => w(0) >= w(1)))
  }

  test("feature hash: buckets in [0,64), token total matches corpus") {
    import spark.implicits._
    val rows = Round11Ops12.mlFeatureHash(spark, sf)
      .as[(String, Int, Long, Long)].collect()
    rows.foreach { case (_, b, nt, nd) =>
      assert(b >= 0 && b < 64 && nd <= nt)
    }
    val totalTokens = Tables.documents(spark, sf)
      .select(size(split($"text", " "))).as[Int].collect().map(_.toLong).sum
    assert(rows.map(_._3).sum === totalTokens)
  }

  test("tile grid: tile count and offsets consistent with text length") {
    import spark.implicits._
    val byDoc = Round11Ops12.multimodalTileGrid(spark, sf)
      .as[(Long, Long, Long, Long, String)].collect().groupBy(_._1)
    val lens = Tables.documents(spark, sf)
      .select($"doc_id", length($"text")).as[(Long, Int)].collect().toMap
    byDoc.foreach { case (id, tiles) =>
      val n = lens(id) / 64
      assert(tiles.length === n)
      assert(tiles.map(_._3).sorted.toSeq === (0L until n).toSeq)
      tiles.foreach { case (_, nt, tid, off, h) =>
        assert(nt === n && off === tid * 64 && h.length === 32)
      }
    }
  }
}
