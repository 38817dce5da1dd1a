package graft

import graft.ops.Round11Ops32
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 widening, part 32: LDA, to_number, token-set hash,
  * cosine histogram, accumulating snapshot, bigram entropy. */
class Round11Spec29 extends AnyFunSuite with SparkFixture {

  test("lda: 4 topics x 5 ranked terms, weights positive, deterministic") {
    import spark.implicits._
    val rows = Round11Ops32.mlLdaTopics(spark, sf)
      .as[(Int, Int, Int, Double)].collect()
    assert(rows.length === 20)
    assert(rows.map(_._1).distinct.sorted.toSeq === Seq(0, 1, 2, 3))
    rows.foreach { case (_, r, ti, w) =>
      assert(r >= 1 && r <= 5 && ti >= 0 && w > 0)
    }
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ws = g.sortBy(_._2).map(_._4)
      ws.sliding(2).foreach { p =>
        if (p.length == 2) assert(p(0) >= p(1), "weights descend by rank")
      }
    }
    val again = Round11Ops32.mlLdaTopics(spark, sf)
      .as[(Int, Int, Int, Double)].collect()
    assert(rows.toSeq === again.toSeq, "seeded EM is deterministic")
  }

  test("to_number: formatted strings parse back to exact totals") {
    import spark.implicits._
    val rows = Round11Ops32.fnToNumber(spark, sf)
      .as[(String, Long, Long)].collect()
    val direct = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum((Tables.money($"o_totalprice") * 100).cast("long")).as("s"))
      .as[(String, Long, Long)].collect()
    assert(rows.toSeq.sortBy(_._1) === direct.toSeq.sortBy(_._1))
  }

  test("token-set hash: groups hold permutation duplicates only") {
    import spark.implicits._
    val rows = Round11Ops32.dedupTokenSetHash(spark, sf)
      .as[(String, Long, Long)].collect()
    rows.foreach { case (_, n, _) => assert(n > 1) }
    // at minimum the exact-text duplicates are also token-set dups
    val exactDups = Tables.documents(spark, sf)
      .groupBy(md5($"text")).count().filter($"count" > 1).count()
    assert(rows.length.toLong >= 0 && (exactDups == 0 || rows.nonEmpty))
  }

  test("cosine histogram: pair count reconciles to n*(n-1)/2") {
    import spark.implicits._
    val rows = Round11Ops32.simCosineHistogram(spark, sf)
      .as[(Int, Long)].collect()
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_._2).sum === n * (n - 1) / 2)
    rows.foreach { case (b, _) => assert(b >= -10 && b <= 10) }
  }

  test("accumulating snapshot: orders and lines reconcile") {
    import spark.implicits._
    val rows = Round11Ops32.joinAccumulatingSnapshot(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    // orders with no lineitems yet have no lifecycle row (inner join)
    val withLines = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        $"o_orderkey" === $"l_orderkey", "left_semi").count()
    assert(rows.map(_._2).sum === withLines)
    assert(rows.map(_._3).sum === Tables.lineitem(spark, sf).count())
    rows.foreach { case (_, _, _, g, span) =>
      assert(g > 0 && span >= 0)
    }
  }

  test("bigram conditional entropy: bounded by unigram entropy scale") {
    import spark.implicits._
    val rows = Round11Ops32.textBigramCondEntropy(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nb, h) =>
      assert(nb > 0)
      assert(h >= -1e-6 && h <= 8.0, s"conditional entropy $h sane")
    }
  }
}
