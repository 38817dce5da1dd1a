package graft

import graft.ops.Round11Ops31
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 31: lookahead regex, personalized
  * pagerank, corrupt JSON, bytes per token, bit aggregates, RANGE
  * peers. */
class Round11Spec28 extends AnyFunSuite with SparkFixture {

  test("lookahead: counts equal substring occurrences") {
    import spark.implicits._
    val rows = Round11Ops31.fnRegexLookahead(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val texts = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    rows.foreach { case (id, la, lb) =>
      val t = texts(id)
      assert(la === "data merge".r.findAllMatchIn(t).length)
      assert(lb === "fast scan".r.findAllMatchIn(t).length)
    }
  }

  test("personalized pagerank: seed holds the maximum mass") {
    import spark.implicits._
    val rows = Round11Ops31.graphPersonalizedPagerank(spark, sf)
      .as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    val seed = rows.map(_._1).min min rows.head._1
    // the top-ranked node is the seed itself (teleport mass)
    assert(rows.head._2 === rows.map(_._2).max)
    rows.foreach { case (_, p) => assert(p > 0 && p <= 1.001) }
  }

  test("corrupt json: 1-in-10 rows quarantine, rest aggregate") {
    import spark.implicits._
    val rows = Round11Ops31.sourceJsonCorruptRecords(spark, sf)
      .as[(String, Long, Long)].collect()
    val corrupt = rows.filter(_._1 == "_CORRUPT")
    assert(corrupt.length === 1)
    val expected = Tables.events(spark, sf)
      .filter(pmod($"event_id", lit(10)) === 0).count()
    assert(corrupt.head._2 === expected)
    assert(rows.map(_._2).sum === Tables.events(spark, sf).count())
  }

  test("bytes per token: ratio at least 1 (tokens include separators)") {
    import spark.implicits._
    val rows = Round11Ops31.textBytesPerToken(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nd, nb, nt, r) =>
      assert(nd > 0 && nb > nt)
      assert(math.abs(r - nb.toDouble / nt) < 1e-4)
    }
  }

  test("bit aggregates: AND <= XOR-compatible bounds, OR covers AND") {
    import spark.implicits._
    val rows = Round11Ops31.aggBitOps(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, a, o, x) =>
      assert((a & o) === a, "AND bits are a subset of OR bits")
      assert((x & ~o) === 0L, "XOR bits are a subset of OR bits")
      assert(o >= 0 && o <= 15)
    }
  }

  test("RANGE peers: tied rows share cum_range; last peer matches ROWS") {
    import spark.implicits._
    val rows = Round11Ops31.winRangePeers(spark, sf)
      .as[(String, Date, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(r => (r._1, r._3)).foreach { case (_, g) =>
      assert(g.map(_._4).distinct.length === 1,
        "all peers share the RANGE cumulative")
      assert(g.head._6 === g.length, "n_peers equals the tie size")
      // the max ROWS cumulative among peers equals the RANGE value
      assert(g.map(_._5).max === g.head._4)
    }
  }
}
