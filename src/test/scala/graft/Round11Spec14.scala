package graft

import graft.ops.Round11Ops17
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Date

/** Round-11 widening, part 17: union-by-name, GDPR erasure,
  * compressed roundtrips, shard manifest, burst detect, URL codec. */
class Round11Spec14 extends AnyFunSuite with SparkFixture {

  test("union by name: null bucket holds exactly the odd-key rows") {
    import spark.implicits._
    val rows = Round11Ops17.setUnionByName(spark, sf).collect()
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length === 1)
    val oddCount = Tables.orders(spark, sf)
      .filter($"o_orderkey" % 2 =!= 0).count()
    assert(nullRow.head.getLong(1) === oddCount)
    assert(rows.map(_.getLong(1)).sum === Tables.orders(spark, sf).count())
  }

  test("gdpr erasure: erased + retained reconcile, some users erased") {
    import spark.implicits._
    val rows = Round11Ops17.pipelineGdprErasure(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, t, r, e) => assert(t === r + e && r > 0) }
    assert(rows.map(_._4).sum > 0, "deletion list should not be empty")
  }

  test("compressed roundtrip: both codecs agree with the direct scan") {
    import spark.implicits._
    val rows = Round11Ops17.sourceCompressedRoundtrip(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.length === 2)
    val n = Tables.events(spark, sf).count()
    rows.foreach { case (_, cnt, _) => assert(cnt === n) }
    assert(rows(0)._3 === rows(1)._3)
  }

  test("shard manifest: docs partition into shards, bytes reconcile") {
    import spark.implicits._
    val rows = Round11Ops17.multimodalShardManifest(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.map(_._3).sum === Tables.documents(spark, sf).count())
    val totalBytes = Tables.documents(spark, sf)
      .agg(sum(length($"text"))).as[Long].head()
    assert(rows.map(_._4).sum === totalBytes)
    rows.foreach { case (_, s, nd, b, f, l) =>
      assert(s >= 0 && nd >= 1 && b > 0 && f <= l)
    }
  }

  test("burst detect: flag consistent with the integer predicate") {
    import spark.implicits._
    val rows = Round11Ops17.tsBurstDetect(spark, sf)
      .as[(String, Date, Long, Long, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, c, s7, b) =>
      assert(b === (c * 7 > s7 * 2))
    }
  }

  test("url codec: roundtrip identity and plus-count equals spaces") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val rows = Round11Ops17.fnUrlCodec(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    rows.foreach { case (id, rt, encLen, nPlus) =>
      val orig = docs(id)
      assert(rt === orig)
      assert(encLen === orig.length)
      assert(nPlus === orig.count(_ == ' '))
    }
  }
}
