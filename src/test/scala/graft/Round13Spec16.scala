package graft

import graft.ops.Round13Ops16
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 16: spectrum mass identities, wholetext roundtrip
  * fidelity, scan-partition scaling direction.
  */
class Round13Spec16 extends AnyFunSuite with SparkFixture {

  test("freq spectrum: buckets partition the vocabulary") {
    import spark.implicits._
    val rows = Round13Ops16.textFreqSpectrum(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val vocab = Tables.documents(spark, sf)
      .select(explode(split($"text", " ")).as("w"))
      .filter(length($"w") > 0).select("w").distinct().count()
    assert(rows.map(_._2).sum === vocab,
      "spectrum counts must sum to the distinct-word count")
    assert(rows.length > 1, "a natural corpus spans multiple octave bands")
    rows.foreach { case (band, _, lo, hi) =>
      // band k holds counts in [2^(k-1), 2^k)
      assert(lo >= (1L << (band - 1)) && hi < (1L << band),
        s"band $band holds [$lo,$hi]")
    }
  }

  test("wholetext: 16 files read back with source-identical md5s") {
    import spark.implicits._
    val got = Round13Ops16.sourceWholetext(spark, sf)
      .as[(String, Int)].collect()
    assert(got.length === 16)
    val want = Tables.documents(spark, sf).filter($"doc_id" < 16)
      .select(md5($"text"), length($"text")).as[(String, Int)]
      .collect().sortBy(_._1)
    assert(got.sortBy(_._1).toSeq === want.toSeq)
  }

  test("partition tuning: smaller maxPartitionBytes => more scan partitions") {
    import spark.implicits._
    def partsUnder(bytes: String): Int = {
      val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
      try {
        spark.conf.set("spark.sql.files.maxPartitionBytes", bytes)
        Tables.lineitem(spark, sf).select("l_returnflag")
          .rdd.getNumPartitions
      } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
    }
    val small = partsUnder("65536")
    val big = partsUnder("268435456")
    assert(small > big,
      s"64 KiB target must split the scan finer: $small vs $big")
    assert(Round13Ops16.scaleScanPartitionTuning(spark, sf).count() === 3)
  }
}
