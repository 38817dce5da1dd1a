package graft

import graft.ops.Round13Ops47
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 part 47: burn-rate window algebra, humanize formatting. */
class Round13Spec47 extends AnyFunSuite with SparkFixture {

  test("slo burn: page implies both windows over budget") {
    import spark.implicits._
    val rows = Round13Ops47.pipelineSloBurnAlert(spark, sf)
      .as[(java.sql.Timestamp, Long, Long, Double, Double, Long)]
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, e, b1, b6, page) =>
      assert(e <= n)
      assert(math.abs(b1 - e.toDouble * 4 / n) < 1e-4)
      assert(page === (if (b1 > 1.0 && b6 > 1.0) 1L else 0L))
    }
    // with a ~20% error share against a 25% budget, pages must be
    // neither universal nor absent across 700+ hours
    val pages = rows.count(_._6 == 1L)
    assert(pages > 0 && pages < rows.length,
      s"degenerate paging: $pages of ${rows.length}")
  }

  test("humanize: format reconstructs the magnitude") {
    import spark.implicits._
    val rows = Round13Ops47.fnHumanizeBytes(spark, sf)
      .as[(String, Long, String)].collect()
    assert(rows.length === 5)
    rows.foreach { case (_, b, h) =>
      val Array(num, unit) = h.split(" ")
      val mult = Map("B" -> 1L, "KiB" -> 1024L, "MiB" -> 1048576L,
        "GiB" -> 1073741824L)(unit)
      val approx = (num.toDouble * mult).toLong
      assert(math.abs(approx - b) <= mult / 10 + 1,
        s"$h does not reconstruct $b")
      assert(num.matches("""\d+\.\d"""), s"one decimal digit: $num")
    }
  }
}
