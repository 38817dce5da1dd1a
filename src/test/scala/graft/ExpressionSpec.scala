package graft

import graft.expressions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native FloatDotProduct expression: correctness vs a reference
  * computation, codegen path, and SQL registration surface.
  */
class ExpressionSpec extends AnyFunSuite with SparkFixture {

  test("graft_dot matches a driver-side reference dot product exactly") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rows = Tables.embeddings(spark, sf).limit(50)
      .select($"vec_id", $"embedding",
        call_function("graft_dot", $"embedding", $"embedding").as("d"))
      .as[(Long, Seq[Float], Double)].collect()
    rows.foreach { case (_, e, d) =>
      var s = 0.0
      e.foreach(x => s += x.toDouble * x.toDouble)
      assert(d === s) // bit-exact: same left-to-right double accumulation
    }
  }

  test("graft_dot is callable from SQL (E2 path) and fuses into codegen") {
    GraftFunctions.ensureRegistered(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_v")
    val df = spark.sql(
      "SELECT vec_id, graft_dot(embedding, embedding) AS d FROM emb_v")
    df.collect()
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("graft_dot"))
    assert(plan.contains("codegen id"),
      "native expression must stay inside whole-stage codegen")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("graft_dot handles length mismatch and empty arrays") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(
      (Array(1f, 2f, 3f), Array(2f, 3f)),      // min-length semantics
      (Array.empty[Float], Array(1f, 2f)))
      .toDF("a", "b")
      .select(call_function("graft_dot", $"a", $"b").as("d"))
    assert(df.as[Double].collect().toSeq === Seq(1.0 * 2 + 2 * 3, 0.0))
  }
}
