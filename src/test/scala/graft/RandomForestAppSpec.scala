package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The reference-workflow facade: train from a feature file, score a
  * test file — both the CSV and parquet ingest paths.
  */
class RandomForestAppSpec extends AnyFunSuite with SparkFixture {

  test("csv ingest: train/score on expanded embedding columns") {
    import spark.implicits._
    // materialize embeddings as headerless CSV (64 features + label) —
    // the reference's native input shape; dir name carries the .csv hint
    val csvDir = "/tmp/graft_rfapp.csv"
    val cols = (0 until 64).map(i => element_at($"embedding", i + 1)) :+ $"label"
    Tables.embeddings(spark, sf)
      .select(cols: _*)
      .coalesce(1).write.mode("overwrite").csv(csvDir)
    val pred = RandomForestApp.trainAndScore(spark, csvDir, csvDir,
      numTrees = 5, maxDepth = 3)
    assert(pred.count() === Tables.embeddings(spark, sf).count())
    assert(pred.columns.toSeq === Seq("id", "label", "prediction"))
  }

  test("csv ingest: categorical feature columns are indexed and carry the signal") {
    import spark.implicits._
    // label is a pure function of the categorical column; the numeric
    // column is id noise — the forest can only reach the floor through
    // the StringIndexer path (derived target per the determinism
    // protocol: no accuracy assertions on real labels)
    val csvDir = "/tmp/graft_rfapp_cat.csv"
    val cats = Seq("red", "green", "blue", "amber")
    val rows = (0 until 400).map { i =>
      val c = cats(i % cats.length)
      (c, i.toDouble / 400.0, i % cats.length)
    }
    rows.toDF("cat", "noise", "label")
      .coalesce(1).write.mode("overwrite").option("header", "false").csv(csvDir)
    val pred = RandomForestApp.trainAndScore(spark, csvDir, csvDir,
      numTrees = 10, maxDepth = 4)
    val n = pred.count()
    assert(n === 400)
    val acc = pred.filter($"prediction" === $"label").count().toDouble / n
    assert(acc >= 0.95,
      s"category-determined label must be learnable through indexing, got $acc")
  }

  test("split workflow: train/save then load/score equals the one-process run") {
    import spark.implicits._
    // the reference's two-job shape: a training job that serializes
    // the forest, then a scoring job that only sees the model dir +
    // test file
    val p = s"$sf/embeddings.parquet"
    val modelDir = "/tmp/graft_rfapp_model"
    RandomForestApp.saveModel(
      RandomForestApp.train(spark, p, numTrees = 10, maxDepth = 4), modelDir)
    val split = RandomForestApp.loadAndScore(spark, modelDir, p)
      .as[(Long, Int, Int)].collect().toSeq
    val oneProc = RandomForestApp
      .trainAndScore(spark, p, p, numTrees = 10, maxDepth = 4)
      .as[(Long, Int, Int)].collect().toSeq
    assert(split === oneProc)
    assert(split.nonEmpty)
  }

  test("parquet ingest: accepts the embeddings schema and scores") {
    import spark.implicits._
    val p = s"$sf/embeddings.parquet"
    val pred = RandomForestApp.trainAndScore(spark, p, p,
      numTrees = 10, maxDepth = 4)
    assert(pred.count() === Tables.embeddings(spark, sf).count())
    assert(pred.columns.toSeq === Seq("id", "label", "prediction"))
    // predictions land in the label domain
    val dom = pred.select($"prediction").distinct().as[Int].collect()
    assert(dom.forall(p => p >= 0 && p <= 9))
  }
}
