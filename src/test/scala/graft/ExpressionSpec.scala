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

  test("graft_isect matches a reference sorted-set intersection") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(60) {
      val a = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(30))(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val got = cases.toDF("a", "b")
      .select(call_function("graft_isect", $"a", $"b").as("n"))
      .as[Int].collect().toSeq
    val want = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got === want)
  }

  test("graft_shingles: sketch jaccard equals exact string-trigram jaccard") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    // the invariant the ngram oracle relies on: hashes differ from any
    // string form, but SET CARDINALITIES (and so jaccard) must match
    def trigrams(s: String): Set[String] = {
      val t = s.split(" ", -1)
      (0 to t.length - 3).map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    }
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")
    val docs = Seq.fill(40)(
      Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val sk = docs.toDF("text")
      .select($"text", call_function("graft_shingles", $"text", lit(3)).as("sh"))
      .as[(String, Seq[Long])].collect().toMap
    // per-doc cardinality
    docs.foreach { d =>
      assert(sk(d).size === trigrams(d).size, s"cardinality mismatch for '$d'")
      assert(sk(d) === sk(d).sorted, "sketch must be sorted")
    }
    // pairwise jaccard equality
    for (a <- docs.take(12); b <- docs.take(12) if a != b) {
      val hs = sk(a).toSet.intersect(sk(b).toSet).size.toDouble /
        sk(a).toSet.union(sk(b).toSet).size
      val ts = trigrams(a).intersect(trigrams(b)).size.toDouble /
        trigrams(a).union(trigrams(b)).size
      assert(math.abs(hs - ts) < 1e-12, s"jaccard mismatch: $hs vs $ts")
    }
  }

  test("graft_bandsigs: identical sets collide in every band, disjoint sets in none") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val a = (1L to 40L).toArray
    val b = (100L to 140L).toArray
    val sigs = Seq(("a", a), ("a2", a), ("b", b))
      .toDF("id", "th")
      .select($"id", call_function("graft_bandsigs", $"th", lit(4), lit(3)).as("s"))
      .as[(String, Seq[Long])].collect().toMap
    assert(sigs("a").size === 3, "one signature per band")
    assert(sigs("a") === sigs("a2"), "equal input sets must bucket together")
    assert(sigs("a").intersect(sigs("b")).isEmpty,
      "disjoint sets should not share band signatures")
    // permutation invariance: minima don't depend on array order
    val shuffled = new scala.util.Random(3).shuffle(a.toSeq).toArray
    val p = Seq(("p", shuffled)).toDF("id", "th")
      .select(call_function("graft_bandsigs", $"th", lit(4), lit(3)).as("s"))
      .as[Seq[Long]].head()
    assert(p === sigs("a"), "band signatures must be set-order invariant")
  }

  test("graft_bandsigs band-collision probability tracks jaccard (AND/OR shape)") {
    import spark.implicits._
    GraftFunctions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    // pairs at jaccard ~0.9: expect most to collide in >=1 of 3 bands
    // (P = 1-(1-j^4)^3 ≈ 0.93); pairs at ~0.2 should essentially never
    // (P ≈ 0.005)
    def pair(shared: Int, own: Int): (Array[Long], Array[Long]) = {
      val common = Array.fill(shared)(rnd.nextLong())
      (common ++ Array.fill(own)(rnd.nextLong()),
        common ++ Array.fill(own)(rnd.nextLong()))
    }
    val hi = Seq.fill(60)(pair(57, 2)) // j ≈ 57/61 ≈ 0.93
    val lo = Seq.fill(60)(pair(12, 24)) // j ≈ 12/60 = 0.2
    def collisions(ps: Seq[(Array[Long], Array[Long])]): Int = {
      val df = ps.toDF("a", "b").select(
        call_function("graft_bandsigs", $"a", lit(4), lit(3)).as("sa"),
        call_function("graft_bandsigs", $"b", lit(4), lit(3)).as("sb"))
      df.as[(Seq[Long], Seq[Long])].collect()
        .count { case (sa, sb) => sa.zip(sb).exists { case (x, y) => x == y } }
    }
    assert(collisions(hi) >= 45, "high-jaccard pairs must usually collide")
    assert(collisions(lo) <= 6, "low-jaccard pairs must rarely collide")
  }
}
