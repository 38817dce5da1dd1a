package graft

import graft.ops.LlmOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2j verification for the oracle-less ops + semantic properties. */
class LlmSpec extends AnyFunSuite with SparkFixture {

  test("banded minhash recovers most exact near-dup pairs (recall), no false positives") {
    import spark.implicits._
    // exact same-lang pairs at jaccard >= 0.8 (the oracle-checked op);
    // the LSH op is cross-lang, so exact pairs are a recall target set
    val exact = LlmOps.dedupNearJaccard(spark, sf)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val lsh = LlmOps.dedupMinhashLsh(spark, sf)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    assert(exact.nonEmpty, "corpus should contain near-dup pairs")
    val lshPairs = lsh.map(r => (r._1, r._2)).toSet
    val recall = exact.count(lshPairs.contains).toDouble / exact.size
    // r=4,b=3 banding: P(candidate) = 1-(1-j^4)^3 = 0.79 at j=0.8,
    // higher above — expect strong but not perfect recall
    assert(recall >= 0.7, s"banded-minhash recall $recall should be >= 0.7")
    // verification stage guarantees zero false positives below 0.8
    assert(lsh.forall(_._3 >= 0.8))
  }

  test("cosine top-k: scores within [-1, 1], strictly ordered, k rows") {
    import spark.implicits._
    val rows = LlmOps.simCosineTopk(spark, sf)
      .select($"cosine").as[Double].collect()
    assert(rows.length === 20)
    assert(rows.forall(c => c >= -1.0 && c <= 1.0))
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }

  test("knn of probe vector excludes the probe and returns k ordered neighbors") {
    import spark.implicits._
    val rows = LlmOps.simKnnQuery(spark, sf)
      .select($"vec_id", $"cosine").as[(Long, Double)].collect()
    assert(rows.length === 10)
    assert(!rows.map(_._1).contains(0L))
    val cs = rows.map(_._2)
    assert(cs.sameElements(cs.sorted(Ordering[Double].reverse)))
  }

  test("ANN (random-projection LSH) finds most true euclidean neighbors") {
    import spark.implicits._
    import graft.ops.LlmOps2
    val ann = LlmOps2.simAnnLsh(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    // brute-force euclidean top-10 of probe vec 0
    val rows = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect()
    val probe = rows.find(_._1 == 0L).get._2
    val exact = rows.filter(_._1 != 0L)
      .map { case (id, e) =>
        val d = e.zip(probe).map { case (a, b) => (a - b).toDouble * (a - b) }.sum
        (id, math.sqrt(d))
      }
      .sortBy(r => (r._2, r._1)).take(10).map(_._1).toSet
    val recall = exact.count(ann.contains).toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall vs brute force should be >= 0.5")
  }

  test("simhash: near-identical token sets have small hamming distance") {
    import spark.implicits._
    import graft.ops.{LlmOps, LlmOps2}
    val sh = LlmOps2.dedupSimhash(spark, sf)
      .select($"doc_id", $"simhash").as[(Long, Long)].collect().toMap
    // the strongest exact near-dup pair should be close in simhash space
    val top = LlmOps.dedupNearJaccard(spark, sf)
      .orderBy($"jaccard".desc).select($"id_a", $"id_b")
      .as[(Long, Long)].head()
    val ham = java.lang.Long.bitCount(sh(top._1) ^ sh(top._2))
    assert(ham <= 12, s"hamming distance $ham for a >=0.8-jaccard pair should be small")
  }

  test("exact dedup groups cover every document exactly once") {
    import spark.implicits._
    val total = Tables.documents(spark, sf).count()
    val grouped = LlmOps.dedupExactHash(spark, sf)
      .agg(sum($"n_docs")).as[Long].head()
    assert(grouped === total)
  }

  test("jaccard is symmetric-free (a<b) and within (0, 1]") {
    import spark.implicits._
    val rows = LlmOps.dedupNearJaccard(spark, sf)
      .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, j) => a < b && j > 0 && j <= 1.0 })
  }

  test("filtered ANN: every hit satisfies the predicate, recall@10 >= 0.8 vs exact filtered kNN") {
    import spark.implicits._
    val en = Tables.documents(spark, sf).filter($"lang" === "en")
      .select($"doc_id").as[Long].collect().toSet
    val got = graft.ops.Round11Ops3.simAnnFiltered(spark, sf)
      .select($"vec_id").as[Long].collect()
    assert(got.length === 10)
    assert(got.forall(en), s"non-en vec leaked through the filtered probe: ${got.toSeq}")
    val exact = graft.ops.Round11Ops3.exactFilteredKnn(spark, sf)
      .select($"vec_id").as[Long].collect().toSet
    val recall = (exact intersect got.toSet).size.toDouble / exact.size
    assert(recall >= 0.8, s"filtered-ANN recall@10 $recall below floor")
  }

  test("bm25: top-ranked docs contain query terms, rare term dominates the head") {
    import spark.implicits._
    val top = graft.ops.Round11Ops3.textBm25Retrieval(spark, sf)
      .select($"doc_id", $"n_terms", $"bm25")
      .as[(Long, Long, Double)].collect()
    assert(top.length === 15)
    assert(top.map(_._3).sliding(2).forall(p => p(0) >= p(1)), "scores must descend")
    val text = Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val q = graft.ops.Round11Ops3.queryTerms.toSet
    top.foreach { case (id, nTerms, _) =>
      val toks = text(id).split(" ").toSet
      assert((toks intersect q).size.toLong === nTerms,
        s"doc $id: n_terms $nTerms vs actual ${(toks intersect q).size}")
      assert(nTerms >= 1, s"doc $id ranked without any query term")
    }
    // 'dup' has df ~5% of the common terms' — its idf dwarfs theirs, so
    // every dup-containing doc must outrank every non-dup doc
    val dupDocs = top.filter(r => text(r._1).split(" ").contains("dup"))
    assert(dupDocs.nonEmpty, "rare-term docs missing from the head")
    val worstDup = dupDocs.map(_._3).min
    val bestNonDup = top.filter(r => !text(r._1).split(" ").contains("dup"))
      .map(_._3).maxOption.getOrElse(0.0)
    assert(worstDup > bestNonDup, "idf weighting: rare-term docs must lead")
  }
}
