package graft

import graft.operators.Similarity
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val brute = Similarity.bruteForceTopK(spark, TestSpark.Sf0001).collect()

  test("brute-force top-k: 10 neighbors per query, self excluded, cosine in [-1,1]") {
    val byQuery = brute.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 10)
      assert(!rows.exists(_.getLong(1) == q), "self must be excluded")
      assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.sameElements(1 to 10))
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "ranked by descending cosine")
    }
  }

  test("LSH top-k achieves nonzero recall vs brute force on unclustered vectors") {
    val lsh = Similarity.lshTopK(spark, TestSpark.Sf0001).collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshSet = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bruteSet & lshSet).size.toDouble / bruteSet.size
    // 8 tables x 4 bits over ~uniform random vectors: candidate sets cover
    // ~40% of the corpus; near-neighbors (high cosine) hash together more
    // often, so recall must clearly beat the random-candidate floor.
    assert(recall >= 0.4, s"recall@10 was $recall")
  }

  test("embedding near-dup pairs: threshold respected, subset of brute-force truth") {
    val got = Similarity.embeddingCosinePairs(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.nonEmpty, "banding/threshold should yield pairs on this corpus")
    got.foreach { case (a, b, c) =>
      assert(a < b, "canonical pair order")
      assert(c >= 0.35, s"below threshold: ($a,$b,$c)")
    }
    // precision is exact by construction (candidates are verified with true
    // cosine): every emitted pair must be in the all-pairs ground truth
    val e = Tables.embeddings(spark, TestSpark.Sf0001).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (e(a), e(b))
      var dp, na, nb = 0.0
      var i = 0
      while (i < va.length) { dp += va(i) * vb(i); na += va(i) * va(i); nb += vb(i) * vb(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    got.foreach { case (a, b, c) =>
      assert(math.abs(cos(a, b) - c) < 1e-9, s"reported cosine wrong for ($a,$b)")
    }
  }

  test("IVF k-means: valid top-k shape, deterministic across runs") {
    val km = Similarity.ivfKmeansTopK(spark, TestSpark.Sf0001).collect()
    val byQuery = km.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 10)
      assert(!rows.exists(_.getLong(1) == q))
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    val again = Similarity.ivfKmeansTopK(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == km.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet,
      "quantized-integer Lloyd steps must be reproducible")
  }

  test("IVF top-k: full lists probed deterministically, sane output shape") {
    val ivf = Similarity.ivfTopK(spark, TestSpark.Sf0001).collect()
    val byQuery = ivf.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 10)
      assert(!rows.exists(_.getLong(1) == q))
    }
    // deterministic across runs (quantized integer centroid math)
    val again = Similarity.ivfTopK(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == ivf.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
  }

  test("PQ ADC top-k: valid shape, ranked by ascending distance, deterministic") {
    val pq = Similarity.pqTopK(spark, TestSpark.Sf0001).collect()
    val byQuery = pq.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.foreach { case (q, rows) =>
      assert(rows.length == 10)
      assert(!rows.exists(_.getLong(1) == q), "self must be excluded")
      val ranks = rows.map(_.getInt(2)).sorted
      assert(ranks.sameElements(1 to 10))
      val d2 = rows.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(d2.zip(d2.tail).forall { case (a, b) => a <= b },
        "ranked by ascending ADC distance")
      assert(d2.forall(_ >= 0L), "squared distances are non-negative")
    }
    val again = Similarity.pqTopK(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(again == pq.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet,
      "integer-quantized codebooks must be reproducible")
  }

  test("PQ recall vs brute force clearly beats the random floor") {
    val pq = Similarity.pqTopK(spark, TestSpark.Sf0001).collect()
    val bruteSet = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val pqSet = pq.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bruteSet & pqSet).size.toDouble / bruteSet.size
    // 8 subspaces x 8 codes over ~uniform vectors is a coarse 8-byte code;
    // random top-10 of ~500 docs would land ~2% — require a real signal.
    assert(recall >= 0.1, s"recall@10 was $recall")
  }

  test("recall_eval reproduces the set-arithmetic recall for every method") {
    val eval = Similarity.recallEval(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(eval.keys.map(_._1).toSet == Set("ivf", "ivfpq", "lsh", "mplsh", "pq"))
    // multi-probe's candidate superset can never lose hits vs single-probe
    eval.keys.collect { case ("lsh", q) => q }.foreach { q =>
      assert(eval(("mplsh", q)) >= eval(("lsh", q)),
        s"mplsh hits below lsh for query $q")
    }
    // cross-check one method against an independent set computation
    val bruteByQ = brute.map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshSet = Similarity.lshTopK(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (bruteByQ & lshSet).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    brute.map(_.getLong(0)).distinct.foreach { q =>
      assert(eval(("lsh", q)) == expect.getOrElse(q, 0L),
        s"lsh hits for query $q disagree with set arithmetic")
    }
  }

  test("k-core bounded peel reaches its fixpoint on the mutual-kNN graph") {
    val core = Similarity.kcore(spark, TestSpark.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(core.nonEmpty, "the 3-core of this corpus is non-trivial")
    // every surviving node at degree >= k IS the fixpoint condition: one
    // more peel round would remove nothing
    core.foreach { case (id, deg) =>
      assert(deg >= 3L, s"node $id survived the bounded peel with degree $deg < k")
    }
  }

  test("assortativity: a valid Pearson r, and n_edges matches an independent mutual count") {
    val row = Similarity.assortativity(spark, TestSpark.Sf0001).head()
    val (n, r) = (row.getLong(0), row.getDouble(1))
    assert(!r.isNaN && r >= -1.0 && r <= 1.0, s"r=$r out of Pearson range")
    // independent mutual-edge count from the kNN relation itself
    val knn = Similarity.knnGraph(spark, TestSpark.Sf0001).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val mutual = knn.count { case (a, b) => knn.contains((b, a)) }
    assert(n == mutual.toLong, s"n_edges=$n, independent mutual count=$mutual")
    assert(n % 2 == 0, "a symmetric directed edge list has even cardinality")
  }
}
