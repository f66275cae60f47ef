package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Round-15 directives: the empirical ANN recall probe (recall@k of each
  * SRP geometry measured against exact ground truth — the round-14
  * verdict's one open ANN question) and the grown-table plane-catalog
  * block it probes (tables ≥ 8 drawing from a third disjoint index
  * range, so the "grow NumTables with n" alternative is implemented,
  * not just documented).
  */
class Round15Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("grown-table plane block: injective over a 32-table budget and " +
    "disjoint from both committed blocks") {
    val all = for (t <- 0 until 32; j <- 0 until Similarity.MaxBits)
      yield Similarity.planeIdx(t, j)
    assert(all.distinct.size === all.size, "plane index collision")
    // the two committed blocks are byte-identical to the round-14 layout
    for (t <- 0 until 8; j <- 0 until 16)
      assert(Similarity.planeIdx(t, j) === t * 16 + j)
    assert(Similarity.ExtTableBase === 8 * 16 + 8 * (Similarity.MaxBits - 16))
    // grown tables start exactly at the third block and never dip below
    for (t <- 8 until 32; j <- 0 until Similarity.MaxBits)
      assert(Similarity.planeIdx(t, j) >= Similarity.ExtTableBase,
        s"grown plane ($t,$j) collides with a committed block")
    // coefficients stay deterministic ±1 into the grown block
    val cg = (0 until 64).map(d =>
      Similarity.planeCoef(Similarity.planeIdx(9, 3), d))
    assert(cg.forall(v => v == 1 || v == -1))
  }

  test("probeGroundTruth at the production query count reproduces the " +
    "brute-force family exactly") {
    val gt = Similarity.probeGroundTruth(spark, TestSpark.Sf0001, 10)
      .orderBy("query_id", "rank").collect().toSeq
    val bf = Similarity.bruteForceTopK(spark, TestSpark.Sf0001)
      .orderBy("query_id", "rank").collect().toSeq
    assert(gt === bf)
  }

  test("recallProbeAt: multi-probe dominates single-probe pointwise, a " +
    "grown table budget dominates the base budget pointwise, and every " +
    "row is internally consistent") {
    val dir = TestSpark.Sf0001
    val n = Tables.embeddings(spark, dir).count()
    val bits = Similarity.bandBits(n)
    def byQ(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("hits"), r.getAs[Long]("n_cand"),
          r.getAs[Double]("recall_at_k"))).toMap
    def probe(tables: Int, multi: Boolean) = {
      val cand = Similarity.probeCandidates(spark, dir, bits, tables,
        multi, nQ = 16).persist()
      try byQ(Similarity.recallProbeAt(spark, dir, cand, nQ = 16)
        .collect().toSeq)
      finally cand.unpersist()
    }
    val single = probe(8, multi = false)
    val multi = probe(8, multi = true)
    val grown = probe(16, multi = false)
    assert(single.keySet === multi.keySet)
    assert(single.keySet === grown.keySet)
    assert(single.nonEmpty)
    single.foreach { case (q, (h, c, r)) =>
      assert(h >= 0 && h <= Similarity.K)
      assert(c >= h, s"query $q: candidates $c < hits $h")
      assert(c <= n - 1)
      assert(r === h.toDouble / Similarity.K)
      // multi-probe candidates are a superset (same keys + flipped keys)
      assert(multi(q)._1 >= h, s"query $q: multi-probe lost recall")
      assert(multi(q)._2 >= c, s"query $q: multi-probe lost candidates")
      // tables 0..7 are a prefix of the 16-table budget (append-only
      // catalog), so the grown candidate set is a superset too
      assert(grown(q)._1 >= h, s"query $q: grown tables lost recall")
      assert(grown(q)._2 >= c, s"query $q: grown tables lost candidates")
    }
  }

  test("recallThetaProfile partitions the exact truth: bucket counts sum " +
    "to nQ*K and bucket hits sum to the per-query hit total") {
    val dir = TestSpark.Sf0001
    val bits = Similarity.bandBits(Tables.embeddings(spark, dir).count())
    val cand = Similarity.probeCandidates(spark, dir, bits, 8,
      multiprobe = false, nQ = 16).persist()
    val (prof, perQ) =
      try (Similarity.recallThetaProfile(spark, dir, cand, nQ = 16).collect(),
        Similarity.recallProbeAt(spark, dir, cand, nQ = 16).collect())
      finally cand.unpersist()
    assert(prof.map(_.getAs[Long]("n_truth")).sum === 16L * Similarity.K)
    assert(prof.map(_.getAs[Long]("hits")).sum ===
      perQ.map(_.getAs[Long]("hits")).sum)
    prof.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("n_truth"))
    }
  }
}
