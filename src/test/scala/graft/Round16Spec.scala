package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Round-16 directives: planted-pair recall at the near-duplicate
  * operating point (the round-15 verdict's "What's missing" #2 — the
  * θ-profile buckets above cos 0.65 held 1-10 natural samples, so
  * tight-θ recall was asserted, not measured) and the staged-oracle
  * decompositions that closed the sf6 disk-bound cells (whose byte-level
  * assembly identities live in StagedOracleSpec).
  */
class Round16Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("plantedNeighbors: exact cosine at every grid point, unit norm, " +
    "full grid coverage, deterministic") {
    val rows = Similarity.plantedNeighbors(spark, dir, nQ = 8, perCell = 3)
      .collect()
    assert(rows.length === 8 * Similarity.PlantedCosBp.size * 3)
    rows.foreach { r =>
      val bp = r.getAs[Int]("cos_bp")
      val target = bp / 100.0
      val actual = r.getAs[Double]("cos_actual")
      // the rotation realizes the target cosine to float-op rounding
      assert(math.abs(actual - target) < 1e-9,
        s"cos_bp=$bp realized $actual")
      val v = r.getAs[scala.collection.Seq[Double]]("v")
      assert(v.length === 64)
      val norm = math.sqrt(v.map(x => x * x).sum)
      // ||v||² = c² + (1−c²) = 1 when q̂ and r̂⊥ are orthonormal
      assert(math.abs(norm - 1.0) < 1e-9, s"norm $norm")
    }
    // grid coverage: every (query, bucket, rep) cell present exactly once
    val cells = rows.map(r => (r.getAs[Long]("query_id"),
      r.getAs[Int]("cos_bp"), r.getAs[Int]("rep")))
    assert(cells.distinct.length === cells.length)
    // determinism: a second run produces identical vectors
    val again = Similarity.plantedNeighbors(spark, dir, nQ = 8, perCell = 3)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("cos_bp"),
        r.getAs[Int]("rep")) -> r.getAs[scala.collection.Seq[Double]]("v"))
      .toMap
    rows.foreach { r =>
      val k = (r.getAs[Long]("query_id"), r.getAs[Int]("cos_bp"),
        r.getAs[Int]("rep"))
      assert(again(k) === r.getAs[scala.collection.Seq[Double]]("v"))
    }
  }

  test("plantedThetaRecall: one row per grid bucket with the full pair " +
    "count, recall in [0,1], and budget dominance (multi-probe and grown " +
    "tables can only add collisions)") {
    val n = Tables.embeddings(spark, dir).count()
    val bits = Similarity.bandBits(n)
    def byBucket(tables: Int, multi: Boolean) =
      Similarity.plantedThetaRecall(spark, dir, bits, tables, multi,
        nQ = 8, perCell = 3)
        .collect()
        .map(r => r.getAs[Double]("cos_target") ->
          (r.getAs[Long]("n_pairs"), r.getAs[Long]("hits"),
            r.getAs[Double]("recall"))).toMap
    val single = byBucket(8, multi = false)
    val multi = byBucket(8, multi = true)
    val grown = byBucket(16, multi = false)
    val grid = Similarity.PlantedCosBp.map(_ / 100.0)
    assert(single.keySet === grid.toSet)
    grid.foreach { c =>
      val (np, h, rec) = single(c)
      assert(np === 8L * 3)
      assert(h >= 0 && h <= np)
      assert(rec === h.toDouble / np)
      // the multi-probe key set contains the single-probe keys, and
      // tables 0..7 are a prefix of the 16-table catalog: collision is
      // monotone in the probe-key set, so dominance holds PER PAIR —
      // bucket hits can only grow
      assert(multi(c)._2 >= h, s"bucket $c: multi-probe lost hits")
      assert(grown(c)._2 >= h, s"bucket $c: grown tables lost hits")
    }
    // mean realized cosine tracks the target at every bucket
    Similarity.plantedThetaRecall(spark, dir, bits, 8, multiprobe = false,
      nQ = 8, perCell = 3).collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("mean_cos_actual") -
        r.getAs[Double]("cos_target")) < 1e-9)
    }
  }

  test("pair-detector grown-table schedule: integer thresholds mirrored " +
    "verbatim in the oracle CASE, inert at every oracle-swept scale") {
    // the schedule (measured by the planted probes at 1.2M/12M vectors)
    assert(Similarity.pairTablesFor(4096L) === 4)
    assert(Similarity.pairTablesFor(4097L) === 8)
    assert(Similarity.pairTablesFor(Similarity.PairGrow16Rows) === 8)
    assert(Similarity.pairTablesFor(Similarity.PairGrow16Rows + 1) === 16)
    assert(Similarity.pairTablesFor(Similarity.PairGrow32Rows) === 16)
    assert(Similarity.pairTablesFor(Similarity.PairGrow32Rows + 1) === 32)
    // oracle mirror: the same integers in the same CASE order
    assert(Similarity.embeddingCosinePairsSql.contains(
      s"CASE WHEN c <= 4096 THEN 4 " +
        s"WHEN c <= ${Similarity.PairGrow16Rows} THEN 8 " +
        s"WHEN c <= ${Similarity.PairGrow32Rows} THEN 16 ELSE 32 END"))
    // the grown regimes need the grown plane catalog in the VALUES block
    assert(Similarity.embeddingCosinePairsSql.contains("(31, 0, "))
    // every oracle-swept corpus (<= 300k docs at sf6) stays in the 4/8
    // regimes, so the schedule cannot move a swept result
    assert(Similarity.PairGrow16Rows > 400000L)
    // the grown budgets stay inside the injective catalog (Round15Spec
    // pins planeIdx injectivity over 32 tables)
    assert(Similarity.pairTablesFor(Long.MaxValue) <= 32)
  }
}
