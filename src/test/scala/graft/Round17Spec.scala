package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

/** Round-17 directive: hash-verify the grown 16/32-table pair-detector
  * regime. The full pair differential past 2²⁰ vectors is disk-infeasible
  * on either engine (the band self-join carries Σ occ·(occ−1)/2 ≈
  * n·256·tables/2 candidate pairs — the audit's `cand_pairs` column
  * measures it), but everything the sweeps never reached — the grown
  * plane catalog and the table-budget CASE — lives UPSTREAM of that join
  * in the bands CTE, which is linear. `dedup_pair_band_audit`
  * hash-verifies that relation differentially; this spec pins the audit
  * against an independent driver-side recomputation and the byte-identity
  * honesty link to the pair family's shared CTE text.
  */
class Round17Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("pairBandAudit matches an independent driver-side recomputation " +
    "(band keys, occupancy, candidate count, digests) at sf0.001") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toArray))
    val n = emb.length.toLong
    val tables = Similarity.pairTablesFor(n)
    val bits = Similarity.bandBits(n)
    // recompute every band row with the same left-to-right double fold
    // the engines use (dot's sequential aggregate; planeCoef is pure)
    val rows = for {
      (id, v) <- emb.toSeq
      t <- 0 until tables
    } yield {
      var bkey = 0L
      for (j <- 0 until bits) {
        var acc = 0.0
        var d = 0
        while (d < 64) {
          acc += v(d) * Similarity.planeCoef(Similarity.planeIdx(t, j), d)
          d += 1
        }
        if (acc > 0) bkey |= (1L << j)
      }
      (t, id, bkey)
    }
    val expect = rows.groupBy(_._1).map { case (t, rs) =>
      val occ = rs.groupBy(_._3).map(_._2.size.toLong).toSeq
      val d1 = rs.map { case (_, id, bk) =>
        (id * 2654435761L + bk * 40503L) % 2147483648L }.sum
      val d2 = rs.map { case (_, id, bk) =>
        (id * 1779033703L + bk * 104729L) % 2147483648L }.sum
      t -> ((rs.size.toLong, occ.size.toLong, occ.max,
        occ.map(o => o * (o - 1) / 2).sum, d1, d2))
    }
    val got = Similarity.pairBandAudit(spark, dir).collect()
    assert(got.length === tables)
    got.foreach { r =>
      val t = r.getAs[Int]("tbl")
      val (nr, nb, mo, cp, d1, d2) = expect(t)
      assert(r.getAs[Long]("n_rows") === nr, s"tbl $t n_rows")
      assert(r.getAs[Long]("n_buckets") === nb, s"tbl $t n_buckets")
      assert(r.getAs[Long]("max_occ") === mo, s"tbl $t max_occ")
      assert(r.getAs[Long]("cand_pairs") === cp, s"tbl $t cand_pairs")
      assert(r.getAs[Long]("digest1") === d1, s"tbl $t digest1")
      assert(r.getAs[Long]("digest2") === d2, s"tbl $t digest2")
    }
  }

  test("pairBandAuditSql embeds the pair family's bands CTE byte-verbatim") {
    assert(
      Similarity.pairBandAuditSql.startsWith(Similarity.cosinePairsHeadSql),
      "the audit oracle must reuse cosinePairsHeadSql so the audited " +
        "bands text is the text every pair-family oracle executes")
  }
}
