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

  // ---- round-17 optimization equivalences ----

  test("native dotFast is bit-identical to the HOF dot fold") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFns
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), VectorFns.toDouble(col("embedding")).as("v"))
    val mism = e.select(
        VectorFns.dot(col("v"), col("v")).as("hof"),
        VectorFns.dotFast(col("v"), col("v")).as("native"))
      // bit-level comparison: NaN-safe via the eqNullSafe of raw doubles
      // is not enough for -0.0 vs 0.0 — compare the IEEE bit patterns
      .filter(expr("cast(hof as string) <> cast(native as string)"))
      .count()
    assert(mism == 0L, s"$mism rows where dotFast diverges from the HOF dot")
  }

  test("native arrayEqCount matches the zip_with+aggregate signature count") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFns
    // arbitrary long arrays with ties: pairs of shuffled id-derived values
    val df = spark.range(0, 500).selectExpr(
      "array(id % 7, id % 3, id % 7, 42L, id) as a",
      "array(id % 7, id % 5, (id + 1) % 7, 42L, id) as b")
    val mism = df.select(
        VectorFns.arrayEqCount(col("a"), col("b")).as("native"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => (x === y).cast("int")),
          lit(0), (acc, v) => acc + v).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(mism == 0L)
  }

  test("knnGraphBuild (unordered-pair scoring) equals the two-sided reference form") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorFns._
    // the pre-round-17 pipeline, inlined as the reference: ordered candidate
    // pairs in both directions, each direction scored independently
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val opt = Similarity.knnGraphBuild(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    // recompute the band relation through the same deterministic producer
    // (content-identical to the materialized artifact the build read)
    val n = e.count()
    val bands = Similarity.srpBandsBuild(spark, dir,
      tables = 8, bits = Similarity.bandBits(n))
    val cand = bands.as("x")
      .join(bands.as("y"),
        col("x.tbl") === col("y.tbl") && col("x.bkey") === col("y.bkey") &&
          col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("src_id"), col("y.vec_id").as("neighbor_id"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cos_sim").desc, col("neighbor_id"))
    val ref = cand
      .join(e.select(col("vec_id").as("sv"), col("v").as("va")), col("src_id") === col("sv"))
      .drop("sv")
      .join(e.select(col("vec_id").as("nv"), col("v").as("vb")), col("neighbor_id") === col("nv"))
      .drop("nv")
      .select(col("src_id").as("vec_id"), col("neighbor_id"),
        cosineFast(col("va"), col("vb")).as("cos_sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("vec_id"), col("neighbor_id"), col("rank"), col("cos_sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(opt == ref,
      s"optimized kNN graph diverges: only-opt=${(opt -- ref).take(5)} " +
        s"only-ref=${(ref -- opt).take(5)}")
  }
}
