package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Round-18 honesty gates for the optimization rewrites:
  *   - dedup_winnow_pairs' semi-reduce + group-enumerate form equals the
  *     round-17 anti-join + fingerprint self-join form, row for row;
  *   - rel_catalog_columns' driver-side ordinals are 1..n per table in
  *     schema order (the round-17 ADVICE asked for exactly this pin);
  *   - the CPU-budget clamp honors the driver contract (never raises,
  *     clamps only above the effective budget).
  */
class Round18Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("dedup_winnow_pairs equals the round-17 self-join form") {
    val W = 16
    val DfCap = 64
    val fps = Tables.documents(spark, dir)
      .filter(length(col("text")) >= 8 + W - 1)
      .select(col("doc_id"),
        explode(TextFns.winnowFps(col("text"), W)).as("fp"))
    // round-17 body, verbatim: hot-set anti-join + fingerprint self-join
    val hot = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") > DfCap).select(col("fp"))
    val capped = fps.join(broadcast(hot), Seq("fp"), "left_anti")
    val old = capped.as("a")
      .join(capped.as("b"),
        col("a.fp") === col("b.fp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
    val now = operators.Dedup.winnowPairs(spark, dir)
    assert(now.columns.toSeq === Seq("doc_a", "doc_b", "n_shared"))
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
    assert(now.count() > 0) // non-vacuous at sf0.001
  }

  test("rel_catalog_columns ordinals are 1..n per table in schema order") {
    val rows = operators.Relational.catalogColumns(spark, dir)
      .collect()
      .groupBy(_.getString(0))
    assert(rows.keySet.size === 9)
    rows.foreach { case (table, rs) =>
      val ordinals = rs.map(_.getInt(1)).toSeq.sorted
      assert(ordinals === (1 to rs.length), s"$table: $ordinals")
      assert(rs.length <= 5, table)
    }
    // first-5 column names must match the registered view's schema order
    val byName = rows.map { case (t, rs) =>
      t -> rs.sortBy(_.getInt(1)).map(_.getString(2)).toSeq
    }
    val expected = spark.table("silver_sales").schema.fieldNames.take(5).toSeq
    assert(byName("silver_sales") === expected)
  }

  test("sim_kmeans_assign artifact equals the inline Lloyd assignment, " +
    "and the filtered-probe k-means IVF search equals the round-17 form") {
    val art = operators.Similarity.kmeansAssign(spark, dir)
    val inline = operators.Similarity.kmeansAssignInline(spark, dir)
    assert(art.exceptAll(inline).isEmpty && inline.exceptAll(art).isEmpty)
    val now = operators.Similarity.ivfKmeansTopK(spark, dir)
    val old = operators.Similarity.ivfKmeansTopKInline(spark, dir)
    assert(now.columns.toSeq === Seq("query_id", "neighbor_id", "rank", "cos_sim"))
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
    assert(now.count() > 0)
  }

  test("sim_recall_eval tagged-union form equals the round-17 per-method form") {
    import operators.Similarity
    val now = Similarity.recallEval(spark, dir)
    assert(now.columns.toSeq === Seq("method", "query_id", "hits", "recall_at_k"))
    // round-17 body, verbatim: five independent semi-join branches
    val bf = Similarity.bruteForceTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val qs = bf.select(col("query_id")).distinct()
    def one(method: String, ap: org.apache.spark.sql.DataFrame) = {
      val hits = bf
        .join(ap.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("h"))
      qs.join(hits, Seq("query_id"), "left")
        .select(lit(method).as("method"), col("query_id"),
          coalesce(col("h"), lit(0L)).as("hits"),
          (coalesce(col("h"), lit(0L)).cast("double") / Similarity.K)
            .as("recall_at_k"))
    }
    val old = one("ivf", Similarity.ivfTopK(spark, dir))
      .unionByName(one("ivfpq", Similarity.ivfPqTopK(spark, dir)))
      .unionByName(one("lsh", Similarity.lshTopK(spark, dir)))
      .unionByName(one("mplsh", Similarity.multiProbeTopK(spark, dir)))
      .unionByName(one("pq", Similarity.pqTopK(spark, dir)))
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
    assert(now.count() > 0)
  }

  test("text_tfidf_top df-aggregate form equals the round-17 window form") {
    import org.apache.spark.sql.expressions.Window
    val now = operators.TextAnalysis.tfidfTop(spark, dir)
    assert(now.columns.toSeq ===
      Seq("doc_id", "term", "tf", "df", "salience", "rk"))
    // round-17 body, verbatim: df via COUNT(*) OVER (PARTITION BY term)
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(TextFns.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val old = tf
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .withColumn("salience", col("tf").cast("double") / col("df"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("salience").desc, col("term"))))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        col("salience"), col("rk"))
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
    assert(now.count() > 0)
  }

  test("dedup_bbit_minhash tagged metrics equal the round-17 per-method form") {
    import operators.Dedup
    val now = Dedup.bbitMinhash(spark, dir)
    assert(now.columns.toSeq === Seq("method", "n_candidates", "n_truth",
      "tp", "recall_bp", "precision_bp"))
    now.collect() // forces the candidate artifacts to exist
    // this scale sits under the sample target, so truth is unfiltered —
    // assert the regime instead of silently assuming it
    val nDocs = Tables.documents(spark, dir).count()
    assert(nDocs <= 65536L, "test corpus unexpectedly above the bbit sample target")
    val bcand = Artifacts.table(spark, dir, "dedup_bbit_cand")(
      fail("dedup_bbit_cand artifact must pre-exist"))
    val fcand = Artifacts.table(spark, dir, "dedup_bbit_fcand")(
      fail("dedup_bbit_fcand artifact must pre-exist"))
    val truth = Dedup.ngramJaccard(spark, dir).select(col("doc_a"), col("doc_b"))
    // round-17 body, verbatim: per-method scalar aggregates crossJoined
    def metrics(method: String, cand: org.apache.spark.sql.DataFrame) =
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(broadcast(cand.join(truth, Seq("doc_a", "doc_b"), "left_semi")
          .agg(count(lit(1)).as("tp"))))
        .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
        .select(lit(method).as("method"), col("n_candidates"), col("n_truth"),
          col("tp"),
          expr("""case when n_truth = 0 then 0
                  else (tp * 10000) div n_truth end""").as("recall_bp"),
          expr("""case when n_candidates = 0 then 0
                  else (tp * 10000) div n_candidates end""").as("precision_bp"))
    val old = metrics("bbit2", bcand).unionByName(metrics("full", fcand))
    assert(now.exceptAll(old).isEmpty && old.exceptAll(now).isEmpty)
    assert(now.count() === 2)
  }

  test("Cpus.effective honors SPARK_GRAFT_CPUS up to the budget") {
    val eff = Cpus.effective()
    val avail = Runtime.getRuntime.availableProcessors()
    assert(eff >= 1 && eff <= avail)
    // quota parsing: this sandbox has no quota (v1 cfs_quota -1) or a
    // readable one; either way the call must not throw and must be >= 1
    Cpus.cgroupQuotaCores().foreach(q => assert(q >= 1))
  }
}
