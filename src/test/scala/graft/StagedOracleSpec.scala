package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Round-11: staged decompositions of the DuckDB-cost-bound sf1 oracle
  * class. The gate here is textual honesty — every staged final must be
  * the SAME query text as the monolithic oracle the driver runs, with
  * each heavy subtree's verbatim text swapped for its stage-table read,
  * and each stage must be that subtree's standalone oracle (or the same
  * surgery applied one level down). */
class StagedOracleSpec extends AnyFunSuite {

  private val exclusionClass = Set(
    "dedup_cascade", "sim_modularity", "sim_knn_graph",
    "sim_semantic_clusters", "sim_pagerank", "sim_triangles", "sim_kcore",
    "sim_neighbor_jaccard", "sim_assortativity", "dedup_weighted_jaccard",
    "dedup_threshold_sweep", "dedup_bbit_minhash", "dedup_modality_agreement")

  test("staged map covers exactly the sf1 DuckDB-cost-bound class") {
    assert(StagedOracles.all.keySet === exclusionClass)
    StagedOracles.all.foreach { case (name, so) =>
      assert(so.stages.nonEmpty, name)
      // the final must read the LAST stage (earlier ones may only feed
      // later stages — e.g. stage_sh feeds stage_shf, never the final)
      assert(so.finalSql.contains(so.stages.last._1),
        s"$name final never reads ${so.stages.last._1}")
      // every staged query except the trivial closure-output reads must
      // keep a final far smaller than re-inlining any heavy subtree
      assert(!so.finalSql.contains("regexp_split_to_array"),
        s"$name final re-inlines the shingle scan")
      assert(!so.finalSql.contains("embedding::DOUBLE[]"),
        s"$name final re-inlines the embedding scan")
    }
  }

  test("every declared staged query has a monolithic oracle with the same key") {
    val oracles = SparkEntry.oracleSql
    StagedOracles.all.keys.foreach(k => assert(oracles.contains(k), k))
  }

  test("stage tables are shared by content: same name means same sql") {
    val byName = StagedOracles.all.values.flatMap(_.stages).toSeq
      .groupBy(_._1).map { case (t, ss) => t -> ss.map(_._2).distinct }
    byName.foreach { case (t, sqls) =>
      assert(sqls.size === 1, s"stage $t has ${sqls.size} distinct builds")
    }
    // dependency order holds inside every stage list: a stage referencing
    // another stage table appears after it
    StagedOracles.all.foreach { case (name, so) =>
      val names = so.stages.map(_._1)
      so.stages.zipWithIndex.foreach { case ((t, sql), i) =>
        names.drop(i + 1).foreach { later =>
          assert(!sql.contains(later), s"$name: stage $t reads later stage $later")
        }
      }
    }
  }

  test("graph-family finals invert back to the monolithic oracles") {
    def restore(name: String, wrapped: Boolean): String = {
      val sub =
        if (wrapped) s"(\n${Similarity.knnGraphSql}\n)"
        else s"(${Similarity.knnGraphSql})"
      StagedOracles.all(name).finalSql.replace("stage_knng", sub)
    }
    assert(restore("sim_pagerank", wrapped = false) === Similarity.pagerankSql)
    assert(restore("sim_triangles", wrapped = false) === Similarity.trianglesSql)
    assert(restore("sim_kcore", wrapped = true) === Similarity.kcoreSql)
    assert(restore("sim_neighbor_jaccard", wrapped = true) ===
      Similarity.neighborJaccardSql)
    assert(restore("sim_assortativity", wrapped = true) ===
      Similarity.assortativitySql)
  }

  test("modularity staged final inverts back to the monolithic oracle") {
    val so = StagedOracles.all("sim_modularity")
    val restored = so.finalSql
      .replace("stage_knng", s"(${Similarity.knnGraphSql})")
      .replace("stage_sem", s"(${Similarity.semanticClustersSql})")
    assert(restored === Similarity.modularitySql)
    assert(so.stages.toMap.apply("stage_knng") === Similarity.knnGraphSql)
    // stage_sem is the monolithic semantic-cluster oracle with its
    // embedded cosine-pair subtree redirected to stage_cospairs
    assert(so.stages.toMap.apply("stage_sem")
      .replace("p AS (SELECT * FROM stage_cospairs)",
        s"p AS (\n${Similarity.embeddingCosinePairsSql}\n)") ===
      Similarity.semanticClustersSql)
    assert(so.stages.toMap.apply("stage_cospairs") ===
      Similarity.embeddingCosinePairsSql)
  }

  test("cascade staged final's body is byte-identical to the monolithic " +
    "body; only the closure head and the sem subtree are swapped") {
    val so = StagedOracles.all("dedup_cascade")
    val monoTail = Dedup.cascadeSql
      .replace(s"(\n${Similarity.semanticClustersSql}\n)", "stage_sem")
    val fromS1 = monoTail.substring(monoTail.indexOf("s1 AS ("))
    assert(so.finalSql ===
      "WITH comp AS (SELECT doc_id, component_root FROM stage_comp),\n" + fromS1)
    assert(so.stages.toMap.apply("stage_comp") === Dedup.componentsSql)
  }

  test("shingle-family finals invert back to the monolithic oracles") {
    val shfPrefix =
      s"WITH ${Dedup.shingleIndexSql},\n${Dedup.cappedShingleIndexSql},"
    val interDef =
      """inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        |          FROM shf a JOIN shf b
        |            ON a.h = b.h AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)""".stripMargin
    def unswapShf(s: String): String = s
      .replace("WITH sh AS (SELECT doc_id, h FROM stage_sh),\n" +
        "shf AS (SELECT doc_id, h FROM stage_shf),", shfPrefix)
      .replace("WITH shf AS (SELECT doc_id, h FROM stage_shf),", shfPrefix)
      .replace("inter AS (SELECT doc_a, doc_b, n_common FROM stage_inter)",
        interDef)
    assert(unswapShf(StagedOracles.all("dedup_weighted_jaccard").finalSql) ===
      Dedup.weightedJaccardSql)
    assert(unswapShf(StagedOracles.all("dedup_threshold_sweep").finalSql) ===
      Dedup.thresholdSweepSql)
    assert(unswapShf(StagedOracles.all("dedup_bbit_minhash").finalSql) ===
      Dedup.bbitMinhashSql)
    val ma = StagedOracles.all("dedup_modality_agreement").finalSql
      .replace("stage_lexpairs", s"(\n${Dedup.ngramJaccardSql}\n)")
      .replace("stage_cospairs", s"(\n${Similarity.embeddingCosinePairsSql}\n)")
    assert(ma === Dedup.modalityAgreementSql)
  }

  test("closure-output finals project exactly the monolithic output columns") {
    assert(StagedOracles.all("sim_knn_graph").finalSql ===
      "SELECT vec_id, neighbor_id, rank, cos_sim FROM stage_knng " +
        "ORDER BY vec_id, rank")
    assert(StagedOracles.all("sim_semantic_clusters").finalSql ===
      "SELECT vec_id, cluster_root, cluster_size FROM stage_sem " +
        "ORDER BY vec_id")
    // and the monolithic oracles do produce those columns in that order
    assert(Similarity.knnGraphSql.contains(
      "SELECT vec_id, neighbor_id, rank, cos_sim"))
    assert(Similarity.semanticClustersSql.contains(
      "SELECT id AS vec_id, comp.comp AS cluster_root, cluster_size"))
  }

  test("stage json is loadable-shaped (quoted, no raw control chars)") {
    val j = StagedOracles.json
    assert(j.startsWith("{") && j.endsWith("}"))
    assert(!j.exists(c => c == '\n' || c == '\r' || c == '\t'))
    assert(j.contains("\"dedup_cascade\"") && j.contains("\"sim_modularity\""))
    assert(j.contains("\"stages\"") && j.contains("\"final\""))
  }
}
