package graft

import graft.operators.{Dedup, Similarity}

/** A monolithic oracle decomposed into sequential DuckDB stages.
  *
  * Two differentials (`dedup_cascade`, `sim_modularity`) embed TWO heavy
  * subtrees each (the recursive component closure / the banded kNN graph /
  * the semantic-cluster closure) inside ONE statement. DuckDB evaluates
  * the whole tree under a single out-of-core plan, holding every
  * subtree's hash/spill state concurrently — at sf1 that exhausted the
  * temp volume twice (rounds 9 and 10, "No space left on device"), even
  * though each subtree's standalone oracle runs fine at sf1
  * (`dedup_components` and `sim_knn_classifier` both passed the r10 sf1
  * sweep). The staged form materializes each subtree as an on-disk table
  * SEQUENTIALLY — temp state is freed between stages, shared subtrees
  * compute once — then runs a cheap final over the staged tables.
  *
  * Honesty invariant: the final SQL is derived TEXTUALLY from the same
  * monolithic oracle string the driver's sf0.01 gate runs, with each
  * staged subtree's verbatim text swapped for its stage-table name
  * ([[swap]] refuses surgery when the subtree is not found verbatim), and
  * each stage's SQL IS the standalone oracle of that subtree. Nothing is
  * re-derived from the Spark implementation. `tools/compare.py` executes
  * these under `GRAFT_STAGED_ORACLE=1` for the sf≥1 sweeps; the driver's
  * own gate keeps using the untouched monolithic `oracleSql`.
  */
final case class StagedOracle(stages: Seq[(String, String)], finalSql: String)

object StagedOracles {

  /** Verbatim-subtree swap; refuses to "succeed" silently when the
    * monolithic text drifts away from the subtree val it embeds. */
  private def swap(sql: String, subtree: String, table: String): String = {
    require(sql.contains(subtree),
      s"staged-oracle surgery: subtree for $table not embedded verbatim")
    sql.replace(subtree, table)
  }

  /** sim_modularity = und(knnGraph) × assign(semanticClusters) × two
    * community-bounded aggregates; both heavy subtrees are embedded as
    * direct `($sql)` parenthesized subqueries. */
  private[graft] val modularityStaged: StagedOracle = StagedOracle(
    stages = Seq(
      "stage_knng" -> Similarity.knnGraphSql,
      "stage_sem" -> Similarity.semanticClustersSql),
    finalSql = swap(
      swap(Similarity.modularitySql, s"(${Similarity.knnGraphSql})", "stage_knng"),
      s"(${Similarity.semanticClustersSql})", "stage_sem"))

  /** dedup_cascade = exact-hash stage + component closure + semantic
    * closure. The semantic subtree is a `(\n$sql\n)` subquery; the
    * component closure is the `WITH RECURSIVE … reach … comp AS (…)` head,
    * replaced as a unit by the staged `dedup_components` oracle table
    * (same relation: `componentsSql` is exactly that head + the MIN(r)
    * aggregate + ORDER BY). */
  private[graft] val cascadeStaged: StagedOracle = {
    val semSwapped = swap(Dedup.cascadeSql,
      s"(\n${Similarity.semanticClustersSql}\n)", "stage_sem")
    val marker = ",\ncomp AS (SELECT id AS doc_id, MIN(r) AS component_root"
    require(semSwapped.contains(marker),
      "staged-oracle surgery: cascade component-closure head not found")
    val tail = semSwapped.indexOf("s1 AS (")
    require(tail > semSwapped.indexOf(marker),
      "staged-oracle surgery: cascade body not after the closure head")
    StagedOracle(
      stages = Seq(
        "stage_comp" -> Dedup.componentsSql,
        "stage_sem" -> Similarity.semanticClustersSql),
      finalSql =
        "WITH comp AS (SELECT doc_id, component_root FROM stage_comp),\n" +
          semSwapped.substring(tail))
  }

  /** Every staged decomposition, keyed like [[SparkEntry.oracleSql]]. */
  def all: Map[String, StagedOracle] = Map(
    "sim_modularity" -> modularityStaged,
    "dedup_cascade" -> cascadeStaged)

  /** JSON for `oracle_stage_sql.json`:
    * `{query: {"stages": [[table, sql]…], "final": sql}}`. */
  def json: String = {
    def q(s: String) = Jsons.quote(s)
    all.toSeq.sortBy(_._1).map { case (name, so) =>
      val stages = so.stages
        .map { case (t, s) => s"[${q(t)},${q(s)}]" }.mkString("[", ",", "]")
      s"${q(name)}: {${q("stages")}: $stages, ${q("final")}: ${q(so.finalSql)}}"
    }.mkString("{", ",", "}")
  }
}
