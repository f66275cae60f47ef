package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Similarity}

/** Round-11: staged decomposition of the two temp-disk-bound sf1
  * differentials. The gate here is textual honesty — the staged final
  * must be the SAME query text as the monolithic oracle the driver runs,
  * with each heavy subtree's verbatim text swapped for its stage table,
  * and each stage must BE that subtree's standalone oracle. */
class StagedOracleSpec extends AnyFunSuite {

  test("staged map covers exactly the two disk-bound differentials") {
    assert(StagedOracles.all.keySet === Set("dedup_cascade", "sim_modularity"))
    StagedOracles.all.foreach { case (name, so) =>
      assert(so.stages.nonEmpty, name)
      so.stages.foreach { case (tbl, _) =>
        assert(so.finalSql.contains(tbl), s"$name final never reads $tbl")
      }
      // the final must not re-inline any heavy subtree
      assert(!so.finalSql.contains("WITH RECURSIVE"), name)
      assert(so.finalSql.length < 5000,
        s"$name staged final should be subtree-free (got ${so.finalSql.length} chars)")
    }
  }

  test("modularity staged final inverts back to the monolithic oracle") {
    val so = StagedOracles.all("sim_modularity")
    val restored = so.finalSql
      .replace("stage_knng", s"(${Similarity.knnGraphSql})")
      .replace("stage_sem", s"(${Similarity.semanticClustersSql})")
    assert(restored === Similarity.modularitySql)
    assert(so.stages.toMap.apply("stage_knng") === Similarity.knnGraphSql)
    assert(so.stages.toMap.apply("stage_sem") === Similarity.semanticClustersSql)
  }

  test("cascade staged final's body is byte-identical to the monolithic " +
    "body; only the closure head and the sem subtree are swapped") {
    val so = StagedOracles.all("dedup_cascade")
    // the monolithic tail from s1 onward, with the sem subtree swapped the
    // same way, must equal the staged final's tail — nothing else changed
    val monoTail = Dedup.cascadeSql
      .replace(s"(\n${Similarity.semanticClustersSql}\n)", "stage_sem")
    val fromS1 = monoTail.substring(monoTail.indexOf("s1 AS ("))
    assert(so.finalSql ===
      "WITH comp AS (SELECT doc_id, component_root FROM stage_comp),\n" + fromS1)
    // stage_comp IS the standalone components oracle (same relation the
    // monolithic head aggregates: MIN(r) per id over the closure)
    assert(so.stages.toMap.apply("stage_comp") === Dedup.componentsSql)
    assert(so.stages.toMap.apply("stage_sem") === Similarity.semanticClustersSql)
  }

  test("stage json is loadable-shaped (quoted, no raw control chars)") {
    val j = StagedOracles.json
    assert(j.startsWith("{") && j.endsWith("}"))
    assert(!j.exists(c => c == '\n' || c == '\r' || c == '\t'))
    assert(j.contains("\"dedup_cascade\"") && j.contains("\"sim_modularity\""))
    assert(j.contains("\"stages\"") && j.contains("\"final\""))
  }
}
