package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection harness for ARTIFACT PRODUCER pipelines. [[Explain]]
  * prints declared-query plans, but artifact-backed queries plan as a bare
  * parquet scan of the materialized table — the plan an optimization round
  * actually changes is the producer's (the round-5 lesson: plan contracts
  * must be asserted on the producer). This main prints
  * `.explain("formatted")` for the named builders WITHOUT materializing
  * anything (explain never executes, and the builders are invoked directly
  * rather than through the Artifacts layer where possible).
  *
  * Usage: runMain graft.ExplainBuild [sfDir] [name...]
  */
object ExplainBuild {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val builders: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "sim_knn_graph_build" -> (() => operators.Similarity.knnGraphBuild(spark, sfDir)),
      "sim_cosine_pairs_build" -> (() => operators.Similarity.embeddingCosinePairsBuild(spark, sfDir)),
      "sim_srp_bands_build" -> (() => operators.Similarity.srpBandsBuildForExplain(spark, sfDir)),
      "dedup_minhash_pairs_build" -> (() => operators.Dedup.minhashPairsBuildForExplain(spark, sfDir)))
    val names = if (args.length > 1) args.drop(1).toSeq else builders.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      builders(n)().explain("formatted")
    }
    spark.stop()
  }
}
