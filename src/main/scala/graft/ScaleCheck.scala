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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
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

    spark.stop()
    if (failed) sys.exit(1)
  }
}
