package graft

import org.apache.spark.sql.SparkSession

/** Band-geometry scaling probe PAST the old 2¹⁶-bit ceiling — the
  * round-13 verdict's top directive. PROBE_sf6/sf10 extended the ANN
  * artifact curve to 200k vectors by building the full cosine-pair and
  * kNN artifacts; past ~10⁷ vectors those builds are hours of local
  * compute EVEN WHEN LINEAR (the design target is ~256·n candidate rows
  * per table — at 24M vectors that is ~5×10¹⁰ rows across 8 tables), so
  * this probe measures the quantity that decides the asymptotics
  * directly instead: per-table bucket occupancy and Σ|bucket|² of the
  * BUILT band artifact — exactly the banded self-join's candidate
  * volume. Linear ANN ⇔ Σ|b|²/n stays bounded as n grows; the
  * frozen-geometry counterfactual (forced 16 bits on the same corpus)
  * shows the amplification the round-14 MaxBits lift removes.
  *
  * Usage: tools/run_main.sh graft.ProbeBands <sfDir> [forcedBits ...]
  * Prints one JSON line per geometry (the adaptive choice first, then
  * each forced width). Artifacts land in the per-JVM temp root, so every
  * run times a COLD band build.
  */
object ProbeBands {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(sys.error("usage: ProbeBands <sfDir> [forcedBits ...]"))
    val forced = args.drop(1).map(_.toInt).toSeq
    // $SPARK_GRAFT_CPUS clamped to the effective cgroup/processor budget
    // (round-18, verdict item 1): local[N] far above the granted CPUs
    // oversubscribes the scheduler and degrades every CPU-bound task
    val cpus = Cpus.effectiveStr()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = Tables.embeddings(spark, sfDir).count()
    val runs = (operators.Similarity.bandBits(n), "adaptive") +:
      forced.map(b => (b, "forced"))
    runs.foreach { case (bits, mode) =>
      val t0 = System.nanoTime()
      val rows = operators.Similarity.bandOccupancyAt(spark, sfDir, bits)
        .collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val sumSq = rows.map(_.getAs[Long]("sum_sq")).sum
      val buckets = rows.map(_.getAs[Long]("n_buckets")).sum
      val maxOcc = rows.map(_.getAs[Long]("max_occ")).maxOption.getOrElse(0L)
      val amp = rows.map(r => r.getAs[Long]("sum_sq").toDouble /
        math.max(1L, r.getAs[Long]("n_vectors"))).maxOption.getOrElse(0.0)
      println(s"""{"probe":"band_occupancy","sf_dir":"$sfDir","mode":"$mode",""" +
        s""""n_vectors":$n,"bits":$bits,"tables":${rows.length},""" +
        s""""nonempty_buckets":$buckets,"max_occ":$maxOcc,""" +
        s""""sum_sq":$sumSq,"max_table_amp":$amp,"build_sec":$sec}""")
    }
    spark.stop()
  }
}
