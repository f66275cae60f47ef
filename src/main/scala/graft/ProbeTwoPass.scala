package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TwoPass skew refinement engaged at PRODUCTION settings — closes the
  * round-14 directive carried through round 15: every committed
  * `skew_refinement` gate run forces buckets=256 / a lowered refinement
  * floor on small corpora, so the hot-bucket path had never been observed
  * at the default gate (2²⁰ rows), default bucket count
  * ([[operators.TwoPass.bucketsFor]]), and default refinement floor
  * ([[operators.TwoPass.RowsPerBucket]]).
  *
  * The probe relation is the 12M-vector corpus's (vec_id, label)
  * projection put through the global `ntile(k)` — the quantile bucketing
  * every curation sampler runs on a low-cardinality score. A 10-value
  * order column is the documented Zipf-modal shape: equal-width range
  * bucketing lands each label's ~1.2M rows in ONE bucket (≫ 4× the
  * 32,768-row refinement target), so the pure-bucket tie-split path MUST
  * engage organically — no forced parameters anywhere.
  *
  * A second relation runs the integer-keyed [[operators.TwoPass.prefixSum]]
  * over the same corpus keyed by the quantized first coordinate (unique
  * composite key `q·2²⁴ + vec_id mod 2²⁴` — the standard
  * quantize-plus-tiebreak idiom): coordinate values are bell-shaped, so
  * this reports how much skew a CONTINUOUS organic distribution feeds the
  * refinement plan (the control lane; engagement is expected from the
  * ntile lane).
  *
  * Both lanes assert VALUE EQUALITY against the single-task global window
  * (the semantic spec) on the full relation before printing stats — the
  * probe is evidence only when refined ≥ 1 AND mismatches = 0.
  *
  * Usage: tools/run_main.sh graft.ProbeTwoPass <sfDir> [k]
  * Prints one JSON line per lane.
  */
object ProbeTwoPass {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.error("usage: ProbeTwoPass <sfDir> [k]"))
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(100)
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

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        element_at(col("embedding"), 1).cast("double").as("c0"))
      .persist() // the input-cost contract: the helpers re-scan 3-4x
    val n = emb.count()
    val gate = operators.TwoPass.WindowGateRows
    require(n > gate,
      s"ProbeTwoPass: $sfDir holds $n rows <= the $gate-row gate — " +
        "the production regime needs an over-gate corpus (sf600emb+)")
    // lane 2's composite key packs pmod(vec_id, 2^24) as the tiebreak:
    // past 2^24 rows distinct vec_ids collide into one key, the prefix-sum
    // ranks become order-dependent, and the mismatch join on "key" turns
    // many-to-many — the probe would MISREPORT equality. Fail loudly
    // instead (round-16 advice).
    require(n <= (1L << 24),
      s"ProbeTwoPass: $sfDir holds $n rows > 2^24 — lane 2's " +
        "vec_id-mod-2^24 tiebreak would collide; widen the tiebreak " +
        "field before probing corpora this large")

    // ---- lane 1: ntile over the 10-value label (Zipf-modal shape) ----
    val t0 = System.nanoTime()
    val (tiled, st) = operators.TwoPass.distributedNtileDescStats(
      emb, "label", "vec_id", k, "tile") // ALL defaults: buckets=0, floor
    val tiledP = tiled.select(col("vec_id"), col("tile")).persist()
    tiledP.count()
    val distSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val wRef = Window.orderBy(col("label").desc, col("vec_id"))
    val ref = emb.withColumn("tile_ref", ntile(k).over(wRef))
      .select(col("vec_id"), col("tile_ref"))
    val mismatches = tiledP.join(ref, "vec_id")
      .filter(col("tile") =!= col("tile_ref")).count()
    val refSec = (System.nanoTime() - t1) / 1e9
    tiledP.unpersist()
    println(s"""{"probe":"twopass_production","lane":"ntile_label",""" +
      s""""sf_dir":"$sfDir","n":$n,"k":$k,"gate":$gate,""" +
      s""""buckets":${st.buckets},"refined":${st.refined},""" +
      s""""groups":${st.groups},"max_group":${st.maxGroup},""" +
      s""""mismatches":$mismatches,"value_equal":${mismatches == 0L},""" +
      s""""dist_sec":$distSec,"single_task_ref_sec":$refSec}""")

    // ---- lane 2 (control): integer-keyed prefix sum, bell-shaped key --
    val keyed = emb.select(
      (floor(col("c0") * 1000000).cast("long") * (1L << 24) +
        pmod(col("vec_id"), lit(1L << 24))).as("key"),
      lit(1L).as("one")).persist()
    keyed.count()
    val t2 = System.nanoTime()
    val (summed, st2) = operators.TwoPass.distributedPrefixSumStats(
      keyed, "key", "one", "rank0") // defaults again
    val sumP = summed.persist()
    sumP.count()
    val dist2 = (System.nanoTime() - t2) / 1e9
    val wSum = Window.orderBy(col("key"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val refSum = keyed.withColumn("rank_ref",
      coalesce(sum(col("one")).over(wSum).cast("long"), lit(0L)))
    val mism2 = sumP.join(refSum.select(col("key"), col("rank_ref")), "key")
      .filter(col("rank0") =!= col("rank_ref")).count()
    println(s"""{"probe":"twopass_production","lane":"prefix_sum_quantized",""" +
      s""""sf_dir":"$sfDir","n":$n,"gate":$gate,""" +
      s""""buckets":${st2.buckets},"refined":${st2.refined},""" +
      s""""groups":${st2.groups},"max_group":${st2.maxGroup},""" +
      s""""mismatches":$mism2,"value_equal":${mism2 == 0L},""" +
      s""""dist_sec":$dist2}""")
    spark.stop()
  }
}
