package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query cost-anatomy probe (optimization guide §1.1/§7): for each named
  * query, splits one timed `count()` into
  *   - `plan_ms`   — DataFrame construction + analysis + physical planning
  *                   (driver-side, single-threaded),
  *   - `exec_ms`   — the action itself,
  * and reports scheduler-side counters for the action: jobs launched, stages
  * run, tasks run, summed executor run/GC time. The split says WHICH lever a
  * slow query needs: high plan_ms → plan-size/analysis problem (guide §7.3);
  * many jobs → driver round-trips (fold scalar passes / gate collects);
  * exec_ms >> executor_run_ms/cores → scheduling overhead, small-task regime;
  * otherwise real compute.
  *
  * Methodology matches Bench (same session confs, clearCache + one untimed
  * warm-up per query, `count()` action) so numbers are comparable to bench
  * per-query seconds. Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run_main.sh graft.ProbePerf q1,q2,...
  * (or no args = the full declared list). One JSON line per query.
  */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val execRunNs = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = e.taskMetrics
        if (m != null) {
          execRunNs.addAndGet(m.executorRunTime * 1000000L)
          gcMs.addAndGet(m.jvmGCTime)
        }
      }
    })

    val names =
      if (args.nonEmpty) args.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.declared.map(_.name)
    names.foreach { name =>
      spark.catalog.clearCache()
      try SparkEntry.queries(name)(spark, sfDir).count() // warm-up, untimed
      catch { case scala.util.control.NonFatal(_) => () }
      // settle listener counters from the warm-up before the timed pass:
      // drain the async bus to empty (deterministic), not a fixed sleep
      // that late events on a loaded box could outlive (round-17 ADVICE)
      org.apache.spark.GraftSpark.drainListenerBus(spark.sparkContext)
      jobs.set(0); stages.set(0); tasks.set(0); execRunNs.set(0L); gcMs.set(0L)
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan // force analysis + physical planning
      val t1 = System.nanoTime()
      val ok = try { df.count(); true }
        catch { case scala.util.control.NonFatal(_) => false }
      val t2 = System.nanoTime()
      org.apache.spark.GraftSpark.drainListenerBus(spark.sparkContext)
      println(f"""{"query":"$name","ok":$ok,"plan_ms":${(t1 - t0) / 1e6}%.1f,"exec_ms":${(t2 - t1) / 1e6}%.1f,"jobs":${jobs.get()},"stages":${stages.get()},"tasks":${tasks.get()},"executor_run_ms":${execRunNs.get() / 1e6}%.0f,"gc_ms":${gcMs.get()}}""")
    }
    spark.stop()
  }
}
