package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe (NOT committed): anatomy of events_dau_wau. */
object TmpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
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
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      val t1 = System.nanoTime(); f
      val t2 = System.nanoTime()
      println(f"$label%-40s run1 ${(t1 - t0) / 1e6}%8.1f ms   run2 ${(t2 - t1) / 1e6}%8.1f ms")
    }
    // full query (warm cache via first run)
    spark.catalog.clearCache()
    t("dau_wau full")(operators.EventTime.dauWau(spark, sfDir).count())
    // pieces
    val du = Tables.events(spark, sfDir)
      .select(datediff(to_date(col("ts")), lit("1970-01-01")).as("day"), col("user_id"))
      .distinct()
    t("du.count (no persist)")(du.count())
    println("du rows = " + du.count())
    val duP = du.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    duP.count()
    t("du cached count")(duP.count())
    t("dau agg from cache")(duP.groupBy(col("day")).agg(count(lit(1))).count())
    t("wau explode+agg from cache")(
      duP.select(explode(sequence(lit(0), lit(6))).as("off"), col("day"), col("user_id"))
        .select((col("day") + col("off")).as("day"), col("user_id"))
        .groupBy(col("day")).agg(count_distinct(col("user_id")).as("wau")).count())
    t("events scan count")(Tables.events(spark, sfDir).count())
    t("events full-col distinct day/user")(
      Tables.events(spark, sfDir)
        .select(datediff(to_date(col("ts")), lit("1970-01-01")).as("day"), col("user_id"))
        .distinct().count())
    spark.stop()
  }
}
