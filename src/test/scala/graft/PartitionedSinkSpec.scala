package graft

import graft.operators.Medallion
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** 100 TB sink posture: the gold rollup written partitioned by (year,
  * month), and reads with a partition predicate must prune at the
  * PartitionFilters level — never scan-and-discard. */
class PartitionedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("gold_sales_summary partitioned write prunes on read") {
    val out = Files.createTempDirectory("graft-part").toString + "/sales_summary"
    Medallion.goldSalesSummary(spark, TestSpark.Sf0001)
      .write.partitionBy("year", "month").mode("overwrite").parquet(out)

    val back = spark.read.parquet(out).filter(col("year") === 1996 && col("month") === 3)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") &&
      (plan.contains("(year#") || plan.contains("isnotnull(year")), plan.take(600))
    // pruned scan must read only the matching partition directories
    val scanned = back.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(!scanned.contains("year=1995"), "scan must not touch pruned partitions")

    // round-trip fidelity for the selected slice
    val direct = Medallion.goldSalesSummary(spark, TestSpark.Sf0001)
      .filter(col("year") === 1996 && col("month") === 3)
      .select("channel", "region", "total_transactions")
      .collect().map(_.toSeq).toSet
    val viaSink = back.select("channel", "region", "total_transactions")
      .collect().map(_.toSeq).toSet
    assert(direct == viaSink)
  }
}
