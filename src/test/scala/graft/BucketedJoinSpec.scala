package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Co-located fact⋈fact join via bucketing — the 100 TB pattern for joins
  * too big to broadcast: both tables pre-bucketed on the join key means the
  * join runs with ZERO exchanges, every run, forever. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed lineitem ⋈ orders plans with no shuffle") {
    val loc = Files.createTempDirectory("graft-buckets").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graftbuckets LOCATION '$loc'")
    Tables.lineitem(spark, TestSpark.Sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("graftbuckets.lineitem_b")
    Tables.orders(spark, TestSpark.Sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("graftbuckets.orders_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
      val li = spark.table("graftbuckets.lineitem_b")
      val o = spark.table("graftbuckets.orders_b")
      // plan contract on the bare join: neither input shuffles (the only
      // exchange downstream of an agg would be the agg's own)
      val bare = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .select(li("l_orderkey"), o("o_orderstatus"))
      bare.collect()
      val plan = bare.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle either side:\n" + plan.take(1200))
      assert(plan.contains("SelectedBucketsCount"), "scan must be bucket-aware")

      // same result as the unbucketed join
      val direct = Tables.lineitem(spark, TestSpark.Sf0001)
        .join(Tables.orders(spark, TestSpark.Sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bucketed = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(o("o_orderstatus")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(direct == bucketed)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
