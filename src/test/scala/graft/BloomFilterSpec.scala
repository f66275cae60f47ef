package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the engine-level lever for the one
  * real shuffle in the schema (lineitem ⋈ orders, fact × fact): when one
  * side carries a selective filter, Catalyst injects a bloom filter built
  * from the filtered side's join keys into the OTHER side's scan, so most
  * non-matching fact rows die before the exchange. The default size
  * thresholds target cluster-scale inputs, so the spec lowers them to
  * demonstrate the injection on test data; at 100 TB the defaults fire on
  * their own. Results must be identical with and without the filter (it is
  * pruning, not semantics).
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val tuned = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force the shuffle join shape
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")

  private def withConf[A](pairs: Seq[(String, String)])(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def urgentRevenue() = {
    val li = Tables.lineitem(spark, TestSpark.Sf001)
    val o = Tables.orders(spark, TestSpark.Sf001)
      .filter(col("o_orderpriority") === "1-URGENT")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"))
  }

  test("selective fact-fact join gets a bloom filter on the probe side") {
    val (plan, withBloom) = withConf(tuned) {
      val df = urgentRevenue()
      (df.queryExecution.optimizedPlan.toString,
        df.collect().map(r => (r.getString(0), r.getLong(1))).toMap)
    }
    assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
      "expected an injected runtime bloom filter, plan:\n" + plan.take(1500))
    // pruning must not change results
    val baseline = withConf(Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")) {
      urgentRevenue().collect().map(r => (r.getString(0), r.getLong(1))).toMap
    }
    assert(withBloom.nonEmpty, "selective predicate matched nothing — vacuous test")
    assert(withBloom == baseline)
  }
}
