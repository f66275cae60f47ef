package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join handling: when one join key dominates, AQE must split the
  * skewed partition into parallel sub-partitions instead of letting a
  * single reducer drag the stage — the runtime answer to data skew that
  * complements the explicit salting pattern (`rel_salted_agg`). Thresholds
  * are lowered so the optimization triggers on test-sized data; results
  * must be identical to the non-AQE plan.
  */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf[A](pairs: Seq[(String, String)])(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition and preserves results") {
    import spark.implicits._
    // one hot key carrying ~all rows + a long tail
    val hot = spark.range(0, 200000).select(
      lit(42L).as("k"), col("id").as("payload"))
    val tail = spark.range(0, 1000).select(
      (col("id") + 100).as("k"), col("id").as("payload"))
    val left = hot.unionAll(tail)
    val right = spark.range(0, 2000).select(col("id").as("k"), lit(1).as("w"))

    val tuned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1")
    // NOTE the downstream aggregate is GLOBAL: a groupBy on the join key
    // would reuse the join's hash partitioning, and AQE (correctly) refuses
    // to split a skewed partition whose distribution a downstream operator
    // still requires — splitting is only free when nothing downstream
    // depends on the partitioning.
    val (skewHandled, result) = withConf(tuned) {
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
      val row = joined.collect()(0)
      val plan = joined.queryExecution.executedPlan.toString
      (plan.contains("skew=true"), (row.getLong(0), row.getLong(1)))
    }
    assert(skewHandled, "expected AQE to mark the skewed join (skew=true)")
    assert(result._1 == 200000L + 1000L)
    // hot-key payload sum: ids 0..199999 → n(n-1)/2; tail contributes its ids
    val expected = (0L until 200000L).sum + (0L until 1000L).sum
    assert(result._2 == expected)
  }

  test("post-split partition sizes stay bounded under sf1-scale skew") {
    // an sf1-scale hot key: 2M of 2.01M rows share one join key — the
    // single-reducer wall a 100 TB shuffle hits when one entity dominates.
    // The gate is on OUTCOME, not just the plan marker: after AQE splits
    // the skewed partition, no post-join partition may hold more than a
    // bounded slice of the hot key's rows.
    val hotN = 2000000L
    val hot = spark.range(0, hotN).select(lit(42L).as("k"), col("id").as("payload"))
    val tail = spark.range(0, 10000).select((col("id") + 100).as("k"), col("id").as("payload"))
    val left = hot.unionAll(tail)
    val right = spark.range(0, 20000).select(col("id").as("k"), lit(1).as("w"))

    val tuned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1")
    withConf(tuned) {
      val joined = left.join(right, "k").select(col("k"), col("payload"))
      // per-partition row counts of the JOIN OUTPUT itself, measured on the
      // final (AQE-resolved) partitioning — not through a downstream
      // aggregate, whose own exchange re-partitions what it measures
      // toRdd, not .rdd: Dataset.rdd builds a SEPARATE deserializing
      // QueryExecution, leaving this dataset's adaptive plan unexecuted —
      // the skew marker assertion below must read the plan that actually ran
      val sizes = joined.queryExecution.toRdd
        .mapPartitions(it => Iterator(it.foldLeft(0L)((a, _) => a + 1)))
        .collect()
      assert(sizes.sum == hotN + 10000L)
      val maxPart = sizes.max
      assert(maxPart < hotN / 3,
        s"hot key must be split across partitions; largest holds $maxPart of $hotN")
      assert(sizes.count(_ > 0) >= 4,
        s"expected >=4 populated post-split partitions, got ${sizes.length}")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), "expected the skew-split marker in the plan")
    }
  }
}
