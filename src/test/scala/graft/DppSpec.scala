package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** DYNAMIC partition pruning — the third pruning tier after static
  * partition filters (PartitionedSinkSpec) and runtime bloom filters
  * (BloomFilterSpec): when the fact table is partitioned on the join key
  * but the selective predicate sits on OTHER columns of the dimension,
  * no literal partition filter exists at plan time. Catalyst instead
  * injects a `dynamicpruning` subquery into the fact scan that is fed by
  * the dim side's broadcast at RUNTIME, so a 100 TB date-partitioned fact
  * reads only the partitions the filtered dimension actually selects.
  * Semantics must be unchanged — it is pruning, not filtering.
  */
class DppSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("dim-filtered join dynamically prunes the partitioned fact scan") {
    val base = Files.createTempDirectory("graft-dpp").toString
    // fact: orders partitioned by order year
    Tables.orders(spark, TestSpark.Sf001)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(s"$base/fact")
    // dim: one row per year with an attribute the predicate lives on, so
    // static pruning is impossible (the scan cannot see a year literal)
    Tables.orders(spark, TestSpark.Sf001)
      .select(year(col("o_orderdate")).as("d_year")).distinct()
      .withColumn("d_tag",
        when(col("d_year") === 1997, lit("target")).otherwise(lit("other")))
      .write.mode("overwrite").parquet(s"$base/dim")

    val fact = spark.read.parquet(s"$base/fact")
    val dim = spark.read.parquet(s"$base/dim").filter(col("d_tag") === "target")
    val q = fact.join(dim, fact("o_year") === dim("d_year"))
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).cast("double").as("tp"))

    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery on the fact scan:\n${optimized.take(800)}")

    // pruning must not change the answer
    val n = q.collect()(0).getLong(0)
    val direct = Tables.orders(spark, TestSpark.Sf001)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(n === direct, "DPP answer must equal the direct year filter")
  }
}
