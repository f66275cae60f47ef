package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Hash60Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native Hash60 equals conv(substring(md5))) on real tokens") {
    val toks = Tables.documents(spark, TestSpark.Sf0001)
      .select(explode(TextFns.tokens(col("text"))).as("t"))
      .limit(5000)
    val diff = toks.select(
      TextFns.hash60(col("t")).as("fast"),
      TextFns.hash60Hof(col("t")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
    // null propagation + non-negative range
    import spark.implicits._
    val edge = Seq(Some(""), Some("a"), None).toDF("s")
      .select(TextFns.hash60(col("s")).as("h")).collect()
    assert(edge(0).getLong(0) >= 0 && edge(1).getLong(0) >= 0)
    assert(edge(2).isNullAt(0))
  }
}
