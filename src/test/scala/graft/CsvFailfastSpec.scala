package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bronze CSV edge must reject jagged rows, mirroring the reference's
  * `allow_jagged_rows=false` (`etl_medallion.py:96`): with mode=FAILFAST a
  * malformed row aborts the load instead of silently becoming NULLs
  * (PERMISSIVE) or vanishing (DROPMALFORMED).
  */
class CsvFailfastSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("FAILFAST read aborts on a jagged row; permissive read hides it") {
    val dir = Files.createTempDirectory("graft-jagged").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      """id;name;price
        |1;alpha;10.5
        |2;beta
        |3;gamma;7.25
        |""".stripMargin)
    val schema = "id LONG, name STRING, price DOUBLE"

    val failfast = spark.read
      .option("header", "true").option("sep", ";").option("mode", "FAILFAST")
      .schema(schema).csv(dir)
    // collect(), not count(): CSV count() prunes all columns and never
    // parses the fields, so malformed detection only fires when the row
    // is actually materialized
    val e = intercept[Exception] { failfast.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("MALFORMED") || m.contains("Malformed")),
      s"expected malformed-record failure, got: ${messages(e).mkString(" | ")}")

    val permissive = spark.read
      .option("header", "true").option("sep", ";").option("mode", "PERMISSIVE")
      .schema(schema).csv(dir)
    assert(permissive.count() == 3) // jagged row silently null-padded
    assert(permissive.filter(col("price").isNull).count() == 1)
  }

  test("round-trip query itself stays green under FAILFAST (well-formed sink)") {
    val n = graft.operators.Relational.csvRoundtrip(spark, TestSpark.Sf0001).count()
    assert(n > 0)
  }
}
