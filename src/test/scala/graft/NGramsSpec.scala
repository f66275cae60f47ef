package graft

import graft.functions.TextFns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the native n-gram expressions to the composed-builtins reference
  * implementations, on real corpus text and on adversarial edges (empty
  * strings, fewer tokens than n, runs of mixed whitespace, multi-byte
  * chars) — the native forms exist purely for codegen speed, so any
  * semantic divergence is a bug.
  */
class NGramsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("native word n-grams equal shingles(tokens(text), n) on the corpus") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    Seq(2, 3).foreach { n =>
      val diff = docs.select(
        TextFns.wordNGrams(col("text"), n).as("fast"),
        TextFns.shingles(TextFns.tokens(col("text")), n).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(diff == 0, s"n=$n")
    }
  }

  test("native char n-grams equal charGrams(text, n) on the corpus") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val diff = docs.select(
      TextFns.charNGrams(col("text"), 8).as("fast"),
      TextFns.charGrams(col("text"), 8).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(diff == 0)
  }

  test("edge cases: empties, short docs, mixed whitespace, multibyte") {
    import spark.implicits._
    val edges = Seq(
      "", " ", "a", "a b", "a  b\t c\nd",
      "  leading and trailing  ", "héllo wörld ünïcode grams").toDF("text")
    Seq(1, 2, 3).foreach { n =>
      val rows = edges.select(
        TextFns.wordNGrams(col("text"), n).as("fast"),
        TextFns.shingles(TextFns.tokens(col("text")), n).as("ref")).collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n row=$i")
      }
    }
    Seq(1, 4, 8).foreach { n =>
      val rows = edges.select(
        TextFns.charNGrams(col("text"), n).as("fast"),
        TextFns.charGrams(col("text"), n).as("ref")).collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n row=$i")
      }
    }
  }

  test("NULL text: native yields NULL, HOF yields empty — both explode to 0 rows") {
    import spark.implicits._
    val nulls = Seq(Option.empty[String]).toDF("text")
    val r = nulls.select(
      TextFns.wordNGrams(col("text"), 2).as("fastw"),
      TextFns.charNGrams(col("text"), 4).as("fastc")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
    val exploded = nulls.select(explode(TextFns.wordNGrams(col("text"), 2))).count() +
      nulls.select(explode(TextFns.shingles(TextFns.tokens(col("text")), 2))).count()
    assert(exploded == 0)
  }
}
