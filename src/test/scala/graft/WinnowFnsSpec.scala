package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Round-17 optimization honesty gate: the native winnowing expressions
  * ([[graft.functions.WinnowFingerprints]], [[graft.functions.MinGramHash60]])
  * must be BIT-IDENTICAL to the chained-HOF forms they replaced — same
  * grams (SQL SUBSTR character semantics), same hash60, same windowed
  * minima, same first-occurrence distinct order. Checked over the real
  * sf0.001 corpus plus adversarial strings (multi-byte chars, repeats,
  * boundary lengths).
  */
class WinnowFnsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001
  private val W = 16

  private def hofFps(text: org.apache.spark.sql.Column) = {
    // the exact pre-round-17 pipeline from Dedup.winnowPairs
    val hs = transform(sequence(lit(1), length(text) - lit(7)),
      i => TextFns.hash60(text.substr(i, lit(8))))
    array_distinct(transform(
      sequence(lit(1), size(hs) - lit(W - 1)),
      i => array_min(slice(hs, i, lit(W)))))
  }

  test("WinnowFingerprints equals the chained-HOF pipeline on the corpus " +
    "(values AND first-occurrence order)") {
    val docs = Tables.documents(spark, dir)
      .filter(length(col("text")) >= 8 + W - 1)
    val both = docs.select(col("doc_id"),
      TextFns.winnowFps(col("text"), W).as("native"),
      hofFps(col("text")).as("hof"))
    val diff = both.filter(not(col("native") <=> col("hof"))).count()
    assert(diff === 0L)
    // non-vacuous: the corpus really produced fingerprints
    val n = both.select(sum(size(col("native")))).head().getLong(0)
    assert(n > 0L)
  }

  test("WinnowFingerprints on adversarial strings (multi-byte, repeats, " +
    "boundary lengths)") {
    import spark.implicits._
    val cases = Seq(
      "a" * 23,                       // exactly one window
      "a" * 24,                       // two windows, identical hashes
      "abcdefgh" * 40,                // periodic text, heavy dedup
      "日本語のテキストですねこれは長いもの" * 3, // multi-byte chars
      ("x" * 22) + "é" + ("y" * 22),  // multi-byte at a window boundary
      (0 until 80).map(i => ('a' + i % 26).toChar).mkString)
    val df = cases.toDF("text").filter(length(col("text")) >= 8 + W - 1)
    val diff = df.select(
        TextFns.winnowFps(col("text"), W).as("native"),
        hofFps(col("text")).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(diff === 0L)
  }

  test("WinnowFingerprints is empty below one full window; NULL in, NULL out") {
    import spark.implicits._
    val r = Seq("a" * 22, "short", "").toDF("text")
      .select(TextFns.winnowFps(col("text"), W).as("f")).collect()
    assert(r.forall(_.getAs[scala.collection.Seq[Long]]("f").isEmpty))
    val nl = Seq[Option[String]](None).toDF("text")
      .select(TextFns.winnowFps(col("text"), W).as("f")).head()
    assert(nl.isNullAt(0))
  }

  test("MinGramHash60 equals array_min over HOF gram hashes on the corpus") {
    val docs = Tables.documents(spark, dir).filter(length(col("text")) >= 8)
    val hof = array_min(transform(
      sequence(lit(1), length(col("text")) - lit(7)),
      i => TextFns.hash60(col("text").substr(i, lit(8)))))
    val diff = docs.select(
        TextFns.minGramHash60(col("text")).as("native"), hof.as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(diff === 0L)
    // 8-char boundary + sub-8 null
    import spark.implicits._
    val b = Seq("12345678", "1234567").toDF("text")
      .select(TextFns.minGramHash60(col("text")).as("m")).collect()
    assert(b(0).getLong(0) === TextFns.hash60Long("12345678"))
    assert(b(1).isNullAt(0))
  }
}
