package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Round-17 honesty gate for the native language-ID scoring: element i of
  * [[graft.functions.MarkerScores]] must equal the HOF form
  * `size(filter(toks, t → array_contains(markers_i, t)))` — duplicates
  * counted, NULL elements skipped — over the real corpus and edge cases.
  */
class MarkerScoresSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private val markers: Seq[Seq[String]] = Seq(
    Seq("the", "a", "of", "and"),
    Seq("der", "die", "und", "ein"),
    Seq("le", "la", "et", "un"),
    Seq("el", "los", "y", "una"))

  private def hofScores(toks: org.apache.spark.sql.Column) =
    array(markers.map { m =>
      val arr = array(m.map(lit): _*)
      size(filter(toks, t => array_contains(arr, t)))
    }: _*)

  test("MarkerScores equals the per-language HOF counts on the corpus") {
    val toks = TextFns.tokens(col("text"))
    val diff = Tables.documents(spark, dir)
      .select(TextFns.markerScores(toks, markers).as("native"),
        hofScores(toks).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(diff === 0L)
  }

  test("MarkerScores on edge cases: duplicates counted, empty text, " +
    "multi-language tokens, null array") {
    import spark.implicits._
    val cases = Seq(
      "the the the und le el",  // duplicates + one hit per set
      "",                        // split('') -> [""]
      "nothing matches here",
      "a of and the der die und ein le la et un el los y una")
    val toks = TextFns.tokens(col("text"))
    val rows = cases.toDF("text")
      .select(TextFns.markerScores(toks, markers).as("native"),
        hofScores(toks).as("hof")).collect()
    rows.foreach(r => assert(r.get(0) === r.get(1)))
    assert(rows(0).getAs[scala.collection.Seq[Int]]("native") === Seq(3, 1, 1, 1))
    val nl = Seq[Option[String]](None).toDF("text")
      .select(TextFns.markerScores(split(col("text"), " "), markers).as("n"))
      .head()
    assert(nl.isNullAt(0))
  }

  test("text_lang_id and text_lang_confusion outputs are unchanged in " +
    "shape and deterministic") {
    val li = SparkEntry.queries("text_lang_id")(spark, dir)
    assert(li.columns.toSeq === Seq("doc_id", "score_en", "score_de",
      "score_fr", "score_es", "predicted_lang", "actual_lang"))
    val lc = SparkEntry.queries("text_lang_confusion")(spark, dir)
    assert(lc.columns.toSeq === Seq("actual_lang", "predicted_lang", "n",
      "share_of_actual"))
    assert(li.count() === li.count())
  }
}
