package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Round-18 honesty gate for the native token-statistics pass: every
  * element of [[graft.functions.TokenStats]] must equal its composed-HOF
  * form from the round-17 `text_repetition` / `text_gopher_rules` bodies,
  * over the real corpus and adversarial cases. */
class TokenStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  private val stops = Seq("the", "a", "of", "and", "to", "in", "is")

  /** The exact HOF forms TokenStats replaced. */
  private def hofStats(toks: org.apache.spark.sql.Column) = {
    val nTok = size(toks)
    val stopArr = array(stops.map(lit): _*)
    val bigrams = transform(sequence(lit(1), nTok - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    array(
      array_max(transform(array_distinct(toks),
        d => size(filter(toks, t => t === d)))),
      when(nTok > 1, size(array_distinct(bigrams))).otherwise(lit(0)),
      aggregate(toks, lit(0), (acc, t) => acc + length(t)),
      size(filter(toks, t => length(t) <= 2)),
      size(filter(toks, t => array_contains(stopArr, t))))
  }

  test("TokenStats equals the composed HOF forms on the corpus") {
    val toks = TextFns.tokens(col("text"))
    val diff = Tables.documents(spark, dir)
      .select(TextFns.tokenStats(toks, stops).as("native"),
        hofStats(toks).as("hof"))
      .filter(not(col("native") <=> col("hof"))).count()
    assert(diff === 0L)
  }

  test("TokenStats edge cases: blank text, single token, all-duplicate, " +
    "multi-byte chars, stopword-only, null input") {
    import spark.implicits._
    val cases = Seq(
      "",                               // split('') -> [""]: 1 empty token
      "solo",                           // one token, no bigrams
      "x x x x",                        // all duplicates, repeated bigram
      "a b a b a",                      // alternating bigrams
      "héllo wörld héllo über",    // multi-byte: numChars not bytes
      "the a of and to in is",          // every token a stopword
      "  leading and trailing   ",      // trim + multi-space split
      "ab abc a ab abc ab")
    val toks = TextFns.tokens(col("text"))
    val rows = cases.toDF("text")
      .select(TextFns.tokenStats(toks, stops).as("native"),
        hofStats(toks).as("hof")).collect()
    rows.foreach(r => assert(r.get(0) === r.get(1), r.toString))
    // spot-pin one case by hand: "ab abc a ab abc ab"
    //   counts: ab=3 abc=2 a=1 -> max 3; bigrams: "ab abc","abc a","a ab",
    //   "ab abc","abc ab" -> 4 distinct; chars 2+3+1+2+3+2=13; short: ab,a,
    //   ab,ab + a==1char -> len<=2: ab(3),a(1) -> 4; stops: a -> 1
    assert(rows(7).getAs[scala.collection.Seq[Int]]("native") ===
      Seq(3, 4, 13, 4, 1))
    val nl = Seq[Option[String]](None).toDF("text")
      .select(TextFns.tokenStats(split(col("text"), " "), stops).as("n"))
      .head()
    assert(nl.isNullAt(0))
  }

  test("text_repetition and text_gopher_rules outputs are unchanged in " +
    "shape and equal their pre-rewrite HOF bodies") {
    val rep = SparkEntry.queries("text_repetition")(spark, dir)
    assert(rep.columns.toSeq === Seq("doc_id", "n_tokens", "top_token_frac",
      "dup_bigram_frac", "repetitive"))
    val gop = SparkEntry.queries("text_gopher_rules")(spark, dir)
    assert(gop.columns.toSeq === Seq("doc_id", "n_words", "n_tok_chars",
      "n_short", "n_stop", "max_tok_count", "r_word_count", "r_mean_len",
      "r_short_frac", "r_stopwords", "r_dominance", "gopher_pass"))

    // old text_repetition body, verbatim (round-17 form)
    val toks = TextFns.tokens(col("text"))
    val nTok = size(toks)
    val topCnt = array_max(transform(array_distinct(toks),
      t => size(filter(toks, x => x === t))))
    val bigrams = transform(sequence(lit(1), nTok - 1),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1)))
    val dupBigramFrac =
      when(nTok > 1,
        (nTok - 1 - size(array_distinct(bigrams))).cast("double") / (nTok - 1))
        .otherwise(lit(0.0))
    val oldRep = Tables.documents(spark, dir)
      .select(col("doc_id"), nTok.as("n_tokens"),
        (topCnt.cast("double") / nTok).as("top_token_frac"),
        dupBigramFrac.as("dup_bigram_frac"))
      .withColumn("repetitive",
        col("top_token_frac") > 0.2 || col("dup_bigram_frac") > 0.5)
    assert(rep.exceptAll(oldRep).isEmpty && oldRep.exceptAll(rep).isEmpty)

    // old text_gopher_rules measures, verbatim (round-17 form)
    val stopArr = array(stops.map(lit): _*)
    val oldGop = Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).as("n_words"),
        aggregate(toks, lit(0), (acc, t) => acc + length(t)).as("n_tok_chars"),
        size(filter(toks, t => length(t) <= 2)).as("n_short"),
        size(filter(toks, t => array_contains(stopArr, t))).as("n_stop"),
        array_max(transform(array_distinct(toks),
          d => size(filter(toks, t => t === d)))).as("max_tok_count"))
    val newGop = gop.select("doc_id", "n_words", "n_tok_chars", "n_short",
      "n_stop", "max_tok_count")
    assert(newGop.exceptAll(oldGop).isEmpty && oldGop.exceptAll(newGop).isEmpty)
  }
}
