package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}

/** Text/hash expression vocabulary shared by the dedup + text-analysis
  * operators. Everything here is built from codegen'd built-in functions
  * (no UDFs), and every hash is derived from MD5 so the DuckDB oracle can
  * compute bit-identical values (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`).
  */
object TextFns {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Deterministic 60-bit non-negative hash of a string, identical in Spark
    * and DuckDB: first 15 hex digits of MD5, parsed base-16. Used instead of
    * xxhash64 (whose seed/algorithm DuckDB lacks) wherever an oracle needs to
    * reproduce the value. Computed by the native [[Hash60]] expression
    * (digest bytes → long directly; no hex string, substring, or conv). */
  def hash60(c: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      Hash60(org.apache.spark.sql.GraftSql.expression(c)))

  /** The composed-builtins form of [[hash60]] (reference implementation;
    * spec-pinned equal to the native expression). */
  def hash60Hof(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** DuckDB rendering of [[hash60]]. */
  def hash60Sql(sql: String): String =
    s"CAST(('0x' || substr(md5($sql), 1, 15)) AS BIGINT)"

  /** Driver/JVM-side value of [[hash60]] for the same string — lets specs
    * recompute a sampled hash independently of any Spark plan. */
  def hash60Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  /** Word n-gram shingles of a document, computed by the native
    * [[WordNGrams]] expression — one pass, fully codegen'd, so
    * `explode(wordNGrams(text, n))` stays inside whole-stage codegen.
    * Equals `shingles(tokens(text), n)` (spec-pinned). */
  def wordNGrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      WordNGrams(org.apache.spark.sql.GraftSql.expression(text), n))

  /** Character n-grams of a document via the native [[CharNGrams]]
    * expression. Equals `charGrams(text, n)` (spec-pinned). */
  def charNGrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      CharNGrams(org.apache.spark.sql.GraftSql.expression(text), n))

  /** Word n-gram shingles (space-joined) of a token array; empty when the
    * document has fewer than n tokens. Composed-builtins reference
    * implementation of [[wordNGrams]] — `transform` is CodegenFallback, so
    * keep this out of hot paths.
    */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array().cast(ArrayType(StringType)))

  /** DuckDB rendering of [[shingles]] for n=3 over a token-array column. */
  def shingles3Sql(toksSql: String): String = shinglesNSql(toksSql, 3)

  /** DuckDB rendering of [[shingles]] for any n over a token-array column:
    * a list comprehension emitting the space-joined n-gram at each start
    * index (empty when the document has fewer than n tokens — the range
    * upper bound collapses to 1). */
  def shinglesNSql(toksSql: String, n: Int): String = {
    val joined = (0 until n).map {
      case 0 => s"$toksSql[i]"
      case k => s"$toksSql[i+$k]"
    }.mkString(" || ' ' || ")
    s"[$joined for i in range(1, greatest(len($toksSql) - ${n - 2}, 1))]"
  }

  /** Distinct sliding-window minima of [[hash60]] over character 8-grams —
    * the winnowing fingerprint set, as one native codegen'd pass
    * ([[WinnowFingerprints]]). Bit-identical to the chained HOF pipeline
    * (spec-pinned in WinnowFnsSpec); empty below w full windows. */
  def winnowFps(text: Column, w: Int): Column =
    org.apache.spark.sql.GraftSql.column(
      WinnowFingerprints(org.apache.spark.sql.GraftSql.expression(text), w))

  /** Minimum [[hash60]] over character 8-grams ([[MinGramHash60]]) — the
    * whole-document sketch, one fused native loop, no array. NULL below 8
    * characters (callers filter those rows first). */
  def minGramHash60(text: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      MinGramHash60(org.apache.spark.sql.GraftSql.expression(text)))

  /** Per-language marker hit counts over a token array in one native pass
    * ([[MarkerScores]]); element i = the INT count the HOF form
    * `size(filter(toks, t → array_contains(markers_i, t)))` produced
    * (spec-pinned in MarkerScoresSpec). */
  def markerScores(toks: Column, markers: Seq[Seq[String]]): Column =
    org.apache.spark.sql.GraftSql.column(
      MarkerScores(org.apache.spark.sql.GraftSql.expression(toks), markers))

  /** Per-document token statistics (max token frequency, distinct adjacent
    * bigrams, summed token chars, short-token count, stopword count) in one
    * native pass ([[TokenStats]]); element values equal the composed-HOF
    * forms in `text_repetition` / `text_gopher_rules` (spec-pinned in
    * TokenStatsSpec). */
  def tokenStats(toks: Column, stopwords: Seq[String]): Column =
    org.apache.spark.sql.GraftSql.column(
      TokenStats(org.apache.spark.sql.GraftSql.expression(toks), stopwords))

  /** Character n-gram substrings (for winnowing-style fingerprints).
    * Composed-builtins reference implementation of [[charNGrams]]. */
  def charGrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n))))
      .otherwise(array().cast(ArrayType(StringType)))
}
