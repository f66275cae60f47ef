package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native n-gram array expressions.
  *
  * Semantically identical to the composed-builtins forms in [[TextFns]]
  * (`shingles(tokens(text), n)` / `charGrams(text, n)`, both spec-pinned
  * equal) but computed in one pass from the input string. The builtin forms
  * go through `transform` — a higher-order function that is CodegenFallback,
  * which knocks the *entire* enclosing projection out of whole-stage codegen.
  * These expressions `defineCodeGen` a single static call, so
  * `explode(word_ngrams(text, n))` stays a fully codegen'd Generate over a
  * codegen'd child. They sit under every shingle of the dedup tier and the
  * corpus bigram scan, i.e. they run O(corpus tokens) times.
  */
case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NGrams.word(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGrams.word($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Character n-gram variant of [[WordNGrams]] (winnowing fingerprints). */
case class CharNGrams(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NGrams.chars(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGrams.chars($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGrams {

  private val Whitespace = Pattern.compile("\\s+")

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Space-joined word n-grams of `trim(s)` split on `\s+` — exactly
    * `shingles(tokens(s), n)`: UTF8String.trim (space-only, like Spark's
    * `trim`) then Java regex split with limit -1 (like Spark's `split`).
    * Empty when the text has fewer than n tokens. */
  def word(s: UTF8String, n: Int): ArrayData = {
    val toks = Whitespace.split(s.trim().toString, -1)
    if (toks.length < n) return Empty
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Character n-gram substrings of `s` — exactly `charGrams(s, n)`:
    * 1-based `substr(i, n)` for i in [1, numChars-n+1], by codepoint
    * (UTF8String.substringSQL, like Spark's `substr`). */
  def chars(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return Empty
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i < out.length) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }
}
