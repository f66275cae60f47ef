package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints: the distinct sliding-window minima of
  * [[Hash60]] over character 8-grams, window `w`, in first-occurrence order.
  *
  * Bit-identical by construction to the HOF pipeline it replaces
  * (`array_distinct(transform(sequence(1, n_grams−w+1),
  * i → array_min(slice(hs, i, w))))` over
  * `hs = transform(sequence(1, len−7), i → hash60(substr(text, i, 8)))`):
  * grams come from the same `UTF8String.substringSQL` (SQL SUBSTR
  * character semantics) the Substring expression evaluates, the window min
  * is a plain Long min over the same w entries, and distinctness keeps
  * first occurrence exactly like `array_distinct`. WinnowFnsSpec pins the
  * equality.
  *
  * Why native (guide §1.2 step 2): the HOF form is CodegenFallback and
  * allocates a w-element slice per window position — O(len·w) interpreted
  * expression evaluations and allocations per document, sitting on the
  * winnow-pairs fingerprint build (the heaviest per-row loop in the dedup
  * tier). This is one compiled pass, one long[] per row, no per-window
  * allocation.
  *
  * Documents with fewer than w full windows (numChars < w+7) produce an
  * empty array — callers filter those out up front, exactly as before.
  */
case class WinnowFingerprints(child: Expression, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument and w >= 1")

  override protected def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WinnowFingerprints.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** One pass: gram hashes → windowed minima → first-occurrence distinct. */
  def compute(s: UTF8String, w: Int): ArrayData = {
    val nGrams = s.numChars() - 7
    val nWin = nGrams - w + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Long])
    val hs = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      // substringSQL(pos, len) is the Substring expression's own
      // evaluation path: 1-based, character-counted — identical grams
      hs(i) = Hash60.hash(s.substringSQL(i + 1, 8))
      i += 1
    }
    // LinkedHashSet = array_distinct's first-occurrence order
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < nWin) {
      var m = hs(j)
      var k = j + 1
      val end = j + w
      while (k < end) {
        if (hs(k) < m) m = hs(k)
        k += 1
      }
      out.add(m)
      j += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    var p = 0
    while (it.hasNext) { arr(p) = it.next(); p += 1 }
    new GenericArrayData(arr)
  }
}

/** Native minimum [[Hash60]] over character 8-grams — the whole-document
  * sketch `text_winnow_fingerprint` computes. Bit-identical to
  * `array_min(transform(sequence(1, len−7), i → hash60(substr(text,i,8))))`
  * for any string of ≥ 8 characters (callers filter shorter ones);
  * defensively NULL below 8 characters, where the HOF form's descending
  * `sequence` would have produced engine-trap semantics the operators
  * never rely on. One fused loop, no array materialization at all. */
case class MinGramHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "min_gram_hash60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    if (s.numChars() < 8) null else MinGramHash60.compute(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |if ($c.numChars() >= 8) {
         |  ${ev.value} = graft.functions.MinGramHash60.compute($c);
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinGramHash60 {
  def compute(s: UTF8String): Long = {
    val nGrams = s.numChars() - 7
    var m = Long.MaxValue
    var i = 0
    while (i < nGrams) {
      val h = Hash60.hash(s.substringSQL(i + 1, 8))
      if (h < m) m = h
      i += 1
    }
    m
  }
}
