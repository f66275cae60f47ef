package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document token statistics over a token array, ONE compiled pass —
  * the repetition / Gopher-rule scoring loop.
  *
  * Replaces the five interpreted HOF scans in `text_repetition` /
  * `text_gopher_rules`, the worst of which —
  * `array_max(transform(array_distinct(ts), d → size(filter(ts, t → t = d))))`
  * — is O(unique × tokens) CodegenFallback evaluations per row. One
  * hashmap pass computes the identical values:
  *
  *   0. `max_tok_count`      — max token frequency (NULL for an empty
  *                             array, as `array_max([])` is)
  *   1. `n_distinct_bigrams` — distinct adjacent space-joined bigrams
  *                             (0 when fewer than 2 tokens; HOF callers
  *                             only consume it under a `n > 1` guard)
  *   2. `n_tok_chars`        — Σ length(token)  (code points, like
  *                             `aggregate(ts, 0, (a,t) → a + length(t))`)
  *   3. `n_short`            — count of tokens with length ≤ 2
  *   4. `n_stop`             — count of tokens equal to any stopword
  *
  * Callers feed `split(trim(text), "\\s+")` output: elements are never
  * NULL (null elements would propagate NULL through the HOF `aggregate`;
  * this expression skips them — TokenStatsSpec pins equality on the real
  * tokenizer's output including the empty-string token of blank text).
  *
  * Output: ARRAY<INT> in the order above. TokenStatsSpec pins element-wise
  * equality to the composed-HOF forms.
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }

  private val table = new TokenStats.Table(stopwords.toArray)

  override protected def nullSafeEval(input: Any): Any =
    table.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("tokenStatsTable", table,
      classOf[TokenStats.Table].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenStats {

  final class Table(stops: Array[String]) extends Serializable {
    @transient private lazy val stopSet: java.util.HashSet[UTF8String] = {
      val s = new java.util.HashSet[UTF8String](stops.length * 2)
      stops.foreach(w => s.add(UTF8String.fromString(w)))
      s
    }
    @transient private lazy val space = UTF8String.fromString(" ")

    def stats(arr: ArrayData): ArrayData = {
      val n = arr.numElements()
      val counts = new java.util.HashMap[UTF8String, Array[Int]](math.max(16, n * 2))
      val bigrams = if (n > 1) new java.util.HashSet[UTF8String](n * 2) else null
      var nTokChars = 0
      var nShort = 0
      var nStop = 0
      var prev: UTF8String = null
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val t = arr.getUTF8String(i)
          val c = counts.get(t)
          if (c == null) counts.put(t, Array(1)) else c(0) += 1
          val len = t.numChars()
          nTokChars += len
          if (len <= 2) nShort += 1
          if (stopSet.contains(t)) nStop += 1
          if (bigrams != null && prev != null)
            bigrams.add(UTF8String.concat(prev, space, t))
          prev = t
        } else prev = null
        i += 1
      }
      var maxCount = 0
      val it = counts.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        if (c > maxCount) maxCount = c
      }
      val out = new Array[Any](5)
      out(0) = if (counts.isEmpty) null else Integer.valueOf(maxCount)
      out(1) = Integer.valueOf(if (bigrams == null) 0 else bigrams.size())
      out(2) = Integer.valueOf(nTokChars)
      out(3) = Integer.valueOf(nShort)
      out(4) = Integer.valueOf(nStop)
      new GenericArrayData(out)
    }
  }
}
