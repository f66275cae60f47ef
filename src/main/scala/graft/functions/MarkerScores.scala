package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-language marker-word hit counts over a token array, all languages in
  * ONE compiled pass — the language-ID scoring loop.
  *
  * Replaces one `size(filter(toks, t → array_contains(markers_l, t)))` HOF
  * per language: those are CodegenFallback, and the langId argmax
  * when-chain references every score several times, so the interpreted
  * token scan ran ~(3 × languages) times per row. Semantics are identical
  * per language — count the tokens (duplicates included) equal to any of
  * that language's markers; NULL array elements are skipped exactly as the
  * old `array_contains(arr, NULL) → NULL` predicate dropped them.
  *
  * Output: ARRAY<INT>, one count per marker set, in the given order (the
  * same INT `size(...)` produced). MarkerScoresSpec pins equality to the
  * HOF form.
  */
case class MarkerScores(child: Expression, markers: Seq[Seq[String]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "marker_scores"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }

  private val table = new MarkerScores.Table(markers.map(_.toArray).toArray)

  override protected def nullSafeEval(input: Any): Any =
    table.score(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("markerTable", table,
      classOf[MarkerScores.Table].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $tbl.score($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MarkerScores {

  /** The compiled marker sets (UTF8String comparisons, built once per
    * task from the serialized strings). Sets are tiny (4 markers), so a
    * linear scan beats any hash structure. */
  final class Table(strs: Array[Array[String]]) extends Serializable {
    @transient private lazy val u: Array[Array[UTF8String]] =
      strs.map(_.map(UTF8String.fromString))

    def score(arr: ArrayData): ArrayData = {
      val sets = u
      val counts = new Array[Int](sets.length)
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val t = arr.getUTF8String(i)
          var l = 0
          while (l < sets.length) {
            val m = sets(l)
            var k = 0
            var hit = false
            while (k < m.length && !hit) {
              if (m(k).equals(t)) hit = true
              k += 1
            }
            if (hit) counts(l) += 1
            l += 1
          }
        }
        i += 1
      }
      new GenericArrayData(counts)
    }
  }
}
