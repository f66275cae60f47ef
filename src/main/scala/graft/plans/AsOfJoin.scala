package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSql}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Backward as-of join as a WHOLE custom operator — the (c) rung of the
  * extension ladder: a logical node ([[AsOfJoinPlan]]), a planner strategy
  * ([[AsOfJoinStrategy]], injected via
  * `spark.sql.extensions=graft.plans.GraftExtensions`), and a physical
  * operator ([[AsOfJoinExec]]) that declares its required distribution +
  * ordering to Catalyst and then streams both sides in one merge pass.
  *
  * Semantics: LEFT OUTER backward as-of — each left row is joined to the
  * right row with the same key and the greatest timestamp ≤ the left
  * timestamp, or nulls if none. This is what the Window carry-forward form
  * ([[graft.operators.Windows.asofJoin]]) and DuckDB's native `ASOF LEFT
  * JOIN` both compute; the three implementations are held to the same
  * oracle. Right-side timestamps must be unique per (key, ts) for a
  * deterministic pick — dedup upstream (the declared query does).
  *
  * Why a custom physical operator rather than the window form: the window
  * form materializes a UNION of both inputs through one sort, carrying
  * every column of both sides through the shuffle with null padding. The
  * merge form shuffles each side only on its own key, keeps O(1) state per
  * partition (the last-seen match), and emits left-sorted output — at
  * 100 TB the union's null-padded width and the extra sorted pass are the
  * difference. Catalyst still owns distribution: `requiredChildDistribution`
  * (ClusteredDistribution per side) and `requiredChildOrdering`
  * ((key, ts) per side) mean EnsureRequirements plans the exchanges and
  * sorts — including reusing existing partitioning — exactly as it does for
  * SortMergeJoin.
  *
  * Scope (documented demo constraints): key and timestamp must be
  * LongType/TimestampType (64-bit internal), and rows with null key/ts are
  * treated as unmatched (left) / skipped (right). A production version
  * would use generated orderings for arbitrary key types.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // each side clusters on its own key; EnsureRequirements co-partitions
  // them (and reuses a child's existing hash partitioning when compatible),
  // exactly as for SortMergeJoin
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // the merge emits rows in left-iterator order, so the left ordering
  // survives — declaring it lets Catalyst elide downstream sorts
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val lk = leftKey; val rk = rightKey; val lts = leftTs; val rts = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lProj = UnsafeProjection.create(Seq(lk, lts), lOut)
      val rProj = UnsafeProjection.create(Seq(rk, rts), rOut)
      val outProj = UnsafeProjection.create(outAttrs, lOut ++ rOut)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      new Iterator[InternalRow] {
        private var rCur: InternalRow = _
        private var rKeyV = 0L
        private var rTsV = 0L
        private var matched: InternalRow = _
        private var matchedKey = 0L

        private def advanceRight(): Unit = {
          rCur = null
          while (rCur == null && rIter.hasNext) {
            val row = rIter.next()
            val kv = rProj(row)
            if (!kv.isNullAt(0) && !kv.isNullAt(1)) {
              rCur = row
              rKeyV = kv.getLong(0)
              rTsV = kv.getLong(1)
            } // null key/ts right rows are skipped
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val kv = lProj(l)
          if (kv.isNullAt(0) || kv.isNullAt(1)) {
            outProj(joined(l, nullRight))
          } else {
            val klV = kv.getLong(0)
            val tlV = kv.getLong(1)
            // consume right rows at-or-before (klV, tlV); the latest one
            // with the SAME key is the as-of match. Right rows for smaller
            // keys are passed over (left outer join); right rows beyond tlV
            // are left in place for later left rows.
            while (rCur != null && (rKeyV < klV || (rKeyV == klV && rTsV <= tlV))) {
              if (rKeyV == klV) {
                matched = rCur.copy() // iterator rows reuse buffers
                matchedKey = klV
              }
              advanceRight()
            }
            if (matched != null && matchedKey == klV) outProj(joined(l, matched))
            else outProj(joined(l, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Public face: `AsOf.joinBackward(purchases, clicks, ...)`. */
object AsOf {

  private def attr(p: LogicalPlan, name: String): Attribute =
    p.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"no column '$name' in ${p.output.map(_.name).mkString(", ")}"))

  /** Backward as-of LEFT join of `left` to `right` on equal key, latest
    * `right.ts <= left.ts`. Key/ts columns must be long/timestamp typed. */
  def joinBackward(
      left: DataFrame, right: DataFrame,
      leftKeyName: String, rightKeyName: String,
      leftTsName: String, rightTsName: String): DataFrame = {
    val lp = GraftSql.analyzed(left)
    // re-alias the right side unconditionally: if both inputs derive from
    // the same scan (the usual self-as-of), their attributes share exprIds
    // and binding would silently resolve right-side keys against the left
    val rp0 = GraftSql.analyzed(right)
    val aliases = rp0.output.map(a => Alias(a, a.name)())
    val rp = Project(aliases, rp0)
    val rAttrs = aliases.map(_.toAttribute)
    def rAttr(name: String): Attribute =
      rAttrs.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' in right side"))
    val node = AsOfJoinPlan(lp, rp,
      attr(lp, leftKeyName), rAttr(rightKeyName),
      attr(lp, leftTsName), rAttr(rightTsName))
    Seq(node.leftKey, node.leftTs, node.rightKey, node.rightTs).foreach { a =>
      require(a.dataType == LongType || a.dataType == TimestampType,
        s"as-of key/ts must be long/timestamp, got ${a.dataType.sql} for ${a.name}")
    }
    GraftSql.ofRows(left.sparkSession, node)
  }
}
