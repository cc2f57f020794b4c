package org.apache.spark.sql.graftasof

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join — the canonical time-series operator Spark has no
  * native relational form for (`df1.join(df2, ...)` cannot express "the
  * LATEST right row at or before each left row" without a window over a
  * unioned stream). This is build-brief preference tier (c): a full
  * logical node + planner strategy + physical operator, placed in the
  * `org.apache.spark.sql` namespace like every third-party engine
  * extension (the execution API is internal-but-public).
  *
  * Semantics (DuckDB `ASOF LEFT JOIN` equivalent, which the oracle
  * uses): for each left row, the right row with the same key and —
  * backward (`forward = false`, DuckDB `l.ts >= r.ts`) — the GREATEST
  * right-ts ≤ left-ts, or — forward (`forward = true`, DuckDB
  * `l.ts <= r.ts`) — the SMALLEST right-ts ≥ left-ts; null-extended
  * when none exists. Right-side (key, ts) pairs should be unique —
  * with duplicates the winner among equal timestamps follows the
  * physical sort, which is not deterministic. Null keys/timestamps
  * never match (SQL semantics).
  *
  * Physical shape: both sides hash-partitioned on the key and sorted by
  * (key, ts) — declared via required distribution/ordering so
  * EnsureRequirements plans the exchanges — then a single streaming
  * merge pass per partition: O(|L|+|R|), at most one row of right-side
  * state (none at all in forward mode: the first non-skipped right row
  * IS the match), no buffering of groups. At 100 TB this is one
  * co-partitioned shuffle per side, the same cost as a sort-merge join,
  * and strictly cheaper than the union-window rewrite (which shuffles
  * L+R together and windows over the merged stream).
  */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lt = BindReferences.bindReference(leftTs, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rt = BindReferences.bindReference(rightTs, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val nRight = right.output.length
    val outputAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // Parent operators (e.g. a ShuffleExchangeExec placed directly
      // above) may require UnsafeRow; JoinedRow is not one, so convert —
      // same result-projection discipline as SortMergeJoinExec.
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joinedIter = new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRow = new GenericInternalRow(nRight)
        private var rHead: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        private var bestMatch: InternalRow = null // backward: best so far (copied)

        private def advance(): Unit =
          rHead = if (rIter.hasNext) rIter.next() else null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lkV = lk.eval(l)
          val ltV = lt.eval(l)
          if (lkV == null || ltV == null) return joined(l, nullRow)
          var advancing = true
          while (advancing && rHead != null) {
            val rkV = rk.eval(rHead)
            val rtV = rt.eval(rHead)
            if (rkV == null || rtV == null) {
              advance()
            } else {
              val c = keyOrd.compare(rkV, lkV)
              if (c < 0) {
                // earlier key: skip (its matches are behind us for good)
                advance()
              } else if (forward) {
                // discard same-key rows strictly before the left ts —
                // later left rows (ts ascending) can't want them either;
                // the first survivor at this key IS the smallest ts ≥ lts.
                if (c == 0 && tsOrd.compare(rtV, ltV) < 0) advance()
                else advancing = false
              } else if (c == 0 && tsOrd.compare(rtV, ltV) <= 0) {
                // same key, usable timestamp: becomes the current best
                bestMatch = rHead.copy()
                advance()
              } else {
                advancing = false
              }
            }
          }
          val m =
            if (forward) {
              // loop invariant: a same-key rHead here has ts ≥ lts
              if (rHead != null && keyOrd.compare(rk.eval(rHead), lkV) == 0) rHead
              else nullRow
            } else if (bestMatch != null &&
                keyOrd.compare(rk.eval(bestMatch), lkV) == 0 &&
                tsOrd.compare(rt.eval(bestMatch), ltV) <= 0) bestMatch
            else nullRow
          joined(l, m)
        }
      }
      joinedIter.map(resultProj)
    }
  }
}

/** Planner strategy mapping the logical node to the exec. Injected via
  * `SparkSessionExtensions` ([[graft.GraftExtensions]]) or
  * `spark.experimental.extraStrategies` (self-registration in
  * [[graft.operators.AsOf]]). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, fwd) :: Nil
    case _ => Nil
  }
}
