package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** The as-of join as a FIRST-CLASS operator — tier (c) of the
  * extension ladder: a custom `LogicalPlan` node, a `SparkStrategy`,
  * and a `SparkPlan` registered through the public
  * `SparkSessionExtensions.injectPlannerStrategy` hook.
  *
  * Semantics: for every left row, attach the LATEST right row whose
  * key matches and whose time is <= the left row's time (or nulls if
  * none) — the "last prior observation" join (q16's last-view-before-
  * purchase, the reference's enrich-from-most-recent-cache pattern).
  *
  * Why a physical operator: the composable form (union + window,
  * `SparkEntry.q16`) interleaves BOTH sides through one shuffle and
  * sorts the union; this node instead asks Spark for the exact
  * distribution/ordering it needs — children hash-clustered on their
  * keys and sorted (key, time) — and then streams BOTH sorted sides
  * through one O(n+m) merge per partition with O(1) state (the last
  * matching right row). No union materialization, no window buffer;
  * at 100 TB the right side's sort can come free from bucketed
  * layout, making the join exchange-less.
  *
  * Null keys: rows with null keys never match (SQL equi-join
  * semantics) — enforced in the merge, not left to ordering quirks.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTime: Expression, rightTime: Expression)
    extends BinaryNode {
  require(leftKeys.length == rightKeys.length,
    "as-of join needs the same number of keys on both sides")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must share a type, got ${leftTime.dataType} vs ${rightTime.dataType}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]. Injected via
  * `GraftExtensions` (`injectPlannerStrategy`).
  */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are required hash-clustered on
  * their join keys and sorted by (keys..., time) — `EnsureRequirements`
  * inserts only the exchanges/sorts that are actually missing, so
  * pre-bucketed or pre-sorted inputs join with no exchange at all.
  * Each partition is one streaming merge: advance the right iterator
  * while its (key, time) is not ahead of the current left row,
  * remembering the last key-matching row, O(1) state.
  */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeysB = leftKeys
    val rKeysB = rightKeys
    val lTimeB = leftTime
    val rTimeB = rightTime
    val timeType = leftTime.dataType
    val keyTypes = leftKeys.map(_.dataType)
    val outputB = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB, lOut)
      val rKeyProj = UnsafeProjection.create(rKeysB, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeB), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeB), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // downstream operators may require UnsafeRow — project the
      // JoinedRow through the standard unsafe output projection.
      // MUST bind against `output` (right side nullability-widened),
      // or the projection reads unmatched null slots as garbage zeros.
      val resultProj = UnsafeProjection.create(outputB, outputB)

      var rHead: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastKey: InternalRow = null   // key of lastMatch (copied)
      var lastMatch: InternalRow = null // latest right row for lastKey (copied)

      def anyKeyNull(k: InternalRow): Boolean = {
        var i = 0
        while (i < keyTypes.length) {
          if (k.isNullAt(i)) return true
          i += 1
        }
        false
      }

      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        if (anyKeyNull(lk)) {
          resultProj(joined(lRow, nullRight))
        } else {
          val lt = lTimeProj(lRow).get(0, timeType)
          // advance the right side while it is not ahead of (lk, lt);
          // right rows with smaller keys end groups we no longer need,
          // key-equal rows with time <= lt become the latest match
          var advancing = true
          while (advancing && rHead != null) {
            val rk = rKeyProj(rHead)
            val c = keyOrd.compare(rk, lk)
            if (c < 0) {
              rHead = if (rIter.hasNext) rIter.next() else null
            } else if (c == 0 && !anyKeyNull(rk)) {
              val rt = rTimeProj(rHead).get(0, timeType)
              if (rt == null) {
                // a null right time can never satisfy rt <= lt, and the
                // required Ascending/NullsFirst ordering sorts such rows
                // to the HEAD of their key group — stopping here would
                // permanently block the group (every left row would get
                // null attachments). Skip past them instead.
                rHead = if (rIter.hasNext) rIter.next() else null
              } else if (lt != null &&
                  timeOrd.asInstanceOf[Ordering[Any]].compare(rt, lt) <= 0) {
                lastKey = rk.copy()
                lastMatch = rHead.copy()
                rHead = if (rIter.hasNext) rIter.next() else null
              } else {
                advancing = false
              }
            } else {
              advancing = false
            }
          }
          if (lastMatch != null && keyOrd.compare(lastKey, lk) == 0) {
            resultProj(joined(lRow, lastMatch))
          } else {
            resultProj(joined(lRow, nullRight))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}
