package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical AS-OF join: for every left row, the latest right row with
  * `rightTs <= leftTs` on equal keys; `payload` (right-side value columns)
  * is appended to the left row, null when no right row qualifies.
  *
  * This is the (c)-level extension route — custom LogicalPlan + Strategy +
  * SparkPlan — for an operator Spark lacks natively. The composition-based
  * [[graft.ops.AsofJoin]] (union + running-last window) stays as the
  * portable formulation; this node exists because the dedicated physical
  * operator can do the same work with a plain per-partition MERGE instead
  * of a window over the unioned rows (no tag columns, no null-carrying,
  * and the right side never materializes into window buffers).
  */
case class AsofJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}
