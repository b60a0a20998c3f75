package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical AS-OF join: EnsureRequirements co-partitions both children on
  * the keys and sorts them by (keys, ts); `doExecute` then zips partitions
  * and runs a single forward merge — each right row is visited ONCE per
  * partition, the only state is the latest qualifying right row.
  *
  * Scale shape: one hash shuffle per side (none when the data is already
  * bucketed/partitioned by key), sort, then a streaming O(|L|+|R|) pass
  * with O(1) state — the asof algorithm a hand-written engine would run,
  * expressed as a first-class Spark operator.
  */
case class AsofJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    payload: Seq[Attribute],
    output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTsProj = UnsafeProjection.create(Seq(leftTs), left.output)
      val rTsProj = UnsafeProjection.create(Seq(rightTs), right.output)
      val payloadProj = UnsafeProjection.create(payload, right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))
      val nullPayload = new GenericInternalRow(payload.length)
      val joined = new JoinedRow
      // downstream operators require UnsafeRow output; the input schema
      // must carry NULLABLE payload attrs or the generated projection
      // skips null checks and reads unmatched rows as zeros
      val resultProj = UnsafeProjection.create(output,
        left.output ++ payload.map(_.withNullability(true)))

      val rBuf = rIter.buffered
      // the latest right row (projected to payload) whose key matches
      // `lastKey` — both copied, because projections reuse their buffers
      var lastKey: InternalRow = null
      var lastPayload: InternalRow = null

      lIter.map { l =>
        val lk = lKeyProj(l)
        // SQL equi-join semantics: a NULL key never matches (RowOrdering's
        // natural ordering would treat NULL = NULL as equal) — emit the
        // left row unmatched without touching the merge state. Null-keyed
        // RIGHT rows sort first and are discarded by the c < 0 branch
        // before any non-null left key, so they can never become lastKey.
        if (lk.anyNull) resultProj(joined(l, nullPayload))
        else {
        val lts = lTsProj(l).copy()
        var done = false
        while (!done && rBuf.hasNext) {
          val rk = rKeyProj(rBuf.head)
          val c = keyOrd.compare(rk, lk)
          if (c > 0) done = true // right is ahead; keep for a later left key
          else if (c < 0) { rBuf.next() } // behind every remaining left key
          else {
            val rts = rTsProj(rBuf.head)
            if (tsOrd.compare(rts, lts) <= 0) {
              lastKey = rk.copy()
              lastPayload = payloadProj(rBuf.head).copy()
              rBuf.next()
            } else done = true // too new for this left row (and later same-key rows are newer)
          }
        }
        val matched = lastKey != null && keyOrd.compare(lastKey, lk) == 0
        resultProj(joined(l, if (matched) lastPayload else nullPayload))
        }
      }
    }
  }
}
