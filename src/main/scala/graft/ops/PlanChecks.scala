package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SortExec, SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** In-plan scale assertions shared by the catalog queries that claim
  * "no stage funnels the corpus through one task" (q230's epoch shuffle,
  * q233's sequence packing) and by PlanLintSpec's catalog-wide lint — ONE
  * traversal so the copies cannot drift (a round-17 review found exactly
  * that: the query-side walks missed cached/AQE wrappers the lint handled).
  */
object PlanChecks {

  /** Does this subtree's spine pass through an Aggregate before reaching
    * raw rows? A no-partition Window (or single-partition Sort) whose
    * input is an aggregate frame is bounded by the GROUPING domain (the
    * bucketedCumsum offsets table: one row per bucket), not the corpus.
    * Walks through caches, reused exchanges and AQE wrappers — a frame
    * that already executed hides its aggregate behind a query stage.
    */
  def aggregatedSpine(p: SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => true
    case i: InMemoryTableScanExec => aggregatedSpine(i.relation.cachedPlan)
    case r: ReusedExchangeExec => aggregatedSpine(r.child)
    case a: AdaptiveSparkPlanExec => aggregatedSpine(a.executedPlan)
    case q: QueryStageExec => aggregatedSpine(q.plan)
    case u: UnaryExecNode => aggregatedSpine(u.child)
    case _ => false
  }

  /** Names of serial stages in `df`'s physical plan: Windows with no
    * partitionSpec and single-partition global Sorts whose input spine is
    * NOT an aggregate frame — the shapes that put the whole corpus on one
    * task. Empty result = the plan stays distributed.
    */
  def serialStages(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case wx: org.apache.spark.sql.execution.window.WindowExec
          if wx.partitionSpec.isEmpty && !aggregatedSpine(wx.child) =>
        wx.nodeName
      case srt: SortExec
          if srt.global && srt.child.outputPartitioning.numPartitions == 1 &&
            !aggregatedSpine(srt.child) => srt.nodeName
    }
}
