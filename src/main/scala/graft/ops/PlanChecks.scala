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

/** Registry of persisted tables that are bounded BY CONSTRUCTION — the
  * C-row codebook artifacts (coarse quantizer, PQ codebook: C a fixed
  * parameter, constant in corpus size) the ANN serving entries broadcast.
  * Registration happens at the ONE place each artifact is written (the
  * code that enforces the C-row bound), and PlanLintSpec's BNLJ check
  * certifies a broadcast side whose scan reads only registered paths —
  * so a future BNLJ over a corpus-scale table (the ivfpq INDEX lives in
  * the same workdir but is never registered) still fails the lint. The
  * registry replaces per-query marker multisets for these artifacts: the
  * markers counted plan-string occurrences, which multiply through
  * cached-subtree re-expansion and made the waivers count plan internals
  * instead of reviewed claims.
  */
object SmallArtifacts {
  private val paths =
    scala.collection.concurrent.TrieMap.empty[String, Unit]

  /** Register a table root (absolute, scheme-less) as bounded. */
  def register(path: String): Unit =
    paths.put(new org.apache.hadoop.fs.Path(path).toUri.getPath, ())

  /** Is `p` (any URI form) under a registered bounded table root? */
  def covers(p: org.apache.hadoop.fs.Path): Boolean = {
    val s = p.toUri.getPath
    paths.keysIterator.exists(r => s == r || s.startsWith(r + "/"))
  }
}
