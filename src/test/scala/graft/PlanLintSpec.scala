package graft

import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Catalog-wide physical-plan lint (VERDICT r15 #7, r16 #7) — four scale
  * claims as standing tests instead of per-round hand audits, all from ONE
  * pass that plans every query at sf0.001:
  *
  *  1. No CartesianProduct anywhere: both sides shuffled unbounded is
  *     never acceptable at 100 TB.
  *  2. Every BroadcastNestedLoopJoin's BROADCAST side must be provably
  *     small: a one-row aggregate (global agg, no grouping), a Limit, a
  *     driver-built LocalTableScan, or a stride-sampled codebook (the
  *     `% N = 0` filter whose stride derives from a COUNT — C rows by
  *     construction, the IVF-centroid pattern). A BNLJ broadcasting an
  *     unbounded side OOMs the driver at scale even though it avoids the
  *     cartesian shuffle.
  *  3. A scan of a PARTITIONED source whose PartitionFilters are empty
  *     must not sit under a Filter on one of its partition columns — that
  *     predicate should have pruned at the source (partition pruning is
  *     the literal IO knob the layouts exist for).
  *  4. No Window with an empty partitionSpec outside a reviewed
  *     bounded-frame allowlist: a global window funnels its whole input
  *     through ONE task, acceptable only when the frame is bounded by a
  *     value domain (count-of-counts, fixed bins), never by corpus size.
  *
  * Plan shape does not depend on SF for these plans (the compile-time
  * plan is inspected; no AQE runtime replan). Cached subtrees are looked
  * THROUGH (InMemoryTableScan → cachedPlan), so a cached codebook still
  * proves its bound.
  */
class PlanLintSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  /** The plan tree flattened through the wrappers that hide subtrees:
    * adaptive roots, query stages, reused exchanges and cached relations.
    */
  private def expand(p: SparkPlan): Seq[SparkPlan] = {
    val through = p match {
      case a: AdaptiveSparkPlanExec => expand(a.executedPlan)
      case q: QueryStageExec => expand(q.plan)
      case i: InMemoryTableScanExec => expand(i.relation.cachedPlan)
      case r: ReusedExchangeExec => expand(r.child)
      case _ => Seq.empty
    }
    Seq(p) ++ through ++ p.children.flatMap(expand)
  }

  /** Is this broadcast-side subtree provably small? The check walks the
    * SPINE (through projections/exchanges/codegen wrappers only — a Join
    * or Union on the spine fails: `bigTable JOIN oneRowAgg` must not pass
    * because one branch is small) and requires the bounding node itself:
    * a one-row aggregate (global agg, no grouping), a Limit, a
    * driver-built LocalTableScan, or — directly over a scan — an id-keyed
    * filter of the two codebook forms: `(id % <lit>) = 0` (stride sample,
    * C rows by construction with the stride derived from a COUNT) or
    * `id < <n≤99>` (the fixed probe set over a non-negative unique id).
    * Both filter forms are restricted to `*id`-named columns so a small
    * literal on a non-key column (`n_chars < 20` — unbounded rows) never
    * certifies.
    */
  private def provablySmall(side: SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def isIdAttr(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name.toLowerCase.endsWith("id")
      case c: Cast => isIdAttr(c.child)
      case _ => false
    }
    def codebookFilter(cond: Expression): Boolean = cond match {
      case And(l, r) => codebookFilter(l) || codebookFilter(r)
      case EqualTo(Pmod(a, _: Literal, _), z: Literal)
          if String.valueOf(z.value) == "0" => isIdAttr(a)
      case EqualTo(Remainder(a, _: Literal, _), z: Literal)
          if String.valueOf(z.value) == "0" => isIdAttr(a)
      case LessThan(a, Literal(v: Long, _)) => isIdAttr(a) && v <= 99
      case LessThan(a, Literal(v: Int, _)) => isIdAttr(a) && v <= 99
      case _ => false
    }
    def spine(p: SparkPlan): Boolean = p match {
      case _: LocalTableScanExec => true
      // a scan reading ONLY registered bounded-by-construction artifact
      // paths (the C-row codebook tables, registered at their single
      // write site — graft.ops.SmallArtifacts) is certified; the
      // corpus-scale index tables in the same workdirs are never
      // registered, so a fat BNLJ over them still fails
      case scan: FileSourceScanExec
          if scan.relation.location.rootPaths.nonEmpty &&
            scan.relation.location.rootPaths
              .forall(graft.ops.SmallArtifacts.covers) => true
      case agg: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
        agg.groupingExpressions.isEmpty || spine(agg.child)
      case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec => true
      case _: TakeOrderedAndProjectExec => true // top-k IS a limit
      case f: FilterExec => codebookFilter(f.condition) || spine(f.child)
      case a: AdaptiveSparkPlanExec => spine(a.executedPlan)
      case q: QueryStageExec => spine(q.plan)
      case i: InMemoryTableScanExec => spine(i.relation.cachedPlan)
      case r: ReusedExchangeExec => spine(r.child)
      // pass-through wrappers: one child, no row multiplication
      case u: UnaryExecNode => spine(u.child)
      // a join/union of two provably-small sides stays bounded
      // (|L×R| ≤ |L|·|R|); one big branch fails, as it must
      case b: BinaryExecNode => spine(b.left) && spine(b.right)
      case _ => false // unbounded scan on the spine — not provably small
    }
    spine(side)
  }

  /** BNLJ broadcast sides that are bounded by CONSTRUCTION but statically
    * opaque — each entry is a reviewed claim keyed on (query, side-plan
    * fingerprint MULTISET): every non-provable BNLJ side must CONSUME one
    * marker whose string appears in its plan (so the multiset's size is
    * also the max count, and two sides cannot ride the same marker), and
    * a FUTURE unbounded BNLJ in one of these queries (different shape, or
    * one more of them) still fails the lint instead of riding a
    * name-keyed waiver (ADVICE r16 + the round-17 review).
    */
  private case class ReviewedBnlj(markers: Seq[String], reason: String)
  private val reviewedBnlj: Map[String, ReviewedBnlj] = Map(
    "q25_cross_join" -> ReviewedBnlj(Seq("region.parquet"),
      "broadcasts the region dimension scan — a fixed 5-row domain table " +
        "(the deliberate cross-join demo)"),
    "q203_skew_report" -> ReviewedBnlj(Seq("below", "below", "below"),
      "broadcasts the three percentile rank-pick frames (filters over the " +
        "count-of-counts frame, keyed by its `below` prefix sums — " +
        "O(distinct per-key counts) rows)"))
    // The ANN codebook-artifact broadcasts (q216/q226/q231/q234/q242/
    // q243/q245) no longer need marker waivers: their scans read ONLY
    // paths registered in graft.ops.SmallArtifacts at the artifacts'
    // single write sites, and provablySmall certifies exactly those —
    // a per-query multiset cannot survive cached-subtree re-expansion,
    // which duplicates the same artifact scan many times per plan.

  /** Window operators with an EMPTY partitionSpec run their whole input
    * through one task — acceptable only over a provably bounded frame.
    * Each entry is a reviewed site: frames bounded by a value DOMAIN
    * (count-of-counts, fixed bins), never by corpus size, with the
    * per-query count pinned so a NEW unbounded global window in these
    * queries (or anywhere else) fails the lint (VERDICT r16 #7).
    */
  private val reviewedGlobalWindow: Map[String, (Int, String)] = Map(
    "q203_skew_report" -> (3,
      "exclusive-prefix sum over the count-of-counts frame — one row per " +
        "DISTINCT per-key count, O(value domain) not O(keys); the frame " +
        "subtree is replicated into each of the three percentile branches"),
    "q204_length_buckets" -> (1,
      "prefix sum over the distinct n_chars value domain (bounded by the " +
        "doc-length range, constant in corpus size)"),
    "q210_quantile_sketch_rollup" -> (2,
      "cumulative sum over the fixed histogram bin domain (≤ bin count " +
        "rows by construction) + the exact arm's bucketedCumsum offsets " +
        "frame (constant part key folds away; O(buckets) rows)"),
    "q190_pps_sample" -> (1,
      "bucketedCumsum offsets frame — exclusive prefix over the 32-row " +
        "bucket-subtotal table (the constant `__all` part key folds away, " +
        "leaving an empty partitionSpec over an O(buckets) aggregate)"),
    "q230_epoch_shuffle" -> (1,
      "bucketedCumsum offsets frame — exclusive prefix over the 32-row " +
        "bucket-subtotal table (the constant part key folds away, leaving " +
        "an empty partitionSpec over an O(buckets) aggregate)"),
    "q233_sequence_pack" -> (1,
      "bucketedCumsum offsets frame over the 32-row bucket-subtotal " +
        "table — q230's shape for the global token prefix sums"),
    "q251_classifier_gate_wide" -> (2,
      "cumulative count over the DISTINCT-margin histogram (map-combined " +
        "aggregate, one row per distinct integer margin — the classic " +
        "exact-order-statistic calibration spine, q204's distinct-value-" +
        "domain argument), one per width arm"))

  test("catalog plans: no cartesian, bounded broadcasts, pruned partition scans") {
    graft.expr.GraftFunctions.register(spark)
    val cartesian = scala.collection.mutable.ListBuffer.empty[String]
    val fatBnlj = scala.collection.mutable.ListBuffer.empty[String]
    val unpruned = scala.collection.mutable.ListBuffer.empty[String]
    val serialWindow = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.executedPlan
        val nodes = expand(plan)
        if (nodes.exists(_.isInstanceOf[joins.CartesianProductExec]))
          cartesian += name
        // markers are a multiset CONSUMED one per unproven side — two
        // sides cannot ride the same marker, and the multiset size is the
        // per-query ceiling
        val markerPool = scala.collection.mutable.Buffer(
          reviewedBnlj.get(name).map(_.markers).getOrElse(Seq.empty): _*)
        nodes.foreach {
          case b: BroadcastNestedLoopJoinExec =>
            val side = b.buildSide match {
              case BuildLeft => b.left
              case BuildRight => b.right
            }
            if (!provablySmall(side)) {
              val i = markerPool.indexWhere(m => side.toString.contains(m))
              if (i >= 0) markerPool.remove(i)
              else
                fatBnlj += s"$name (${side.nodeName}: ${
                  side.simpleStringWithNodeId().take(90)})"
            }
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty =>
            // allowlisted queries must ALSO prove the frame bounded: the
            // window's input spine passed through an aggregate (the
            // count-of-counts / bucket-subtotal frame) — a refactor to the
            // naive row_number-over-the-corpus form fails even here
            // (graft.ops.PlanChecks.aggregatedSpine — shared with the
            // in-query require()s so the walks cannot drift)
            val allowed = reviewedGlobalWindow.get(name).exists { case (n, _) =>
              graft.ops.PlanChecks.aggregatedSpine(w.child) && nodes.count {
                case ww: org.apache.spark.sql.execution.window.WindowExec =>
                  ww.partitionSpec.isEmpty
                case _ => false
              } <= n
            }
            if (!allowed)
              serialWindow += s"$name (${w.simpleStringWithNodeId().take(90)})"
          case scan: FileSourceScanExec
              if scan.relation.partitionSchema.nonEmpty &&
                scan.partitionFilters.isEmpty =>
            val partCols = scan.relation.partitionSchema.map(_.name.toLowerCase).toSet
            // only a Filter that is an ANCESTOR of this scan indicts it —
            // a same-named predicate on another relation is unrelated —
            // and only a PRUNABLE form does: partition attr vs LITERAL
            // (a row-diff like `a.yr <=> b.yr` references the column but
            // could never prune)
            import org.apache.spark.sql.catalyst.expressions._
            def isPartAttr(x: Expression): Boolean = x match {
              case a: AttributeReference => partCols.contains(a.name.toLowerCase)
              case c: Cast => isPartAttr(c.child)
              case _ => false
            }
            def prunable(e: Expression): Boolean = e.collectFirst {
              case b: BinaryComparison
                  if (isPartAttr(b.left) && b.right.isInstanceOf[Literal]) ||
                    (isPartAttr(b.right) && b.left.isInstanceOf[Literal]) => b
              case i: In
                  if isPartAttr(i.value) && i.list.forall(_.isInstanceOf[Literal]) => i
              case i: InSet if isPartAttr(i.child) => i
            }.isDefined
            val indicted = nodes.exists {
              case f: FilterExec =>
                expand(f).exists(_ eq scan) && prunable(f.condition)
              case _ => false
            }
            if (indicted) unpruned += s"$name (${
              scan.relation.location.rootPaths.headOption.getOrElse("?")})"
          case _ => ()
        }
      } catch {
        case e: Throwable =>
          cartesian += s"$name (failed to plan: ${e.getMessage.take(120)})"
      } finally graft.ops.Caches.releaseAll()
    }
    assert(cartesian.isEmpty,
      s"cartesian products / planning failures: ${cartesian.mkString(", ")}")
    assert(fatBnlj.isEmpty,
      s"BNLJ broadcasting a side not provably small: ${fatBnlj.mkString("; ")}")
    assert(unpruned.isEmpty,
      s"partitioned scans ignoring a partition predicate: ${unpruned.mkString("; ")}")
    assert(serialWindow.isEmpty,
      s"global (empty-partitionSpec) Window outside the reviewed bounded-frame " +
        s"allowlist: ${serialWindow.distinct.mkString("; ")}")
  }
}
