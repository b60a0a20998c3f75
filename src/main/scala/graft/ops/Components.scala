package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the cluster
  * step that follows near-dup PAIR detection in corpus dedup (all docs in
  * one transitive near-dup cluster collapse to one keeper).
  *
  * Each round every node takes the min of its own label and its
  * neighbors'; convergence needs O(diameter) rounds. The driver runs the
  * LOOP (one count per round to detect the fixpoint) but never holds data
  * — labels and edges stay distributed, exactly the GraphFrames/Pregel
  * shape. Near-dup graphs have tiny components (diameter ≤ a few), so the
  * round count is small and each round is one join + partial-agg shuffle.
  */
object Components {

  /** (id, cluster) for every node appearing in `edges`; cluster = the
    * component's minimum node id (deterministic).
    */
  def connectedComponents(
      edges: DataFrame, src: String, dst: String, maxIter: Int = 20): DataFrame = {
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .union(edges.select(col(dst).as("a"), col(src).as("b")))
      .persist()
    // try/finally: a job thrown mid-loop (or maxIter exhaustion) must not
    // strand the edge persist — this is the one persist whose lifetime
    // spans many jobs, so it cannot ride the per-query Caches registry
    // release, but it still must be released on EVERY exit path.
    try {
      val nodes = und.select(col("a").as("id")).distinct()
      // localCheckpoint each round: an iterative dataflow that only persists
      // keeps GROWING its logical plan (every round embeds the previous
      // round's joins) until analysis itself OOMs — checkpointing truncates
      // the lineage so round N's plan is always one join deep.
      var labels = nodes.select(col("id"), col("id").as("lbl")).localCheckpoint(true)
      var iter = 0
      var converged = false
      while (!converged && iter < maxIter) {
        val nbrMin = und
          .join(labels.select(col("id").as("b"), col("lbl").as("nlbl")), Seq("b"))
          .groupBy(col("a").as("id")).agg(min("nlbl").as("mn"))
        // Change detection rides ON the update row (chg = did this node's
        // label shrink?) instead of a separate next⋈labels join — and the
        // checkpoint is LAZY so the convergence count below both materializes
        // the round's labels and tallies changes in ONE job, not two.
        val next = labels.join(nbrMin, Seq("id"), "left")
          .select(col("id"),
            least(col("lbl"), coalesce(col("mn"), col("lbl"))).as("lbl"),
            coalesce(col("mn") < col("lbl"), lit(false)).as("chg"))
          .localCheckpoint(false)
        val changed = Phases.timed("cc-round") {
          next.filter(col("chg")).count() }
        labels = next.select("id", "lbl")
        converged = changed == 0
        iter += 1
      }
      labels.select(col("id"), col("lbl").as("cluster"))
    } finally und.unpersist()
  }
}
