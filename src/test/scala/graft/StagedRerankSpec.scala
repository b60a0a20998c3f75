package graft

import org.apache.spark.sql.functions._

/** Property test of q240's staged-retrieval monotonicity, driving the
  * SHIPPED pipeline (VectorOps.stagedRerankFrame) over RANDOM vector sets:
  * any exact-top-5 member that reaches the 20-row truncated-cosine
  * shortlist must survive a full-cosine rerank of that shortlist (at most
  * 4 rows can outrank it), so per query
  *
  *   n_hit_reranked ≥ n_hit_stage1
  *
  * holds for EVERY vector distribution — including adversarial ones where
  * the 16-dim prefix is uninformative — provided the tie-breaks stay the
  * consistent (score, vec_id) total order on every arm. A violation on any
  * seed means a tie-break or join drifted, which is exactly the regression
  * class the sf-pinned catalog entry cannot distinguish from data change.
  * Seeds are pinned — deterministic, no flaky CI.
  */
class StagedRerankSpec extends SparkSpec {
  import spark.implicits._

  test("∀ vector sets: rerank never loses recall vs its shortlist prefix") {
    graft.expr.GraftFunctions.register(spark)
    (1L to 5L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // 80 vectors, 64 dims; seed 3 makes the prefix dims NEAR-CONSTANT
      // (truncated cosine maximally uninformative — the rerank must do
      // all the work), the rest are uniform
      val flat = seed == 3L
      val rows = (0L until 80L).map { i =>
        val v = Array.tabulate(64) { j =>
          if (flat && j < 16) 0.5f + rnd.nextFloat() * 0.001f
          else rnd.nextFloat() * 2f - 1f
        }
        (i, v.toSeq)
      }
      val e = rows.toDF("vec_id", "embedding")
      val out = graft.ext.VectorOps
        .stagedRerankFrame(e, col("vec_id") < 8)
        .collect()
      assert(out.length == 8, s"seed=$seed rows=${out.length}")
      out.foreach { r =>
        val (q, h1, h2) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(h2 >= h1,
          s"seed=$seed q=$q reranked=$h2 < stage1=$h1 — shortlist " +
            "survival violated (tie-break or join drift)")
      }
      // the rerank must also be exercised non-vacuously across seeds: the
      // full-dim arm recovers at least one exact-top-5 member somewhere
      assert(out.map(_.getLong(2)).sum > 0, s"seed=$seed zero reranked hits")
    }
  }
}
