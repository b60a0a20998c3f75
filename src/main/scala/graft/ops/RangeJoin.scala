package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-range join — pairs (l, r) on equal keys with
  * `r.ts ∈ [l.ts + lo, l.ts + hi]`. Spark plans a raw inequality join as a
  * per-key nested loop; for a BOUNDED range the scale-correct shape is bin
  * bucketing: bucket both sides into windows of width (hi−lo+1), equi-join
  * on (key, bin) — each left row lands in at most two bins, each right row
  * in exactly one, so every qualifying pair matches exactly once and the
  * join stays a hash/sort-merge equi-join.
  */
object RangeJoin {

  /** Inner pair matches: left.* ++ right's non-key columns. Column names
    * must not collide across sides (rename before calling).
    */
  def rangeJoinPairs(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      lo: Long,
      hi: Long): DataFrame = {
    require(hi >= lo, s"empty range [$lo, $hi]")
    val collisions = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(collisions.isEmpty, s"column collision between sides: ${collisions.mkString(",")}")
    val binW = math.max(hi - lo + 1, 1L)
    val leftB = left.withColumn("__bin",
      explode(sequence(
        floor((col(leftTs) + lo) / binW).cast("long"),
        floor((col(leftTs) + hi) / binW).cast("long"))))
    val rightB = right.withColumn("__bin", floor(col(rightTs) / binW).cast("long"))
    leftB.join(rightB, keys :+ "__bin")
      .filter(col(rightTs).between(col(leftTs) + lo, col(leftTs) + hi))
      .drop("__bin")
  }
}
