package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (morton) clustering for multi-column data skipping — Delta's
  * `OPTIMIZE ZORDER BY` re-expressed as a layout transform.
  *
  * Single-column skipping is free when data arrives ordered by that
  * column (time, usually); any SECOND column's values then smear across
  * every file and its min/max prune nothing. Z-ordering interleaves the
  * bit patterns of several columns' bucket ranks so that rows close in
  * ANY dimension land close in the layout: every z-bucket covers a narrow
  * value range of EACH column, so per-dir min/max stats
  * ([[VersionedTable.statsCols]]) prune on whichever column the predicate
  * touches.
  *
  * Bucketing uses approx-quantile cuts, not (min,max) width — rank-based
  * buckets stay balanced under skew, which is what keeps z-bucket dirs
  * uniformly sized at 100 TB. The cuts are one driver-side
  * `stat.approxQuantile` pass over the input (Delta computes its z-cube
  * boundaries the same way); the bucket-index and bit-interleave
  * expressions are plain comparisons/shifts — codegen'd, no UDF.
  */
object ZOrder {

  /** `df` plus a `zb` column: the morton interleave of `bitsPerCol`-bit
    * quantile-bucket ranks of `cols` (so `zb` ranges over
    * `2^(cols.size * bitsPerCol)` values). Partition the result by `zb`
    * (e.g. a [[VersionedTable]] with `partitionCols = Seq("zb")`,
    * `statsCols = cols`) to get multi-dimensional skipping. Numeric
    * columns only — quantile cuts are defined on doubles.
    */
  def withZBucket(df: DataFrame, cols: Seq[String], bitsPerCol: Int = 2): DataFrame = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bitsPerCol >= 1 && bitsPerCol * cols.size <= 20,
      s"zb would have ${bitsPerCol * cols.size} bits; keep dirs coarse (≤ 20 bits)")
    val nBuckets = 1 << bitsPerCol
    // interior quantile cuts per column: value ≥ cut(i) ⇒ bucket > i.
    // The multi-column approxQuantile overload summarizes every column in
    // ONE job — per-column calls would scan the input N times
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val cuts: Map[String, Array[Double]] =
      cols.zip(df.stat.approxQuantile(cols.toArray, probes, 0.01)).toMap
    // branch-free bucket rank: count of cuts the value clears (nulls → 0)
    def bucket(c: String): Column =
      cuts(c).foldLeft(lit(0)) { (acc, cut) =>
        acc + when(col(c) >= lit(cut), 1).otherwise(0)
      }
    val n = cols.size
    val morton = (0 until bitsPerCol).flatMap { j =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftrightunsigned(bucket(c), j).bitwiseAND(lit(1)), j * n + i)
      }
    }.reduce(_.bitwiseOR(_))
    df.withColumn("zb", morton)
  }
}
