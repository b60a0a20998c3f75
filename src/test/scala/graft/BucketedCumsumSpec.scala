package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Exprs

/** Two-level prefix sum ([[graft.ops.Exprs.bucketedCumsum]]): the scale-safe
  * replacement for a per-partition unbounded-preceding running SUM (q72 shard
  * packing, q148 domain mixture). Proves (a) exact result-identity against
  * the plain single-window cumsum, including duplicate order keys and skewed
  * bucket sizes, and (b) the physical plan sorts only within
  * (part, bucket) — no per-part-only global sort remains.
  */
class BucketedCumsumSpec extends SparkSpec {
  import spark.implicits._

  private def plainCumsum = {
    val w = Window.partitionBy("src").orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    (df: org.apache.spark.sql.DataFrame) =>
      df.withColumn("cum", sum(col("v")).over(w))
  }

  test("matches the single-window running sum exactly, with duplicate " +
      "order keys and skewed buckets") {
    // k deliberately collides across rows (k = id % 7) and bucket sizes are
    // skewed (k in 0..6 → buckets 0..3 of width 2 hold unequal counts)
    val df = (1 to 500).map { i =>
      (s"src${i % 3}", i.toLong, (i % 7).toLong, (i % 11 + 1).toLong)
    }.toDF("src", "id", "k", "v")
    val expected = plainCumsum(df)
      .select("src", "id", "cum").as[(String, Long, Long)].collect().toSet
    val got = Exprs.bucketedCumsum(df, "src", (col("k") / 2).cast("long"),
        Seq(col("k"), col("id")), "v", "cum")
      .select("src", "id", "cum").as[(String, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("a bucket with no rows for some part and single-bucket degenerate " +
      "input both reduce correctly") {
    // srcA occupies only bucket 0, srcB only bucket 5: each part sees
    // bucket ids with gaps, and the exclusive-offset window must coalesce
    // the missing predecessor subtotals to 0
    val df = Seq(
      ("a", 1L, 0L, 10L), ("a", 2L, 0L, 20L),
      ("b", 3L, 5L, 1L), ("b", 4L, 5L, 2L), ("b", 5L, 5L, 3L)
    ).toDF("src", "id", "k", "v")
    val got = Exprs.bucketedCumsum(df, "src", col("k"), Seq(col("k"), col("id")),
        "v", "cum")
      .select("src", "id", "cum").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 10L), ("a", 2L, 30L),
      ("b", 3L, 1L), ("b", 4L, 3L), ("b", 5L, 6L)))
  }

  test("NULL part and bucket keys stay in their window null-group — the " +
      "null-safe offsets join must not drop them") {
    // the plain window keeps a NULL src (and a NULL bucket key) as its own
    // partition/order group; the helper's broadcast join back from the
    // subtotals frame must match those rows too (<=>), not discard them
    val df = Seq(
      (null.asInstanceOf[String], 1L, 0L, 5L),
      (null.asInstanceOf[String], 2L, 1L, 7L),
      ("a", 3L, 0L, 1L), ("a", 4L, 1L, 2L)
    ).toDF("src", "id", "k", "v")
    val expected = plainCumsum(df)
      .select("id", "cum").as[(Long, Long)].collect().toSet
    val got = Exprs.bucketedCumsum(df, "src", col("k"),
        Seq(col("k"), col("id")), "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got == Set((1L, 5L), (2L, 12L), (3L, 1L), (4L, 3L)))
  }

  test("the wide window sorts within (part, bucket), never by part alone") {
    val df = (1 to 100).map { i =>
      (s"src${i % 2}", i.toLong, (i % 8).toLong, 1L)
    }.toDF("src", "id", "k", "v")
    val plan = Exprs.bucketedCumsum(df, "src", col("k"), Seq(col("k"), col("id")),
        "v", "cum")
      .queryExecution.executedPlan.toString
    // every Window over the full-width frame partitions by [src, __bkt];
    // the only partition-by-src-alone window is the per-bucket-subtotal
    // offsets frame, whose input is one row per (src, bucket)
    val wideWindows = plan.linesIterator
      .filter(l => l.contains("Window") && l.contains("unboundedpreceding"))
      .toSeq
    assert(wideWindows.nonEmpty)
    val bySrcAlone = wideWindows.filterNot(_.contains("__bkt"))
    // the src-alone window exists only on the aggregated subtotals (its
    // frame carries __bt, the bucket total) — never on the raw rows
    assert(bySrcAlone.forall(_.contains("__bt")), plan)
  }
}
