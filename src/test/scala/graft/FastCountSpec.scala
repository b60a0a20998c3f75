package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lake.VersionedTable

/** Metadata-only COUNT(*): fastCount must equal the scan count through
  * every operation class that changes row visibility — tombstone-writing
  * MoR deletes, tombstone-preserving appends, tombstone-clearing restages
  * — and must refuse to answer (None) over an unreadable footer.
  */
class FastCountSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, String, Double)*): DataFrame =
    rows.toDF("k", "p", "v")

  private def agree(t: VersionedTable): Unit = {
    val fast = t.fastCount
    assert(fast.isDefined, "all footers readable — fastCount must answer")
    assert(fast.get == t.read.count(),
      s"fastCount ${fast.get} != scan ${t.read.count()}")
  }

  test("fastCount tracks the scan through overwrite, MoR delete, append, " +
      "and the restage that clears tombstones") {
    val t = VersionedTable(spark, tmpDir("fastcnt") + "/t", Seq("k"), Seq("p"))
    assert(t.fastCount.contains(0L))
    t.overwrite(df((1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0), (4, "b", 4.0)))
    agree(t)
    // MoR delete: tombstone rows subtract without restaging data
    t.deleteMor(col("k") === 2)
    agree(t)
    assert(t.fastCount.contains(3L))
    // append keeps the tombstone live (suppressed rows must not resurrect)
    t.append(df((5, "a", 5.0)))
    agree(t)
    assert(t.fastCount.contains(4L))
    // a merge restaging partition "a" materializes the delete and clears
    // its tombstones — counts must agree on the post-restage state too
    t.merge(df((1, "a", 10.0)))
    agree(t)
    assert(t.fastCount.contains(4L))
  }

  test("an unreadable footer makes fastCount answer None, never a wrong " +
      "number") {
    val t = VersionedTable(spark, tmpDir("fastcnt2") + "/t", Seq("k"), Seq("p"))
    t.overwrite(df((1, "a", 1.0), (2, "b", 2.0)))
    agree(t)
    // corrupt one live parquet file in place
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val leaf = fs.globStatus(
      new org.apache.hadoop.fs.Path(s"${t.path}/data/*/*/*.parquet")).head.getPath
    val out = fs.create(leaf, true)
    try out.write("not parquet".getBytes("UTF-8")) finally out.close()
    assert(t.fastCount.isEmpty)
  }
}
