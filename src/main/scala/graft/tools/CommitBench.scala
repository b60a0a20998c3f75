package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-path micro-benchmark: one partitioned VersionedTable, a bulk
  * build, then N small appends and N merges — the maintenance family's
  * fixed cost, isolated. Diagnostic only.
  *
  *   sbt "runMain graft.tools.CommitBench 12"
  */
object CommitBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(12)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = graft.ops.WorkDirs.workDir("graft_commitbench")
    // statsCols carries a DATA column, so footers are read at stage time
    // and the pk piggybacks its min/max — the posture of a production
    // table that wants data skipping AND collision-scan pruning. Drop "v"
    // to measure the partition-stats-only shortcut instead.
    val t = graft.lake.VersionedTable(spark, s"$work/t",
      Seq("id"), Seq("grp"), statsCols = Seq("grp", "v"))
    def batch(lo: Long, m: Long) = spark.range(lo, lo + m)
      .select(col("id"), pmod(col("id"), lit(16L)).as("grp"),
        (col("id") * 3).as("v"))
    t.overwrite(batch(0, 20000))
    // warm the code paths
    t.append(batch(1000000, 500))
    t.merge(batch(0, 500).withColumn("v", col("v") + 1))
    val t0 = System.nanoTime()
    (1 to n).foreach(i => t.append(batch(1000000L + i * 10000, 500)))
    val tA = System.nanoTime()
    (1 to n).foreach(i => t.merge(batch(i * 100L, 500).withColumn("v", col("v") + i)))
    val tM = System.nanoTime()
    println(f"[commitbench] n=$n append_avg=${(tA - t0) / 1e9 / n}%.3f s " +
      f"merge_avg=${(tM - tA) / 1e9 / n}%.3f s")
    spark.stop()
  }
}
