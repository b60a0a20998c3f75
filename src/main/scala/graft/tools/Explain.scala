package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan-audit main: dumps `.explain("formatted")` for selected queries so
  * pushdown/broadcast/partial-agg behavior can be reviewed offline.
  * Usage: runMain graft.tools.Explain <sfDir> <outDir> [q01,q11,...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_plans"
    val only = if (args.length > 2) Some(args(2).split(",").toSet) else None
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => SparkEntry.selected(only, n) }
      .foreach { case (name, fn) =>
        try {
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
        } catch {
          case e: Throwable => System.err.println(s"[explain] $name: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
