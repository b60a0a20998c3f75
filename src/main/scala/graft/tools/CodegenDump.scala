package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps every WholeStageCodegen unit of one catalog query's executed plan
  * to a file, so a Janino parse failure can be located by line number.
  * Diagnostic only.
  *
  *   sbt "runMain graft.tools.CodegenDump q226_ivfpq_index /root/testdata/sf0.01 /tmp/cg.txt"
  */
object CodegenDump {
  def main(args: Array[String]): Unit = {
    val Array(qname, sfDir, out) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.queries(qname)(spark, sfDir)
    val s = org.apache.spark.sql.execution.debug.codegenString(
      df.queryExecution.executedPlan)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), s)
    println(s"[cgdump] wrote ${s.length} chars to $out")
    spark.stop()
  }
}
