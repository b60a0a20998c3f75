package graft.tools

import org.apache.spark.sql.SparkSession

/** Strict-codegen sweep: runs every catalog query with
  * `spark.sql.codegen.fallback=false` and CODEGEN_ONLY factory mode, so a
  * generated-code CompileException THROWS with the query name instead of
  * silently degrading that plan to interpreted evaluation (the r20 Verify
  * run logged exactly one such Janino fallback; this tool is how it gets
  * attributed). Diagnostic only — not part of the driver contract.
  *
  *   sbt "runMain graft.tools.StrictCodegen /root/testdata/sf0.01"
  */
object StrictCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    var bad = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => graft.SparkEntry.selected(only, n) }
      .foreach { case (name, fn) =>
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(s"[strict] $name OK")
        } catch { case e: Throwable =>
          bad += 1
          val msg = Option(e.getMessage).getOrElse("").linesIterator
            .take(12).mkString(" | ")
          println(s"[strict] $name CODEGEN-FAIL: ${e.getClass.getSimpleName}: $msg")
        } finally graft.ops.Caches.releaseAll()
      }
    println(s"[strict] done, $bad failures")
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
