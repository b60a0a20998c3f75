package graft.tools

import org.apache.spark.sql.SparkSession

/** Cold-entry cost recorder (VERDICT r20 #8): times the FIRST execution
  * of each named query in a fresh JVM — the honest per-entry cost of the
  * fixture-memoized lifecycles (q252/q258/q259), whose sweep numbers
  * exclude training once the warm-up pass has populated the per-modality
  * IvfPqFixture memo — and a second, warm execution beside it. One JSON
  * line per query: {"q":...,"cold_sec":...,"warm_sec":...}.
  *
  *   SPARK_GRAFT_ONLY=q252_image_ann_ivfpq,q258_audio_ann_ivfpq,q259_passage_retrieval \
  *     sbt "runMain graft.tools.ColdBench"
  */
object ColdBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def s3(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", d)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      finally graft.ops.Caches.releaseAll()
      (System.nanoTime() - t0) / 1e9
    }
    // absorb generic JVM/codegen/first-scan warm-up on an unrelated cheap
    // query, so the first measured entry's cold number is ITS cost, not
    // the process's (round-1 artifact: q01 reported 23.4 s of which ~21 s
    // was warm-up)
    graft.SparkEntry.queries.get("q01_cast_enforce").foreach(once)
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => graft.SparkEntry.selected(only, n) }
      .foreach { case (name, fn) =>
        val cold = once(fn)
        val warm = once(fn)
        println(s"""{"q":"$name","cold_sec":${s3(cold)},"warm_sec":${s3(warm)}}""")
      }
    spark.stop()
  }
}
