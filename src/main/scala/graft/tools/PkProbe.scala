package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Micro-probe for the composite-pk merge question (VERDICT r15 #3): runs
  * the q118-shape maintenance flow with the curated table keyed (doc_id)
  * vs (doc_id, lang), in BOTH per-batch forms — the merge + matched-delete
  * PAIR (the general merge path the pk question is about) and the single
  * conditional mergeInto q118 itself now uses — alternating in one warm
  * JVM, and prints per-variant wall times. Pair with SPARK_GRAFT_TIMING=1
  * to attribute a delta to a commit-path phase (stage / probe / stats).
  * Usage:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.PkProbe"
  */
object PkProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def flow(pk: Seq[String], combined: Boolean): Double = {
      val work = graft.ops.WorkDirs.workDir(
        s"graft_pkprobe_${pk.size}_$combined")
      val src = graft.lake.VersionedTable(spark, s"$work/src", Seq("doc_id"),
        Seq("lang"), recordCdf = true)
      val curated = graft.lake.VersionedTable(spark, s"$work/curated",
        pk, Seq("lang"))
      def applyBatch(batch: DataFrame): Unit = {
        val ord = col("_commit_version") * 2 +
          when(col("change_type") === "update_preimage", 0).otherwise(1)
        val latest = batch.groupBy("doc_id")
          .agg(max_by(struct(batch.columns.filter(_ != "doc_id").map(col): _*),
            ord).as("x"))
          .select(col("doc_id") +: batch.columns.filter(_ != "doc_id")
            .map(c => col(s"x.$c").as(c)): _*)
          .persist()
        try {
          val keep = latest
            .filter(col("change_type").isin("insert", "update_postimage") &&
              col("n_chars") >= 200)
            .drop("change_type", "_commit_version")
          val drop = latest
            .filter(col("change_type") === "delete" || col("n_chars") < 200)
            .select("doc_id", "lang")
          if (combined && curated.exists)
            curated.mergeInto(latest)
              .whenMatched(expr("s.change_type = 'delete' OR s.n_chars < 200"))
                .delete()
              .whenMatched().updateAll()
              .whenNotMatched(expr(
                "s.change_type IN ('insert', 'update_postimage') AND s.n_chars >= 200"))
                .insertAll()
              .execute()
          else {
            if (!keep.isEmpty) curated.merge(keep)
            if (curated.exists && !drop.isEmpty)
              curated.mergeInto(drop).whenMatched().delete().execute()
          }
        } finally latest.unpersist(false)
      }
      def drain(): Unit = {
        val q = src.readChangesStream()
          .writeStream
          .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val t0 = System.nanoTime()
      src.overwrite(spark.read.parquet(s"$sfDir/documents.parquet"))
      drain()
      src.update(col("doc_id") % 10 === 0,
        Map("n_chars" -> (col("n_chars") + 7)))
      src.update(col("doc_id") % 9 === 0,
        Map("n_chars" -> (col("n_chars") - 150)))
      drain()
      src.deleteMor(col("doc_id") % 17 === 0)
      drain()
      val n = curated.read.count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[pkprobe] pk=${pk.mkString(",")}%-14s combined=$combined%-5s $sec%7.3f s  ($n rows)")
      sec
    }

    val single = Seq("doc_id")
    val composite = Seq("doc_id", "lang")
    flow(single, combined = false); flow(composite, combined = false) // warm-up
    val reps = 2
    val times = (1 to reps).flatMap { _ =>
      Seq(
        "single/pair" -> flow(single, combined = false),
        "composite/pair" -> flow(composite, combined = false),
        "single/combined" -> flow(single, combined = true),
        "composite/combined" -> flow(composite, combined = true))
    }
    val by = times.groupBy(_._1).view.mapValues(v => v.map(_._2))
    by.foreach { case (k, v) =>
      println(f"$k: min ${v.min}%.3f s, avg ${v.sum / v.size}%.3f s over ${v.size}")
    }
    spark.stop()
  }
}
