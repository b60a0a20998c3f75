package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.streaming.StreamOps

/** Streaming dead-letter quarantine (the q196 shape): PERMISSIVE JSON
  * ingest routes malformed lines to a quarantine table and clean rows to
  * the main table, idempotently under foreachBatch's at-least-once replay
  * and exactly once across checkpointed restarts.
  */
class DlqSpec extends SparkSpec {

  private val sch = StructType(Seq(
    StructField("k", LongType),
    StructField("v", StringType),
    StructField("_corrupt", StringType)))

  private def runDrop(work: String): Unit = {
    val q = spark.readStream.schema(sch)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(s"$work/feed")
      .writeStream
      .foreachBatch(StreamOps.routeDlqBatch(work) _)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def mainDf(work: String) =
    spark.read.parquet(s"$work/main").drop("batch")
  private def dlqDf(work: String) =
    spark.read.parquet(s"$work/dlq").drop("batch")

  test("corrupt lines quarantine, clean lines pass, exactly once across two checkpointed drops") {
    val work = graft.ops.WorkDirs.workDir("graft_dlqspec")
    Files.createDirectories(Paths.get(s"$work/feed"))
    Files.write(Paths.get(s"$work/feed/a.json"),
      """{"k": 1, "v": "ok1"}
        |{broken line one
        |{"k": 2, "v": "ok2"}""".stripMargin.getBytes("UTF-8"))
    runDrop(work)
    assert(mainDf(work).count() == 2)
    assert(dlqDf(work).count() == 1)

    // second drop through the SAME checkpoint: only the new file is read —
    // batch-1 rows must not re-append
    Files.write(Paths.get(s"$work/feed/b.json"),
      """{"k": 3, "v": "ok3"}
        |{also broken
        |{"k": "not a long", "v": "type clash"}""".stripMargin.getBytes("UTF-8"))
    runDrop(work)
    assert(mainDf(work).count() == 3, "clean rows exactly once across both drops")
    // the type-clash line is malformed FOR THE SCHEMA, not just bad JSON —
    // PERMISSIVE must quarantine it too
    assert(dlqDf(work).count() == 3)
    assert(mainDf(work).select(sum(col("k"))).head.getLong(0) == 6L)
    assert(dlqDf(work).filter(col("raw").contains("not a long")).count() == 1)
  }

  test("a replayed batch lands idempotently — the at-least-once foreachBatch contract") {
    import spark.implicits._
    val work = graft.ops.WorkDirs.workDir("graft_dlqreplay")
    val batch = Seq(
      (Some(1L), Some("ok"), None: Option[String]),
      (None, None, Some("{broken")))
      .toDF("k", "v", "_corrupt")
    // same batchId delivered twice (crash between sink write and
    // checkpoint commit) — the batch-keyed overwrite must not double-count
    StreamOps.routeDlqBatch(work)(batch, 0L)
    StreamOps.routeDlqBatch(work)(batch, 0L)
    assert(mainDf(work).count() == 1)
    assert(dlqDf(work).count() == 1)
    // a NEW batch id accumulates rather than clobbering prior batches
    StreamOps.routeDlqBatch(work)(batch, 1L)
    assert(mainDf(work).count() == 2)
    assert(dlqDf(work).count() == 2)
  }

  test("an all-clean feed leaves the quarantine readable (and vice versa)") {
    import spark.implicits._
    val work = graft.ops.WorkDirs.workDir("graft_dlqclean")
    val clean = Seq((Some(1L), Some("ok"), None: Option[String]),
      (Some(2L), Some("ok2"), None: Option[String])).toDF("k", "v", "_corrupt")
    StreamOps.routeDlqBatch(work)(clean, 0L)
    // nothing was corrupt: no dlq batch dir may exist (an empty parquet
    // dir would break schema inference on the parent), and the tolerant
    // reader hands back a typed empty frame instead of throwing
    assert(!Files.exists(Paths.get(s"$work/dlq")))
    val dlqSch = StructType(Seq(StructField("raw", StringType)))
    assert(StreamOps.readDlqSink(spark, s"$work/dlq", dlqSch).count() == 0)
    assert(mainDf(work).count() == 2)

    // mirror image: an all-corrupt batch must leave main absent-but-readable
    val corrupt = Seq((None: Option[Long], None: Option[String], Some("{broken")))
      .toDF("k", "v", "_corrupt")
    val work2 = graft.ops.WorkDirs.workDir("graft_dlqcorrupt")
    StreamOps.routeDlqBatch(work2)(corrupt, 0L)
    assert(!Files.exists(Paths.get(s"$work2/main")))
    val mainSch = StructType(Seq(StructField("k", LongType), StructField("v", StringType)))
    assert(StreamOps.readDlqSink(spark, s"$work2/main", mainSch).count() == 0)
    assert(dlqDf(work2).count() == 1)
  }
}
