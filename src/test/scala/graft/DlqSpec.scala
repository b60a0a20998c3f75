package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming dead-letter quarantine (the q196 shape): PERMISSIVE JSON
  * ingest routes malformed lines to a quarantine table and clean rows to
  * the main table, exactly once across checkpointed restarts.
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
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        b.filter(col("_corrupt").isNotNull).select(col("_corrupt").as("raw"))
          .write.mode("append").parquet(s"$work/dlq")
        b.filter(col("_corrupt").isNull).drop("_corrupt")
          .write.mode("append").parquet(s"$work/main")
        b.unpersist(); ()
      }
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("corrupt lines quarantine, clean lines pass, exactly once across two checkpointed drops") {
    val work = graft.ops.WorkDirs.workDir("graft_dlqspec")
    Files.createDirectories(Paths.get(s"$work/feed"))
    Files.write(Paths.get(s"$work/feed/a.json"),
      """{"k": 1, "v": "ok1"}
        |{broken line one
        |{"k": 2, "v": "ok2"}""".stripMargin.getBytes("UTF-8"))
    runDrop(work)
    assert(spark.read.parquet(s"$work/main").count() == 2)
    assert(spark.read.parquet(s"$work/dlq").count() == 1)

    // second drop through the SAME checkpoint: only the new file is read —
    // batch-1 rows must not re-append
    Files.write(Paths.get(s"$work/feed/b.json"),
      """{"k": 3, "v": "ok3"}
        |{also broken
        |{"k": "not a long", "v": "type clash"}""".stripMargin.getBytes("UTF-8"))
    runDrop(work)
    val main = spark.read.parquet(s"$work/main")
    val dlq = spark.read.parquet(s"$work/dlq")
    assert(main.count() == 3, "clean rows exactly once across both drops")
    // the type-clash line is malformed FOR THE SCHEMA, not just bad JSON —
    // PERMISSIVE must quarantine it too
    assert(dlq.count() == 3)
    assert(main.select(sum(col("k"))).head.getLong(0) == 6L)
    assert(dlq.filter(col("raw").contains("not a long")).count() == 1)
  }
}
