package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming exact dedup with BOUNDED state: dropDuplicatesWithinWatermark
  * keeps per-key state only inside the watermark window — the shape that
  * lets exact dedup run forever on an unbounded stream (the batch dedup
  * family q33/q34 can't).
  */
class StreamDedupSpec extends SparkSpec {

  private def writeCsv(dir: String, name: String, rows: Seq[(Long, Long)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("id,sec" +: rows.map { case (i, s) => s"$i,$s" }).mkString("\n").getBytes)
  }

  private def run(bronze: String, ckpt: String, out: String): Unit = {
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("sec", StringType)))
    val q = spark.readStream.option("header", "true").schema(schema).csv(bronze)
      .select(col("id").cast("long"), col("sec").cast("long"))
      .withColumn("etime", timestamp_seconds(col("sec")))
      .withWatermark("etime", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").parquet(out)
      }
      .start()
    q.awaitTermination()
  }

  test("duplicates within the watermark dedupe; keys re-emit after it passes") {
    val work = tmpDir("sdedup")
    val bronze = s"$work/bronze"
    val t0 = 1700000000L
    // batch 1: id 1 twice (in-batch dup), id 2 once
    writeCsv(bronze, "b1.csv", Seq((1L, t0), (1L, t0 + 60), (2L, t0 + 60)))
    run(bronze, s"$work/ckpt", s"$work/out")
    // batch 2: id 1 again 2 min later (inside 10-min watermark → suppressed);
    // id 2 a day later — ALSO suppressed, because state eviction uses the
    // watermark of the PREVIOUS batch — but it advances the watermark;
    // id 3 new
    writeCsv(bronze, "b2.csv", Seq((1L, t0 + 120), (2L, t0 + 86400), (3L, t0 + 86400)))
    run(bronze, s"$work/ckpt", s"$work/out")
    // batch 3: the advanced watermark has expired id 2's original state →
    // the key re-emits (bounded state, not dedup-forever)
    writeCsv(bronze, "b3.csv", Seq((2L, t0 + 86460)))
    run(bronze, s"$work/ckpt", s"$work/out")

    val got = spark.read.parquet(s"$work/out")
      .groupBy("id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == 1L, s"id 1 must dedupe within watermark: $got")
    assert(got(2L) == 2L, s"id 2 re-emits after watermark expiry: $got")
    assert(got(3L) == 1L)
  }
}
