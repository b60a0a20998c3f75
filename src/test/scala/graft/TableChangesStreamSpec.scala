package graft

import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.DataFrame

import graft.lake.VersionedTable

/** Streaming read FROM the versioned table (Delta streaming-source
  * parity): commits become micro-batches of change records, offsets are
  * engine-checkpointed versions (exactly-once across restarts), and
  * unrecorded rewrites fail-or-skip like Delta's data-update error.
  */
class TableChangesStreamSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def records(d: DataFrame): Set[(Int, Int, String, Long)] =
    d.select(col("id"), col("amount"), col("change_type"), col("_commit_version"))
      .as[(Int, Int, String, Long)].collect().toSet

  test("commits stream incrementally; a checkpointed restart resumes exactly-once") {
    val work = tmpDir("tcs")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"), recordCdf = true)
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2")))      // v1: initial snapshot
    t.merge(df((2, 25, "p2"), (3, 30, "p3")))          // v2: update + insert
    t.delete(col("id") === 1)                          // v3: copy-on-write delete
    val out = s"$work/out"
    val ckpt = s"$work/ckpt"
    def drain(): Unit = {
      val q = t.readChangesStream()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val afterFirst = Set(
      (1, 10, "insert", 1L), (2, 20, "insert", 1L),
      (2, 20, "update_preimage", 2L), (2, 25, "update_postimage", 2L),
      (3, 30, "insert", 2L),
      (1, 10, "delete", 3L))
    assert(records(spark.read.parquet(out)) == afterFirst)
    // more commits, then a RESTART from the same checkpoint: only the new
    // versions flow — nothing from v1..v3 is re-emitted into the sink
    t.deleteMor(col("id") === 3)                       // v4: merge-on-read delete
    t.update(col("id") === 2, Map("amount" -> lit(26)))// v5
    drain()
    assert(records(spark.read.parquet(out)) == afterFirst ++ Set(
      (3, 30, "delete", 4L),
      (2, 25, "update_preimage", 5L), (2, 26, "update_postimage", 5L)))
    // a third drain with no new commits adds nothing
    drain()
    assert(spark.read.parquet(out).count() == 9)
  }

  test("a live query picks up commits across triggers (one table, many batches)") {
    val work = tmpDir("tcs2")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"), recordCdf = true)
    t.overwrite(df((1, 10, "p1")))
    val q = t.readChangesStream()
      .writeStream.format("memory").queryName("tcs_live")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tcs_live").count() == 1) // the v1 snapshot insert
      t.merge(df((2, 20, "p2")))                   // v2
      q.processAllAvailable()
      t.merge(df((3, 30, "p3")))                   // v3
      q.processAllAvailable()
      assert(records(spark.table("tcs_live")) == Set(
        (1, 10, "insert", 1L), (2, 20, "insert", 2L), (3, 30, "insert", 3L)))
    } finally q.stop()
  }

  test("startingTimestamp begins at the first commit at or after the " +
      "timestamp; before-everything replays the snapshot; both options refuse") {
    val work = tmpDir("tcs7")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"), recordCdf = true)
    t.overwrite(df((1, 10, "p1")))            // v1
    t.merge(df((2, 20, "p2")))                // v2
    t.merge(df((3, 30, "p3")))                // v3
    val tsOf = t.historyFrame.select("version", "commit_ts")
      .as[(Int, Long)].collect().toMap
    def fmt(ms: Long) = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneId.of(
        spark.sessionState.conf.sessionLocalTimeZone))
      .format(java.time.Instant.ofEpochMilli(ms))
    def drain(start: String, out: String, ckpt: String): Unit = {
      val q = t.readChangesStream(startingTimestamp = start)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // exactly v3's timestamp: v3 alone flows (first commit AT or after)
    drain(fmt(tsOf(3)), s"$work/out3", s"$work/ck3")
    assert(records(spark.read.parquet(s"$work/out3")) ==
      Set((3, 30, "insert", 3L)))
    // between v1 and v2: v2 and v3 flow
    drain(fmt(tsOf(2) - 1), s"$work/out2", s"$work/ck2")
    assert(records(spark.read.parquet(s"$work/out2")) ==
      Set((2, 20, "insert", 2L), (3, 30, "insert", 3L)))
    // before every commit: the initial snapshot replays in full
    drain(fmt(tsOf(1) - 60000), s"$work/outall", s"$work/ckall")
    assert(records(spark.read.parquet(s"$work/outall")) == Set(
      (1, 10, "insert", 1L), (2, 20, "insert", 2L), (3, 30, "insert", 3L)))
    // after the latest commit: nothing yet — only future commits flow
    drain(fmt(tsOf(3) + 60000), s"$work/outnone", s"$work/cknone")
    assert(scala.util.Try(
      spark.read.parquet(s"$work/outnone").count()).getOrElse(0L) == 0L)
    // a NEW commit then flows on the next drain — the checkpoint owns the
    // position from here (the timestamp resolved once, at first start)
    t.merge(df((4, 40, "p4")))                // v4
    drain(fmt(tsOf(3) + 60000), s"$work/outnone", s"$work/cknone")
    assert(records(spark.read.parquet(s"$work/outnone")) ==
      Set((4, 40, "insert", 4L)))
    // startingVersion='latest' (raw option surface): only commits made
    // AFTER the query first starts flow — pinned once, so the restart
    // catches the mid-downtime commit instead of skipping to the new head
    def drainLatest(): Unit = {
      val q = spark.readStream
        .format(classOf[graft.streaming.TableChangesProvider].getName)
        .option("path", t.path).option("pk", "id")
        .option("partitionCols", "part")
        .option("startingVersion", "latest")
        .load()
        .writeStream.format("parquet").option("path", s"$work/outlatest")
        .option("checkpointLocation", s"$work/cklatest")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainLatest() // head is v4 — nothing flows
    assert(scala.util.Try(
      spark.read.parquet(s"$work/outlatest").count()).getOrElse(0L) == 0L)
    t.merge(df((5, 50, "p5")))                // v5, lands mid-downtime
    drainLatest() // the pinned start (4) still admits v5
    assert(records(spark.read.parquet(s"$work/outlatest")) ==
      Set((5, 50, "insert", 5L)))
    // both options on the raw source surface refuse
    val e = intercept[Exception] {
      spark.readStream
        .format(classOf[graft.streaming.TableChangesProvider].getName)
        .option("path", t.path).option("pk", "id")
        .option("partitionCols", "part")
        .option("startingVersion", "1")
        .option("startingTimestamp", fmt(tsOf(2)))
        .load()
        .writeStream.format("noop")
        .option("checkpointLocation", s"$work/ckboth")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e.getMessage != null)
    // …and on the API surface
    val e2 = intercept[IllegalArgumentException](
      t.readChangesStream(startingVersion = 2, startingTimestamp = fmt(tsOf(2))))
    assert(e2.getMessage.contains("not both"))
    // a garbage timestamp fails loudly instead of widening the feed
    val e3 = intercept[Exception] {
      t.readChangesStream(startingTimestamp = "not-a-time")
        .writeStream.format("noop")
        .option("checkpointLocation", s"$work/ckbad")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(e3.getMessage != null)
  }

  test("maxVersionsPerTrigger bounds catch-up batches, exactly-once across restarts") {
    val work = tmpDir("tcs4")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"), recordCdf = true)
    t.overwrite(df((1, 10, "p1")))                     // v1
    (2 to 5).foreach(i => t.merge(df((i, i * 10, "p1")))) // v2..v5
    val out = s"$work/out"
    var batches = 0
    // Trigger.AvailableNow: the source's SupportsTriggerAvailableNow
    // surface pins the end at query start and the engine drains to it in
    // rate-limited MULTI-batches, then stops — no giant single batch
    def drain(): Unit = {
      val q = t.readChangesStream(maxVersionsPerTrigger = 1)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) { batches += 1; b.write.mode("append").parquet(out) }
        }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    // five versions, one per batch — a far-behind consumer never gets one
    // giant catch-up batch
    assert(batches == 5, s"expected 5 rate-limited batches, got $batches")
    val expected = Set(
      (1, 10, "insert", 1L),
      (2, 20, "insert", 2L), (3, 30, "insert", 3L),
      (4, 40, "insert", 4L), (5, 50, "insert", 5L))
    assert(records(spark.read.parquet(out)) == expected)
    // restart from the same checkpoint: the persisted admission base keeps
    // the capped offset AHEAD of the committed one — nothing re-delivers
    t.merge(df((6, 60, "p1")))                          // v6
    drain()
    assert(records(spark.read.parquet(out)) == expected + ((6, 60, "insert", 6L)))
  }

  test("an unrecorded rewrite fails the stream unless skipChangeCommits") {
    val work = tmpDir("tcs3")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"), recordCdf = true)
    t.overwrite(df((1, 10, "p1")))                     // v1
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2")))      // v2: rewrite, no images
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = t.readChangesStream()
        .writeStream.format("memory").queryName("tcs_fail")
        .option("checkpointLocation", s"$work/ckptA")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    assert(e.getMessage.contains("recorded no change data") ||
      Option(e.getCause).exists(_.getMessage.contains("recorded no change data")))
    // skipChangeCommits: the rewrite version is skipped, the snapshot flows
    val q2 = t.readChangesStream(skipChangeCommits = true)
      .writeStream.format("memory").queryName("tcs_skip")
      .option("checkpointLocation", s"$work/ckptB")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination()
    assert(records(spark.table("tcs_skip")) == Set((1, 10, "insert", 1L)))
  }
}
