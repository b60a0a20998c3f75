package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

import graft.lake.VersionedTable

/** Column rename via mapping metadata (Delta's column mapping): the
  * logical name changes, the physical (on-disk) name never does — no data
  * rewrite, every era's files read under the version-appropriate names.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def dataFiles(path: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$path/data")).map(_.getPath)
      .filter(_.endsWith(".parquet")).toSet
  }

  test("rename is metadata-only; old and new writes read under the new name") {
    val path = tmpDir("cm") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1"), (2, 20, "p2")))
    val before = dataFiles(path)
    t.renameColumn("amount", "amt")                      // v2, metadata only
    assert(dataFiles(path) == before)                    // no file touched
    assert(t.read.columns.toSeq == Seq("id", "amt", "part"))
    // a batch under the NEW name upserts over data written under the old
    t.merge(Seq((2, 25, "p2"), (3, 30, "p3")).toDF("id", "amt", "part"))
    assert(t.read.select("id", "amt", "part").as[(Int, Int, String)]
      .collect().toSet == Set((1, 10, "p1"), (2, 25, "p2"), (3, 30, "p3")))
    // time travel reads version 1 under the name IT knew
    assert(t.readVersion(1).columns.toSeq == Seq("id", "amount", "part"))
    // a fresh instance replays the mapping
    val reopened = VersionedTable(spark, path, Seq("id"), Seq("part"))
    assert(reopened.read.columns.toSeq == Seq("id", "amt", "part"))
    assert(reopened.read.count() == 3)
  }

  test("rename chains survive checkpoint replay; restore resets the mapping") {
    val path = tmpDir("cm2") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"), checkpointInterval = 3)
    t.merge(df((1, 10, "p1")))                   // v1
    t.renameColumn("amount", "amt")              // v2
    t.renameColumn("amt", "value")               // v3 (checkpoint lands)
    (4 to 5).foreach(i => t.merge(Seq((i, i, "p1")).toDF("id", "value", "part")))
    val reopened = VersionedTable(spark, path, Seq("id"), Seq("part"), checkpointInterval = 3)
    assert(reopened.read.columns.contains("value"))
    assert(reopened.read.count() == 3)
    // restore to v1: the mapping resets, the column is 'amount' again
    reopened.restore(1)
    assert(reopened.read.columns.toSeq == Seq("id", "amount", "part"))
    assert(reopened.read.count() == 1)
  }

  test("renames are refused for identity columns, dangling refs, and retired names") {
    val t = VersionedTable(spark, tmpDir("cm3") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1")))
    intercept[IllegalArgumentException](t.renameColumn("id", "key"))
    intercept[IllegalArgumentException](t.renameColumn("part", "bucket"))
    intercept[IllegalArgumentException](t.renameColumn("nosuch", "x"))
    intercept[IllegalArgumentException](t.renameColumn("amount", "part"))
    t.addConstraint("pos", "amount > 0")
    val e = intercept[IllegalArgumentException](t.renameColumn("amount", "amt"))
    assert(e.getMessage.contains("pos"))
    t.dropConstraint("pos")
    t.renameColumn("amount", "amt")
    // the retired physical name cannot come back as a new column
    val bad = Seq((2, 20, 99, "p1")).toDF("id", "amt", "amount", "part")
    intercept[IllegalArgumentException](t.merge(bad))
    // …nor as a rename target of another column
    t.merge(Seq((1, 10, "x", "p1")).toDF("id", "amt", "note", "part"))
    intercept[IllegalArgumentException](t.renameColumn("note", "amount"))
  }

  test("data skipping keeps pruning across a rename") {
    val t = VersionedTable(spark, tmpDir("cm4") + "/t", Seq("id"), Seq("part"),
      statsCols = Seq("amount"))
    t.merge(df((1, 5, "p1"), (2, 700, "p2")))
    t.renameColumn("amount", "amt")
    t.merge(Seq((3, 900, "p3")).toDF("id", "amt", "part"))
    val got = t.readWhere(col("amt") > 100)
    assert(got.select("id").as[Int].collect().toSet == Set(2, 3))
    assert(t.lastScanDirs == 2) // p1's dir pruned via pre-rename stats
  }

  test("the change feed nets images across a rename under the read-time names") {
    val t = VersionedTable(spark, tmpDir("cm5") + "/t", Seq("id"), Seq("part"),
      recordCdf = true)
    t.merge(df((1, 10, "p1"), (2, 20, "p1")))            // v1 (creation)
    t.update(col("id") === 1, Map("amount" -> lit(11)))  // v2 recorded
    t.renameColumn("amount", "amt")                      // v3 metadata (cdf=none)
    t.merge(Seq((2, 22, "p1")).toDF("id", "amt", "part")) // v4 recorded
    val f = t.changeFeed(1, 4)
    assert(f.columns.contains("amt") && !f.columns.contains("amount"))
    assert(f.select(col("id"), col("amt"), col("change_type"))
      .as[(Int, Int, String)].collect().toSet ==
      Set((1, 11, "update"), (2, 22, "update")))
    assert(f.inputFiles.forall(_.contains("/_changes/")))
  }

  test("the snapshot-diff fallback feed aligns eras across a rename") {
    val t = VersionedTable(spark, tmpDir("cm7") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1"), (2, 20, "p1")))            // v1
    t.renameColumn("amount", "amt")                      // v2
    t.overwrite(Seq((1, 10, "p1"), (3, 30, "p1"))        // v3 (unrecorded)
      .toDF("id", "amt", "part"))
    // fallback diff: row 1 is UNCHANGED (must not report an update-to-null),
    // row 2 deleted, row 3 inserted — all under the toV-era name
    val f = t.changeFeed(1, 3)
    assert(f.columns.contains("amt") && !f.columns.contains("amount"))
    assert(f.select(col("id"), col("amt"), col("change_type"))
      .as[(Int, Int, String)].collect().toSet ==
      Set((2, 20, "delete"), (3, 30, "insert")))
  }

  test("a stream started after a rename emits the snapshot under the new names") {
    val work = tmpDir("cm8")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"),
      recordCdf = true)
    t.overwrite(df((1, 10, "p1")))                       // v1 snapshot
    t.renameColumn("amount", "amt")                      // v2 (cdf=none)
    val q = t.readChangesStream()
      .writeStream.format("memory").queryName("cm8_mem")
      .option("checkpointLocation", s"$work/ckpt")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(spark.table("cm8_mem").select(col("id"), col("amt"), col("change_type"))
      .as[(Int, Int, String)].collect().toSet == Set((1, 10, "insert")))
  }

  test("the change stream spans a rename across a restart: each era's " +
      "batches read under the era's own names") {
    val work = tmpDir("cm10")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"),
      recordCdf = true)
    val got = scala.collection.mutable.Set.empty[(Int, Int, String, Long)]
    def drain(expectCol: String): Unit = {
      val q = t.readChangesStream()
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          if (!b.isEmpty) {
            assert(b.columns.contains(expectCol),
              s"era columns: ${b.columns.mkString(",")}, wanted $expectCol")
            got ++= b.select(col("id"), col(expectCol), col("change_type"),
              col("_commit_version")).as[(Int, Int, String, Long)].collect()
          }
          ()
        }
        .option("checkpointLocation", s"$work/ckpt")
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    t.overwrite(df((1, 10, "p1")))                      // v1 snapshot era
    drain("amount")
    t.renameColumn("amount", "amt")                     // v2, metadata-only
    t.update(col("id") === 1, Map("amt" -> (col("amt") + 5))) // v3
    // the restarted source pins the CURRENT schema: v2 contributes nothing
    // (change-transparent), v3's recorded images surface under the new name
    drain("amt")
    assert(got == Set(
      (1, 10, "insert", 1L),
      (1, 10, "update_preimage", 3L), (1, 15, "update_postimage", 3L)))
  }

  test("skipChangeCommits leaves a rename commit transparent, same as " +
      "the strict stream") {
    val work = tmpDir("cm11")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"),
      recordCdf = true)
    t.overwrite(df((1, 10, "p1")))                      // v1
    t.renameColumn("amount", "amt")                     // v2
    t.deleteMor(col("id") === 1)                        // v3, recorded
    for ((skip, qn) <- Seq((false, "cm11_a"), (true, "cm11_b"))) {
      val q = t.readChangesStream(skipChangeCommits = skip)
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", s"$work/ckpt_$qn")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      // the rename never surfaces rows and never errors, either mode
      assert(spark.table(qn).select(col("id"), col("amt"), col("change_type"))
        .as[(Int, Int, String)].collect().toSet ==
        Set((1, 10, "insert"), (1, 10, "delete")))
    }
  }

  test("a restore undoing a rename leaves no identity mapping behind") {
    val t = VersionedTable(spark, tmpDir("cm9") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1")))                            // v1
    t.renameColumn("amount", "amt")                       // v2
    t.restore(1)                                          // v3: mapping resets
    assert(t.read.columns.toSeq == Seq("id", "amount", "part"))
    // a repeat restore to the same state is a pure no-op commit-wise
    val before = t.currentVersion
    t.restore(1)
    assert(t.currentVersion == before)
  }

  test("a clone carries the column mapping") {
    val work = tmpDir("cm6")
    val t = VersionedTable(spark, s"$work/src", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1")))
    t.renameColumn("amount", "amt")
    val c = t.cloneTo(s"$work/clone")
    assert(c.read.columns.toSeq == Seq("id", "amt", "part"))
    c.merge(Seq((2, 20, "p2")).toDF("id", "amt", "part"))
    assert(c.read.count() == 2 && t.read.count() == 1)
  }
}
