package graft

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

import graft.lake.VersionedTable

/** Change-data-feed recording on the write path: merge/update/delete/
  * deleteMor stage per-commit change files, changeFeed nets them per key
  * without scanning the table, and any version in range that recorded
  * nothing (overwrite, pre-recording history) degrades to the snapshot
  * diff. Both paths must emit identical feeds.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def feed(d: DataFrame): Set[(Int, Int, String)] =
    d.select(col("id"), col("amount"), col("change_type"))
      .as[(Int, Int, String)].collect().toSet

  /** Every file the plan reads must be a recorded change file — the
    * recorded path never opens a table data dir.
    */
  private def assertChangeFilesOnly(d: DataFrame): Unit = {
    val files = d.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/_changes/")),
      s"feed read table data: ${files.filterNot(_.contains("/_changes/")).mkString(", ")}")
  }

  private def twinTables(tag: String): (VersionedTable, VersionedTable) = {
    val work = tmpDir(tag)
    (VersionedTable(spark, s"$work/rec", Seq("id"), Seq("part"), recordCdf = true),
      VersionedTable(spark, s"$work/dif", Seq("id"), Seq("part")))
  }

  test("recorded feed matches the snapshot diff across merge/update/delete/deleteMor") {
    val (rec, dif) = twinTables("cf")
    def mutate(t: VersionedTable): Unit = {
      t.merge(df((1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2"), (4, 40, "p2"))) // v1
      t.merge(df((2, 25, "p1"), (5, 50, "p3")))                               // v2
      t.update(col("id") === 3, Map("amount" -> lit(31)))                     // v3
      t.delete(col("id") === 1)                                               // v4
      t.deleteMor(col("id") === 4)                                            // v5
    }
    mutate(rec); mutate(dif)
    val expected = Set(
      (1, 10, "delete"), (2, 25, "update"), (3, 31, "update"),
      (4, 40, "delete"), (5, 50, "insert"))
    val recorded = rec.changeFeed(1, 5)
    assert(feed(recorded) == expected)
    assertChangeFilesOnly(recorded)
    // the twin (nothing recorded) takes the snapshot diff — same feed
    assert(feed(dif.changeFeed(1, 5)) == expected)
    // sub-ranges net independently
    assert(feed(rec.changeFeed(1, 2)) == Set((2, 25, "update"), (5, 50, "insert")))
    assert(feed(rec.changeFeed(4, 5)) == Set((4, 40, "delete")))
  }

  test("recorded feed nets multi-version transitions like the snapshot diff") {
    val (rec, dif) = twinTables("cfnet")
    def mutate(t: VersionedTable): Unit = {
      t.merge(df((1, 10, "p1"), (2, 20, "p1")))             // v1
      t.merge(df((9, 90, "p1")))                            // v2 insert 9
      t.delete(col("id") === 9)                             // v3 … and delete it
      t.merge(df((8, 80, "p1")))                            // v4 insert 8
      t.update(col("id") === 8, Map("amount" -> lit(88)))   // v5 … then update it
      t.update(col("id") === 1, Map("amount" -> lit(11)))   // v6 1: 10 → 11
      t.update(col("id") === 1, Map("amount" -> lit(10)))   // v7 … and back
      t.merge(df((2, 20, "p1")))                            // v8 no-op re-send
    }
    mutate(rec); mutate(dif)
    // 9 netted away; 8 nets to one insert with final values; 1's round
    // trip and 2's identical re-send net to nothing
    val expected = Set((8, 88, "insert"))
    assert(feed(rec.changeFeed(1, 8)) == expected)
    assert(feed(dif.changeFeed(1, 8)) == expected)
    assertChangeFilesOnly(rec.changeFeed(1, 8))
    // a recorded feed read from a fresh instance replays the same
    val reopened = VersionedTable(spark, rec.path, Seq("id"), Seq("part"),
      recordCdf = true)
    assert(feed(reopened.changeFeed(1, 8)) == expected)
  }

  test("compact and metadata-only commits are change-transparent") {
    val (rec, _) = twinTables("cfmeta")
    rec.merge(df((1, 10, "p1")))                        // v1
    rec.merge(df((2, 20, "p2")))                        // v2
    rec.compact()                                       // v3
    rec.addConstraint("pos", "amount > 0")              // v4
    rec.dropConstraint("pos")                           // v5
    val f = rec.changeFeed(1, 5)
    assert(feed(f) == Set((2, 20, "insert")))
    assertChangeFilesOnly(f) // still the recorded path, no snapshot scan
  }

  test("a version that recorded nothing falls back to the snapshot diff") {
    val (rec, _) = twinTables("cffb")
    rec.merge(df((1, 10, "p1")))                        // v1
    rec.merge(df((2, 20, "p2")))                        // v2 recorded
    rec.overwrite(df((1, 10, "p1"), (3, 30, "p3")))     // v3 NOT recorded
    val f = rec.changeFeed(1, 3)
    assert(feed(f) == Set((3, 30, "insert")))
    // fallback had to read table data, not change files
    assert(f.inputFiles.exists(_.contains("/data/")))
    // …and a range of only-recorded versions still takes the cheap path
    assertChangeFilesOnly(rec.changeFeed(1, 2))
  }

  test("an all-transparent range emits an empty feed with the diff's schema, scan-free") {
    val (rec, _) = twinTables("cfempty")
    rec.merge(df((1, 10, "p1")))     // v1
    rec.compact()                    // v2
    val f = rec.changeFeed(1, 2)
    assert(f.columns.toSeq == Seq("id", "amount", "part", "change_type"))
    assert(f.inputFiles.isEmpty)
    assert(f.count() == 0)
  }

  test("vacuum keeps committed change files and sweeps orphaned ones") {
    val (rec, _) = twinTables("cfvac")
    rec.merge(df((1, 10, "p1")))     // v1
    rec.merge(df((2, 20, "p2")))     // v2 recorded
    val chRoot = Paths.get(rec.path, "_changes")
    // plant a crashed-writer orphan
    Paths.get(chRoot.toString, "v99999_deadbeef").toFile.mkdirs()
    rec.vacuum(retain = 1)
    val left = chRoot.toFile.listFiles.map(_.getName).toSet
    assert(!left.contains("v99999_deadbeef"))
    assert(left.nonEmpty) // v2's committed change dir survives
    assert(feed(rec.changeFeed(1, 2)) == Set((2, 20, "insert")))
  }
}
