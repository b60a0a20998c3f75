package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.lit

import graft.lake.VersionedTable

/** Time-travel semantics over the directory-granular commit log:
  * versioned reads, history, merge isolation per version, vacuum
  * retention, and the atomic log-create commit race.
  */
class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, String, String)*): DataFrame =
    rows.toDF("id", "val", "part")

  private def contents(d: DataFrame): Set[(Int, String, String)] =
    d.select("id", "val", "part").as[(Int, String, String)].collect().toSet

  test("merge creates versions; every old version stays readable") {
    val t = VersionedTable(spark, tmpDir("vt") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1"), (2, "b", "p2")))
    t.merge(df((2, "B", "p2"), (3, "c", "p3")))
    assert(t.currentVersion == 2)
    assert(contents(t.readVersion(1)) == Set((1, "a", "p1"), (2, "b", "p2")))
    assert(contents(t.readVersion(2)) ==
      Set((1, "a", "p1"), (2, "B", "p2"), (3, "c", "p3")))
    assert(contents(t.read) == contents(t.readVersion(2)))
  }

  test("merge restages only touched partitions (untouched dirs stay live from v1)") {
    val t = VersionedTable(spark, tmpDir("vt") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1"), (2, "b", "p2")))
    t.merge(df((2, "B", "p2")))
    val h = t.history
    assert(h.map(x => (x._1, x._2)) == Seq(1 -> "overwrite", 2 -> "merge"))
    // v2 adds exactly the touched partition and removes its predecessor
    assert(h(1)._3 == 1 && h(1)._4 == 1)
    assert(contents(t.read) == Set((1, "a", "p1"), (2, "B", "p2")))
  }

  test("unpartitioned table versions full snapshots") {
    val t = VersionedTable(spark, tmpDir("vt") + "/t", Seq("id"))
    t.merge(df((1, "a", "p1")))
    t.overwrite(df((9, "z", "p9")))
    assert(contents(t.readVersion(1)) == Set((1, "a", "p1")))
    assert(contents(t.readVersion(2)) == Set((9, "z", "p9")))
  }

  test("schema evolution: old versions read with their own columns, new read null-fills") {
    val t = VersionedTable(spark, tmpDir("vt") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1"), (2, "b", "p2")))
    t.merge(Seq((2, "B", "p2", "note2")).toDF("id", "val", "part", "note"))
    val v2 = t.read.select("id", "val", "part", "note")
      .as[(Int, String, String, Option[String])].collect().toSet
    assert(v2 == Set((1, "a", "p1", None), (2, "B", "p2", Some("note2"))))
    assert(!t.readVersion(1).columns.contains("note"))
  }

  test("vacuum(retain=1) reclaims unreferenced dirs; current version still reads") {
    val base = tmpDir("vt") + "/t"
    val t = VersionedTable(spark, base, Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1")))
    t.merge(df((1, "A", "p1")))
    t.merge(df((1, "AA", "p1")))
    t.vacuum(retain = 1)
    assert(contents(t.read) == Set((1, "AA", "p1")))
    // superseded v1/v2 dirs for p1 are gone
    val roots = Files.list(Paths.get(base, "data")).toArray.map(_.toString)
    assert(roots.length == 1, s"expected 1 surviving data root, got ${roots.toSeq}")
    assert(t.history.length == 3) // log (auditability) survives vacuum
  }

  test("an empty commit reads back as an empty frame with the logged schema") {
    val t = VersionedTable(spark, tmpDir("vt") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1")))
    t.overwrite(df().filter(lit(false))) // zero rows → zero partition leaves
    assert(t.currentVersion == 2)
    val v2 = t.read
    assert(v2.count() == 0 && v2.columns.toSeq == Seq("id", "val", "part"))
    assert(contents(t.readVersion(1)) == Set((1, "a", "p1"))) // v1 intact
    t.merge(df((2, "b", "p2"))) // table is NOT wedged after an empty version
    assert(contents(t.read) == Set((2, "b", "p2")))
  }

  test("vacuum reclaims orphan staging roots from crashed writers") {
    val base = tmpDir("vt") + "/t"
    val t = VersionedTable(spark, base, Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1")))
    // a writer that died between stage() and commit() leaves an
    // unreferenced root in data/
    Files.createDirectories(Paths.get(base, "data", "v00002_deadbeef", "part=p9"))
    t.vacuum(retain = 1)
    assert(!Files.exists(Paths.get(base, "data", "v00002_deadbeef")))
    assert(contents(t.read) == Set((1, "a", "p1")))
  }

  test("losing the commit race fails fast and rolls back staging") {
    val base = tmpDir("vt") + "/t"
    val t = VersionedTable(spark, base, Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1")))
    // competing writer claims version 2 WHILE our merge is staging: start
    // the merge on a thread, wait for its staging root to appear in data/,
    // then drop the rival log before the merge reaches its commit
    @volatile var caught: Throwable = null
    val m = new Thread(() => {
      try t.merge(df((2, "b", "p1"))) catch { case e: Throwable => caught = e }
    })
    m.start()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (Files.list(Paths.get(base, "data")).count() < 2 &&
      System.nanoTime() < deadline) Thread.sleep(5)
    Files.writeString(Paths.get(base, "_log", "v00002.log"), "action=merge")
    m.join(60000)
    assert(caught != null && caught.getMessage.contains("concurrent writer"))
    // the loser's staging did not leak into data/
    val roots = Files.list(Paths.get(base, "data")).toArray.map(_.toString)
    assert(roots.length == 1, s"loser staging leaked: ${roots.toSeq}")
    // table state: v1 data + the rival's (empty) v2 commit
    assert(contents(t.read) == Set((1, "a", "p1")))
  }
}
