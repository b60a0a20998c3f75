package graft

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.lake.VersionedTable

/** Merge-on-read delete (deletion vectors): suppression without rewrite,
  * partition-scoped tombstone lifecycle, interaction with every other
  * mutator, vacuum retention, restore, clone, and checkpoint replay.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def contents(d: DataFrame): Set[(Int, Int, String)] =
    d.select("id", "amount", "part").as[(Int, Int, String)].collect().toSet

  private def dataRoots(path: String): Seq[String] =
    Paths.get(s"$path/data").toFile.listFiles.filter(_.isDirectory).map(_.getName).toSeq

  test("deleteMor suppresses rows without rewriting any data dir") {
    val path = tmpDir("dv") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"))
    t.merge(df((1, 5, "p1"), (2, 7, "p1"), (3, 9, "p2")))
    val rootsBefore = dataRoots(path)
    assert(t.deleteMor(col("amount") < 8))
    assert(contents(t.read) == Set((3, 9, "p2")))
    assert(contents(t.readVersion(1)) ==
      Set((1, 5, "p1"), (2, 7, "p1"), (3, 9, "p2"))) // time travel unaffected
    // the original data roots are untouched; v2 added no data dirs
    assert(rootsBefore.forall(dataRoots(path).contains))
    assert(t.history.find(_._1 == 2).exists(h => h._2 == "delete_mor" && h._3 == 0))
    assert(!t.deleteMor(col("amount") > 100)) // nothing matches → no commit
  }

  test("tombstones accumulate across deleteMor commits") {
    val t = VersionedTable(spark, tmpDir("dv") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p1"), (3, 3, "p2")))
    t.deleteMor(col("id") === 1)
    t.deleteMor(col("id") === 3)
    assert(contents(t.read) == Set((2, 2, "p1")))
    assert(contents(t.readVersion(2)) == Set((2, 2, "p1"), (3, 3, "p2")))
  }

  test("restaging a partition folds its suppression in and clears the tombstone") {
    val t = VersionedTable(spark, tmpDir("dv") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p1"), (3, 3, "p2")))
    t.deleteMor(col("id") === 1)
    // merge touching p1 must NOT resurrect id=1 (restage reads the
    // DV-aware view) and must allow re-inserting a tombstoned key later
    t.merge(df((2, 20, "p1")))
    assert(contents(t.read) == Set((2, 20, "p1"), (3, 3, "p2")))
    t.merge(df((1, 100, "p1"))) // re-insert the once-deleted key
    assert(contents(t.read) == Set((1, 100, "p1"), (2, 20, "p1"), (3, 3, "p2")))
    // p2 untouched throughout: its data never restaged
  }

  test("update and copy-on-write delete respect existing tombstones") {
    val t = VersionedTable(spark, tmpDir("dv") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p1"), (3, 3, "p1")))
    t.deleteMor(col("id") === 1)
    t.update(col("id") === 2, Map("amount" -> (col("amount") + 100)))
    assert(contents(t.read) == Set((2, 102, "p1"), (3, 3, "p1")))
    assert(t.delete(col("id") === 3))
    assert(contents(t.read) == Set((2, 102, "p1")))
  }

  test("overwrite and compact reset the tombstone set") {
    val t = VersionedTable(spark, tmpDir("dv") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p2")))
    t.deleteMor(col("id") === 1)
    t.compact()
    assert(contents(t.read) == Set((2, 2, "p2"))) // materialized, still gone
    t.merge(df((1, 10, "p1")))
    assert(contents(t.read) == Set((1, 10, "p1"), (2, 2, "p2")))
    t.overwrite(df((9, 9, "p9")))
    assert(contents(t.read) == Set((9, 9, "p9")))
  }

  test("vacuum keeps live tombstone dirs and reclaims dead ones") {
    val path = tmpDir("dv") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p2")))
    t.deleteMor(col("id") === 1)
    t.vacuum(retain = 1)
    assert(contents(t.read) == Set((2, 2, "p2"))) // DV dir survived the vacuum
    t.compact() // clears tombstones
    t.vacuum(retain = 1)
    assert(contents(t.read) == Set((2, 2, "p2")))
    assert(dataRoots(path).length == 1) // only the compacted root remains
  }

  test("restore returns to the target version's exact tombstone state") {
    val t = VersionedTable(spark, tmpDir("dv") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p2")))   // v1
    t.deleteMor(col("id") === 1)              // v2
    t.restore(1)                              // v3: resurrects id=1
    assert(contents(t.read) == Set((1, 1, "p1"), (2, 2, "p2")))
    t.restore(2)                              // v4: re-hides it
    assert(contents(t.read) == Set((2, 2, "p2")))
  }

  test("clone carries live tombstones; readWhere applies them") {
    val work = tmpDir("dv")
    val t = VersionedTable(spark, s"$work/src", Seq("id"), Seq("part"),
      statsCols = Seq("amount"))
    t.merge(df((1, 5, "p1"), (2, 700, "p2")))
    t.deleteMor(col("id") === 2)
    val c = t.cloneTo(s"$work/clone")
    assert(contents(c.read) == Set((1, 5, "p1")))
    assert(contents(t.readWhere(col("amount") > 1)) == Set((1, 5, "p1")))
  }

  test("delete/update on fully-tombstoned matches never drop surviving rows") {
    val t = VersionedTable(spark, tmpDir("dv") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p1")))
    t.deleteMor(col("id") === 1)
    // id=1 still physically exists in p1's files but is tombstoned: the
    // delete must see NO visible match, commit nothing, and leave row 2
    assert(!t.delete(col("id") === 1))
    assert(contents(t.read) == Set((2, 2, "p1")))
    assert(!t.update(col("id") === 1, Map("amount" -> (col("amount") + 1))))
    assert(contents(t.read) == Set((2, 2, "p1")))
  }

  test("a merge losing a race to a same-partition delete_mor fails instead of resurrecting") {
    val work = tmpDir("dv")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p1"), (3, 3, "p2")))
    // writer B sneaks a tombstone commit in p1 between A's stage and commit
    val b = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    var fired = false
    t.beforeCommitHook = () => {
      if (!fired) { fired = true; b.deleteMor(col("id") === 2) }
    }
    val e = intercept[RuntimeException](t.merge(df((1, 10, "p1"))))
    assert(e.getMessage.contains("concurrent writer"))
    t.beforeCommitHook = () => ()
    // B's delete stands; A's staging rolled back
    assert(contents(t.read) == Set((1, 1, "p1"), (3, 3, "p2")))
  }

  test("a merge losing a race to a DIFFERENT-partition delete_mor retries and both land") {
    val work = tmpDir("dv")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p2")))
    val b = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    var fired = false
    t.beforeCommitHook = () => {
      if (!fired) { fired = true; b.deleteMor(col("id") === 2) } // p2 only
    }
    t.merge(df((1, 10, "p1"))) // p1 only — disjoint, must retry and land
    t.beforeCommitHook = () => ()
    assert(contents(t.read) == Set((1, 10, "p1")))
  }

  test("a merge losing a race to a restore fails fast (restore resets tombstones)") {
    val work = tmpDir("dv")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    t.merge(df((1, 1, "p1"), (2, 2, "p2")))   // v1
    t.deleteMor(col("id") === 1)              // v2: tombstone in p1
    val b = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    var fired = false
    t.beforeCommitHook = () => {
      if (!fired) { fired = true; b.restore(1) } // resurrects id=1
    }
    // A's staging was built from the v2 (tombstoned) read on p2 only —
    // disjoint dirs, but the restore reset the DV state, so it must conflict
    val e = intercept[RuntimeException](t.merge(df((2, 20, "p2"))))
    assert(e.getMessage.contains("concurrent writer"))
    t.beforeCommitHook = () => ()
    assert(contents(t.read) == Set((1, 1, "p1"), (2, 2, "p2")))
  }

  test("deleteMor suppresses rows living in a NULL partition") {
    val t = VersionedTable(spark, tmpDir("dv") + "/t", Seq("id"), Seq("part"))
    // one row in a null partition (written as the Hive default partition,
    // read back as NULL): the tombstone anti-join must match it null-safely
    t.merge(Seq((1, 5, Option("p1")), (2, 7, Option.empty[String]))
      .toDF("id", "amount", "part"))
    assert(t.deleteMor(col("id") === 2))
    assert(t.read.select("id").as[Int].collect().toSet == Set(1))
    // and the null-partition tombstone keeps suppressing across reads
    assert(t.readVersion(t.currentVersion).count() == 1)
  }

  test("tombstone state survives instance reopen and checkpoint replay") {
    val path = tmpDir("dv") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"), checkpointInterval = 3)
    t.merge(df((1, 1, "p1"), (2, 2, "p2")))
    t.deleteMor(col("id") === 1)
    (3 to 6).foreach(i => t.merge(df((i, i, "p2")))) // cross a checkpoint boundary
    val reopened = VersionedTable(spark, path, Seq("id"), Seq("part"), checkpointInterval = 3)
    assert(contents(reopened.read) ==
      Set((2, 2, "p2"), (3, 3, "p2"), (4, 4, "p2"), (5, 5, "p2"), (6, 6, "p2")))
  }
}
