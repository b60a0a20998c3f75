package graft

import java.nio.file.Paths

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.lake.{ConstraintViolationException, VersionedTable}

/** CHECK-constraint enforcement and shallow-clone semantics on the
  * versioned table: refusal atomicity, persistence across instances and
  * checkpoints, clone independence, and clone storage discipline.
  */
class ConstraintCloneSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def contents(d: DataFrame): Set[(Int, Int, String)] =
    d.select("id", "amount", "part").as[(Int, Int, String)].collect().toSet

  test("addConstraint verifies existing rows and refuses a dirty table") {
    val t = VersionedTable(spark, tmpDir("ct") + "/t", Seq("id"))
    t.overwrite(df((1, 5, "p1"), (2, -3, "p1")))
    val e = intercept[ConstraintViolationException](
      t.addConstraint("pos", "amount > 0"))
    assert(e.name == "pos" && e.nViolations == 1)
    assert(t.currentVersion == 1) // nothing was committed
    assert(t.constraints.isEmpty)
  }

  test("a violating batch is refused atomically; a clean one lands") {
    val t = VersionedTable(spark, tmpDir("ct") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 5, "p1"), (2, 7, "p2")))
    t.addConstraint("pos", "amount > 0")
    assert(t.constraints == Map("pos" -> "amount > 0"))
    val before = t.currentVersion
    intercept[ConstraintViolationException](t.merge(df((3, -1, "p1"))))
    assert(t.currentVersion == before) // no phantom version
    assert(contents(t.read) == Set((1, 5, "p1"), (2, 7, "p2")))
    t.merge(df((3, 4, "p1")))
    assert(contents(t.read) == Set((1, 5, "p1"), (2, 7, "p2"), (3, 4, "p1")))
    // NULL is unknown, not a violation (SQL CHECK semantics)
    t.merge(Seq((4, Option.empty[Int], "p2")).toDF("id", "amount", "part"))
    assert(t.read.count() == 4)
  }

  test("constraints bind update and overwrite too, and dropConstraint lifts them") {
    val t = VersionedTable(spark, tmpDir("ct") + "/t", Seq("id"))
    t.overwrite(df((1, 5, "p1")))
    t.addConstraint("pos", "amount > 0")
    intercept[ConstraintViolationException](
      t.update(col("id") === 1, Map("amount" -> (col("amount") - 100))))
    assert(contents(t.read) == Set((1, 5, "p1")))
    intercept[ConstraintViolationException](t.overwrite(df((1, -5, "p1"))))
    t.dropConstraint("pos")
    t.overwrite(df((1, -5, "p1")))
    assert(contents(t.read) == Set((1, -5, "p1")))
  }

  test("constraints persist across instances and checkpoint replay") {
    val path = tmpDir("ct") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"), checkpointInterval = 3)
    t.merge(df((1, 5, "p1")))
    t.addConstraint("pos", "amount > 0")
    // push several commits past a checkpoint boundary
    (2 to 7).foreach(i => t.merge(df((i, i, "p1"))))
    val reopened = VersionedTable(spark, path, Seq("id"), Seq("part"), checkpointInterval = 3)
    assert(reopened.constraints == Map("pos" -> "amount > 0"))
    intercept[ConstraintViolationException](reopened.merge(df((99, -1, "p1"))))
  }

  test("clone matches the source version and carries its constraints") {
    val work = tmpDir("cl")
    val t = VersionedTable(spark, s"$work/src", Seq("id"), Seq("part"))
    t.merge(df((1, 5, "p1"), (2, 7, "p2")))
    t.addConstraint("pos", "amount > 0")
    t.merge(df((3, 9, "p1")))
    val atV1 = t.cloneTo(s"$work/c1", 1)
    assert(contents(atV1.read) == Set((1, 5, "p1"), (2, 7, "p2")))
    val cur = t.cloneTo(s"$work/c2")
    assert(contents(cur.read) == contents(t.read))
    intercept[ConstraintViolationException](cur.merge(df((9, -9, "p1"))))
  }

  test("clone writes never touch the source; only touched partitions materialize") {
    val work = tmpDir("cl")
    val t = VersionedTable(spark, s"$work/src", Seq("id"), Seq("part"))
    t.merge(df((1, 5, "p1"), (2, 7, "p2")))
    val c = t.cloneTo(s"$work/clone")
    // clone commit copied no data files
    assert(!Paths.get(s"$work/clone/data").toFile.exists ||
      Paths.get(s"$work/clone/data").toFile.listFiles.forall(!_.isDirectory))
    c.merge(df((1, 50, "p1")))
    assert(contents(c.read) == Set((1, 50, "p1"), (2, 7, "p2")))
    assert(contents(t.read) == Set((1, 5, "p1"), (2, 7, "p2")))
    assert(t.currentVersion == 1)
    // only the touched partition was staged under the clone's own data/
    val roots = Paths.get(s"$work/clone/data").toFile.listFiles.filter(_.isDirectory)
    assert(roots.length == 1)
    // delete/update on clone-referenced dirs resolves files back to refs
    assert(c.delete(col("id") === 2))
    assert(contents(c.read) == Set((1, 50, "p1")))
    assert(contents(t.read) == Set((1, 5, "p1"), (2, 7, "p2")))
  }

  test("clone vacuum reclaims only its own storage, never the source's") {
    val work = tmpDir("cl")
    val t = VersionedTable(spark, s"$work/src", Seq("id"), Seq("part"))
    t.merge(df((1, 5, "p1"), (2, 7, "p2")))
    val c = t.cloneTo(s"$work/clone")
    c.merge(df((1, 50, "p1"))) // supersedes the ext ref to p1
    c.merge(df((1, 51, "p1"))) // supersedes the clone's own v2 staging
    c.vacuum(retain = 1)
    // source files intact — both partitions still read
    assert(contents(t.read) == Set((1, 5, "p1"), (2, 7, "p2")))
    // the clone's own superseded v2 root was reclaimed
    val roots = Paths.get(s"$work/clone/data").toFile.listFiles.filter(_.isDirectory)
    assert(roots.length == 1)
    assert(contents(c.read) == Set((1, 51, "p1"), (2, 7, "p2")))
  }

  test("clone of a clone keeps external references resolvable") {
    val work = tmpDir("cl")
    val t = VersionedTable(spark, s"$work/src", Seq("id"), Seq("part"))
    t.merge(df((1, 5, "p1"), (2, 7, "p2")))
    val c1 = t.cloneTo(s"$work/c1")
    c1.merge(df((3, 3, "p3")))
    val c2 = c1.cloneTo(s"$work/c2")
    assert(contents(c2.read) == Set((1, 5, "p1"), (2, 7, "p2"), (3, 3, "p3")))
    c2.merge(df((2, 70, "p2")))
    assert(contents(c2.read) == Set((1, 5, "p1"), (2, 70, "p2"), (3, 3, "p3")))
    assert(contents(c1.read) == Set((1, 5, "p1"), (2, 7, "p2"), (3, 3, "p3")))
  }

  test("readWhere data skipping still prunes on a clone (stats carried over)") {
    val work = tmpDir("cl")
    val t = VersionedTable(spark, s"$work/src", Seq("id"), Seq("part"),
      statsCols = Seq("amount"))
    t.merge(df((1, 5, "p1"), (2, 700, "p2")))
    val c = t.cloneTo(s"$work/clone")
    val got = c.readWhere(col("amount") > 100)
    assert(contents(got) == Set((2, 700, "p2")))
    assert(c.lastScanDirs == 1) // the p1 dir was pruned via carried stats
  }

  test("addConstraint fails when a data commit lands between validation and claim") {
    val t = VersionedTable(spark, tmpDir("ct") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 5, "p1")))
    val rival = VersionedTable(spark, t.path, Seq("id"), Seq("part"))
    var fired = false
    // the rival's VIOLATING batch lands after addConstraint validated the
    // existing rows but before its metadata commit claims the version —
    // the claim must fail; succeeding would record a constraint the table
    // already violates
    t.beforeCommitHook = () =>
      if (!fired) { fired = true; rival.merge(df((2, -3, "p2"))) }
    val e = intercept[RuntimeException](t.addConstraint("pos", "amount > 0"))
    t.beforeCommitHook = () => ()
    assert(e.getMessage.contains("concurrent writer"))
    assert(t.constraints.isEmpty)
    assert(contents(t.read) == Set((1, 5, "p1"), (2, -3, "p2")))
    // re-running on the new state sees the violation and refuses cleanly
    intercept[ConstraintViolationException](t.addConstraint("pos", "amount > 0"))
  }

  test("restore returns constraints to the target version's rule set") {
    val t = VersionedTable(spark, tmpDir("ct") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 5, "p1")))                // v1
    t.addConstraint("keep", "amount >= 0")   // v2
    val v = t.currentVersion
    t.addConstraint("pos", "amount > 0")     // v3
    t.dropConstraint("keep")                 // v4
    t.restore(v)                             // v5: data unchanged, rules reset
    assert(t.constraints == Map("keep" -> "amount >= 0"))
    // the restored rule set actually binds: amount=0 passes keep (>= 0)
    // and would have violated the dropped-by-restore pos (> 0)
    t.merge(df((2, 0, "p2")))
    assert(contents(t.read) == Set((1, 5, "p1"), (2, 0, "p2")))
    // replay from scratch (fresh instance) reaches the same rule set
    val reopened = VersionedTable(spark, t.path, Seq("id"), Seq("part"))
    assert(reopened.constraints == Map("keep" -> "amount >= 0"))
  }
}
