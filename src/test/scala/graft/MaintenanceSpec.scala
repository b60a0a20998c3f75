package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.lake.{GraftSql, VersionedTable}

/** Partition-scoped compaction (OPTIMIZE … WHERE): only the matching
  * partitions rewrite; tombstones fold in there and survive elsewhere.
  */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def contents(t: VersionedTable): Set[(Int, Int, String)] =
    t.read.select("id", "amount", "part").as[(Int, Int, String)].collect().toSet

  test("compactWhere rewrites only the matching partitions") {
    val path = tmpDir("mw1") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1"), (2, 20, "p2")))   // v1
    t.append(df((3, 30, "p1"), (4, 40, "p2")))  // v2: adds-only → 2 dirs per partition
    def p2Files = t.read.inputFiles.filter(_.contains("part=p2")).toSet
    val before = p2Files
    t.compactWhere(col("part") === "p1")         // v3
    assert(t.history.last._2 == "compact_part")
    assert(contents(t) == Set((1, 10, "p1"), (2, 20, "p2"), (3, 30, "p1"), (4, 40, "p2")))
    // p2's physical files are untouched
    assert(p2Files == before)
    // p1 collapsed to one dir: v3 removed p1's two dirs, added one
    val h = t.history.last
    assert(h._3 == 1 && h._4 == 2, s"history: $h")
  }

  test("compactWhere folds the touched partitions' tombstones and keeps " +
      "the others'") {
    val t = VersionedTable(spark, tmpDir("mw2") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2"), (4, 40, "p2")))
    t.deleteMor(col("id") === 1)                 // tombstone in p1
    t.deleteMor(col("id") === 3)                 // tombstone in p2
    t.compactWhere(col("part") === "p1")
    // p1's tombstone folded into the rewrite; p2's still suppresses row 3
    assert(contents(t) == Set((2, 20, "p1"), (4, 40, "p2")))
    // a later append in p2 must still see its tombstone honored
    t.append(df((5, 50, "p2")))
    assert(contents(t) == Set((2, 20, "p1"), (4, 40, "p2"), (5, 50, "p2")))
  }

  test("OPTIMIZE … WHERE runs from SQL; a no-match predicate is a no-op") {
    val t = VersionedTable(spark, tmpDir("mw3") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1"), (2, 20, "p2")))
    GraftSql.register(spark, "mw3_t", t)
    GraftSql.run(spark, "OPTIMIZE mw3_t WHERE part = 'p1'")
    assert(t.history.last._2 == "compact_part")
    val v = t.currentVersion
    GraftSql.run(spark, "OPTIMIZE mw3_t WHERE part = 'zzz'")
    assert(t.currentVersion == v) // nothing matched, nothing committed
    assert(contents(t) == Set((1, 10, "p1"), (2, 20, "p2")))
  }
}
