package graft

import org.apache.spark.sql.DataFrame

import graft.lake.VersionedTable

/** VACUUM-safe concurrent reads — the retention contract under a
  * reader/maintenance race: a reader pinned at version v (both a fresh
  * readVersion(v) and a DataFrame plan CAPTURED before the vacuum ran)
  * stays byte-correct while vacuum reclaims versions < v, because the
  * plan keeps every dir ANY retained version references — shared dirs
  * survive, only storage no retained version can see dies.
  */
class VacuumConcurrentReadSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def rowsOf(d: DataFrame): Set[(Int, Int, String)] =
    d.select("id", "amount", "part").as[(Int, Int, String)].collect().toSet

  test("a read pinned at a retained version survives vacuum of older versions") {
    val t = VersionedTable(spark, tmpDir("vcr1") + "/t", Seq("id"), Seq("part"))
    t.append(df((1, 10, "p1"), (2, 20, "p2")))               // v1
    t.overwritePartitions(df((1, 11, "p1")))                 // v2: v1's p1 dir dies
    t.append(df((3, 30, "p2")))                              // v3 — the pin
    val vPin = t.currentVersion
    t.overwritePartitions(df((2, 22, "p2"), (3, 33, "p2")))  // v4: p2 restaged
    t.append(df((4, 40, "p1")))                              // v5

    // plan captured BEFORE the vacuum — the concurrent reader
    val pinned = t.readVersion(vPin)
    val expected = rowsOf(pinned)
    assert(expected == Set((1, 11, "p1"), (2, 20, "p2"), (3, 30, "p2")))
    val laterSnaps = (vPin + 1 to t.currentVersion)
      .map(v => v -> rowsOf(t.readVersion(v))).toMap

    val retain = t.currentVersion - vPin + 1
    val planned = t.vacuumPlan(retain)
    // non-vacuous: something older actually dies (v1's superseded p1 dir
    // is unreferenced by every retained version)
    assert(planned.nonEmpty, "vacuum must have something to reclaim here")
    t.vacuum(retain)

    // the captured plan still executes and still reads version-v bytes:
    // its p2 dir is v1 storage SHARED into the retained range, so
    // retention kept it even though v1 itself is no longer readable
    assert(rowsOf(pinned) == expected)
    // a fresh pin resolves identically
    assert(rowsOf(t.readVersion(vPin)) == expected)
    // every other retained version is untouched
    laterSnaps.foreach { case (v, snap) =>
      assert(rowsOf(t.readVersion(v)) == snap, s"version $v changed")
    }
    // the unretained version 1 lost its unique storage — reading it fails
    // loudly instead of returning a silently partial frame
    intercept[Exception] { t.readVersion(1).collect() }
  }

  test("vacuumPlan never intersects any retained version's input files") {
    val t = VersionedTable(spark, tmpDir("vcr2") + "/t", Seq("id"), Seq("part"))
    t.append(df((1, 10, "p1"), (2, 20, "p2")))               // v1
    t.overwritePartitions(df((1, 11, "p1"), (5, 50, "p1")))  // v2
    t.append(df((3, 30, "p3")))                              // v3
    t.overwrite(df((6, 60, "p1"), (7, 70, "p2")))            // v4: full restage
    t.append(df((8, 80, "p3")))                              // v5
    val cur = t.currentVersion
    for (retain <- 1 to cur) {
      val planned = t.vacuumPlan(retain).map(_.toString)
      for (v <- (cur - retain + 1) to cur) {
        val files = t.readVersion(v).inputFiles
        val hit = files.filter(f => planned.exists(p =>
          f.startsWith(p + "/") || f == p))
        assert(hit.isEmpty,
          s"retain=$retain would reclaim version $v storage: ${hit.toSeq}")
      }
    }
    // and the tightest retention really does reclaim the dead history
    assert(t.vacuumPlan(1).nonEmpty)
  }
}
