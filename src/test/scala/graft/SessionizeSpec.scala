package graft

import java.nio.file.{Files, Paths}

import graft.streaming.Sessionize

/** flatMapGroupsWithState sessionization: state must carry across
  * micro-batches so sessions spanning two file drops count once.
  */
class SessionizeSpec extends SparkSpec {

  private def writeCsv(dir: String, name: String, rows: Seq[(Long, Long)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name),
      ("user_id,sec" +: rows.map { case (u, s) => s"$u,$s" }).mkString("\n").getBytes)
  }

  test("sessions continue and split correctly across batches") {
    val work = tmpDir("sess")
    val bronze = s"$work/bronze"
    // batch 1: user 1 → one session (gap 100 ≤ 1800); user 2 → one session
    writeCsv(bronze, "b1.csv", Seq((1L, 1000L), (1L, 1100L), (2L, 5000L)))
    Sessionize.runAvailable(spark, bronze, s"$work/ckpt", s"$work/out")
    // batch 2: user 1 continues its session (1100→1200); user 2 starts a NEW
    // session (5000→9000 > 1800); user 3 appears with two sessions
    writeCsv(bronze, "b2.csv", Seq((1L, 1200L), (2L, 9000L), (3L, 0L), (3L, 10000L)))
    Sessionize.runAvailable(spark, bronze, s"$work/ckpt", s"$work/out")

    val counts = Sessionize.finalCounts(spark, s"$work/out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("single batch matches an in-memory fold of the same rule") {
    val work = tmpDir("sess")
    val evs = Seq((7L, 0L), (7L, 1800L), (7L, 3601L), (7L, 10000L))
    writeCsv(s"$work/bronze", "b1.csv", evs)
    Sessionize.runAvailable(spark, s"$work/bronze", s"$work/ckpt", s"$work/out")
    // gaps: 1800 (same), 1801 (new), 6399 (new) → 3 sessions
    val counts = Sessionize.finalCounts(spark, s"$work/out")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(7L -> 3L))
  }
}
