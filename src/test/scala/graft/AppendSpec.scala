package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

import graft.lake.VersionedTable

/** INSERT-INTO append on the versioned table: adds-only commits, schema
  * alignment, the PK-uniqueness contract, CDF recording, and txn
  * idempotency.
  */
class AppendSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def contents(t: VersionedTable): Set[(Int, Int, String)] =
    t.read.select("id", "amount", "part").as[(Int, Int, String)].collect().toSet

  test("append adds rows without restaging untouched partitions") {
    val t = VersionedTable(spark, tmpDir("ap1") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2")))
    t.append(df((3, 30, "p1"), (4, 40, "p3")))
    assert(contents(t) == Set(
      (1, 10, "p1"), (2, 20, "p2"), (3, 30, "p1"), (4, 40, "p3")))
    val h = t.history.last
    // adds only — NOTHING removed: p1's old dir stays live beside the new
    assert(h._2 == "insert" && h._4 == 0, s"history: $h")
    assert(t.readVersion(1).count() == 2) // time travel intact
  }

  test("append aligns/null-fills omitted columns and refuses extras") {
    val t = VersionedTable(spark, tmpDir("ap2") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1")))
    t.append(Seq((5, "p1")).toDF("id", "part")) // amount omitted → NULL
    assert(t.read.filter(col("id") === 5 && col("amount").isNull).count() == 1)
    val e = intercept[IllegalArgumentException](
      t.append(Seq((6, 1, "p1", "x")).toDF("id", "amount", "part", "extra")))
    assert(e.getMessage.contains("extra"))
  }

  test("append refuses duplicate and NULL primary keys") {
    val t = VersionedTable(spark, tmpDir("ap3") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1")))
    // within the batch
    intercept[IllegalArgumentException](t.append(df((7, 1, "p1"), (7, 2, "p1"))))
    // against a live row (partition-pruned check)
    intercept[IllegalArgumentException](t.append(df((1, 99, "p1"))))
    // NULL key
    intercept[IllegalArgumentException](t.append(
      Seq((Option.empty[Int], 1, "p1")).toDF("id", "amount", "part")))
    assert(t.currentVersion == 1) // nothing committed
  }

  test("append records insert change images and streams through CDF") {
    val t = VersionedTable(spark, tmpDir("ap4") + "/t", Seq("id"), Seq("part"),
      recordCdf = true)
    t.merge(df((1, 10, "p1")))
    t.append(df((2, 20, "p2")))
    val f = t.changeFeed(1, 2)
    assert(f.select("id", "change_type").as[(Int, String)].collect().toSet ==
      Set((2, "insert")))
    assert(f.inputFiles.forall(_.contains("/_changes/")))
  }

  test("a replayed txn batch no-ops (sink idempotency contract)") {
    val t = VersionedTable(spark, tmpDir("ap5") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1")))
    t.append(df((2, 20, "p1")), txn = Some(("app", 7L)))
    t.append(df((2, 20, "p1")), txn = Some(("app", 7L))) // replay
    assert(t.currentVersion == 2)
    assert(contents(t) == Set((1, 10, "p1"), (2, 20, "p1")))
  }
}
