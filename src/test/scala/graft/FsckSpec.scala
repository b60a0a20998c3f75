package graft

import org.apache.spark.sql.functions._

import graft.lake.{GraftSql, VersionedTable}

/** FSCK REPAIR TABLE: references to vanished storage (a deleted clone
  * source, an external cleanup racing retention) drop from the live set
  * in one commit so the table reads again.
  */
class FsckSpec extends SparkSpec {
  import spark.implicits._

  private def delete(p: java.io.File): Unit = {
    if (p.isDirectory) p.listFiles.foreach(delete)
    p.delete()
  }

  test("a clone whose source partition vanished fails to read; FSCK DRY " +
      "RUN names the refs, REPAIR drops them and the clone reads again") {
    val srcPath = tmpDir("fsck1") + "/t"
    val t = VersionedTable(spark, srcPath, Seq("id"), Seq("part"))
    t.overwrite(Seq((1, "p1"), (2, "p2"), (3, "p2")).toDF("id", "part"))
    val c = t.cloneTo(tmpDir("fsck1c") + "/t")
    // destroy the SOURCE's p1 leaf out from under the clone
    val p1 = new java.io.File(s"$srcPath/data").listFiles
      .filter(_.isDirectory).flatMap(_.listFiles)
      .find(_.getName == "part=p1").get
    delete(p1)
    intercept[Exception](c.read.count())
    val dry = c.fsck(dryRun = true)
    assert(dry.length == 1 && dry.head.contains("part=p1"))
    assert(c.currentVersion == 1, "DRY RUN must not commit")
    val repaired = c.fsck()
    assert(repaired == dry)
    assert(c.read.select("id").as[Int].collect().toSet == Set(2, 3))
    // history survives; a fresh handle replays the repair
    assert(c.copy().read.count() == 2)
    // idempotent: nothing left to repair
    assert(c.fsck().isEmpty)
  }

  test("intact tombstones survive a repair (declared reset keeps them); " +
      "SQL dispatch returns the missing refs") {
    val path = tmpDir("fsck2") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"))
    t.overwrite(Seq((1, "p1"), (2, "p2"), (3, "p2")).toDF("id", "part"))
    t.deleteMor(col("id") === 3)          // tombstone in p2, no rewrite
    assert(t.read.count() == 2)
    val c = t.cloneTo(tmpDir("fsck2c") + "/t")
    // register while healthy (registration eagerly builds the view);
    // the storage loss happens afterwards, as it would in production
    GraftSql.register(spark, "fsck_sql_t", c)
    val p1 = new java.io.File(s"$path/data").listFiles
      .filter(_.isDirectory).flatMap(_.listFiles)
      .find(_.getName == "part=p1").get
    delete(p1)
    val dry = GraftSql.run(spark, "FSCK REPAIR TABLE fsck_sql_t DRY RUN")
      .as[String].collect()
    assert(dry.length == 1)
    GraftSql.run(spark, "FSCK REPAIR TABLE fsck_sql_t")
    // p1's row is gone (storage loss), p2's tombstone still suppresses 3
    assert(GraftSql.run(spark, "SELECT id FROM fsck_sql_t")
      .as[Int].collect().toSet == Set(2))
    GraftSql.unregister(spark, "fsck_sql_t")
  }
}
