package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.lake.{GraftSql, VersionedTable}

/** Column DROP via mapping metadata (Delta's ALTER TABLE … DROP COLUMN):
  * the column leaves the recorded schema without touching a data file —
  * reads project it away, time travel still sees it, restore resurrects
  * it, and its physical name is retired against silent re-use.
  */
class DropColumnSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def dataFiles(path: String): Set[String] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(s"$path/data")).map(_.getPath)
      .filter(_.endsWith(".parquet")).toSet
  }

  test("drop is metadata-only; reads project the column away, time travel " +
      "still sees it") {
    val path = tmpDir("dc1") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1"), (2, 20, "p2")))            // v1
    val before = dataFiles(path)
    t.dropColumn("amount")                               // v2, metadata only
    assert(dataFiles(path) == before, "drop must not touch data files")
    assert(t.read.columns.toSeq == Seq("id", "part"))
    assert(t.tableSchema.fieldNames.toSeq == Seq("id", "part"))
    // the era before the drop reads the column as always
    assert(t.readVersion(1).columns.toSeq == Seq("id", "amount", "part"))
    assert(t.readVersion(1).filter(col("id") === 1)
      .select("amount").as[Int].head() == 10)
    // writes after the drop carry the narrowed schema; old dirs mix fine
    t.append(Seq((3, "p1")).toDF("id", "part"))          // v3
    assert(t.read.columns.toSeq == Seq("id", "part"))
    assert(t.read.count() == 3)
  }

  test("restore to a pre-drop version resurrects the column") {
    val t = VersionedTable(spark, tmpDir("dc2") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1")))                           // v1
    t.dropColumn("amount")                               // v2
    assert(!t.read.columns.contains("amount"))
    t.restore(1)                                         // v3
    assert(t.read.columns.toSeq == Seq("id", "amount", "part"))
    assert(t.read.select("amount").as[Int].head() == 10)
    // and a re-drop works after the restore
    t.dropColumn("amount")                               // v4
    assert(!t.read.columns.contains("amount"))
  }

  test("a restore CHAIN re-drops: restore(post-drop) after restore(pre-drop) " +
      "re-narrows the schema and re-retires the physical name") {
    val t = VersionedTable(spark, tmpDir("dc2b") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1")))                           // v1
    t.dropColumn("amount")                               // v2
    t.restore(1)                                         // v3: resurrects
    assert(t.read.columns.contains("amount"))
    t.restore(2)                                         // v4: back to dropped
    assert(t.read.columns.toSeq == Seq("id", "part"),
      s"restore chain resurfaced the dropped column: ${t.read.columns.mkString(",")}")
    // the physical name is retired again — a new 'amount' is refused
    val e = intercept[IllegalArgumentException](
      t.merge(Seq((2, 99, "p1")).toDF("id", "amount", "part")))
    assert(e.getMessage.contains("retired") || e.getMessage.contains("drop"))
  }

  test("the dropped name is retired: schema evolution and renames cannot " +
      "silently rebind old on-disk data") {
    val t = VersionedTable(spark, tmpDir("dc3") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1")))                           // v1
    t.dropColumn("amount")                               // v2
    // a merge re-introducing 'amount' would make old files' data
    // reappear under the new column for old rows — refused
    val e = intercept[IllegalArgumentException](
      t.merge(Seq((2, 99, "p1")).toDF("id", "amount", "part")))
    assert(e.getMessage.contains("retired") || e.getMessage.contains("drop"))
    // renaming another column ONTO the dropped name is refused too
    t.merge(Seq((2, "x", "p1")).toDF("id", "tag", "part"))  // v3 widens
    val e2 = intercept[IllegalArgumentException](
      t.renameColumn("tag", "amount"))
    assert(e2.getMessage.contains("dropped"))
  }

  test("dropping a RENAMED column clears its mapping: a fresh column may " +
      "re-use the LOGICAL name, never the physical one") {
    val t = VersionedTable(spark, tmpDir("dc4") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1")))                           // v1
    t.renameColumn("amount", "amt")                      // v2: amt → amount on disk
    t.dropColumn("amt")                                  // v3: retires physical 'amount'
    assert(t.read.columns.toSeq == Seq("id", "part"))
    // logical 'amt' is free again — new data, NEW physical column
    t.merge(Seq((2, 77, "p1")).toDF("id", "amt", "part")) // v4
    val amts = t.read.select("id", "amt").as[(Int, Option[Int])].collect().toMap
    // row 1's old 'amount' data must NOT leak back into the new 'amt'
    assert(amts == Map(1 -> None, 2 -> Some(77)))
    // but the retired PHYSICAL name stays off limits
    val e = intercept[IllegalArgumentException](
      t.merge(Seq((3, 1, "p1")).toDF("id", "amount", "part")))
    assert(e.getMessage.contains("retired") || e.getMessage.contains("drop"))
  }

  test("identity/referenced/generated/last columns are refused; state " +
      "survives checkpoint replay and clones") {
    val path = tmpDir("dc5") + "/t"
    // checkpointInterval=2 so the dropped set must round-trip checkpoints
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"),
      checkpointInterval = 2)
    t.merge(df((1, 10, "p1")))                           // v1
    intercept[IllegalArgumentException](t.dropColumn("id"))
    intercept[IllegalArgumentException](t.dropColumn("part"))
    intercept[IllegalArgumentException](t.dropColumn("nope"))
    t.addConstraint("pos", "amount IS NULL OR amount > 0") // v2
    val e = intercept[IllegalArgumentException](t.dropColumn("amount"))
    assert(e.getMessage.contains("referenced"))
    t.dropConstraint("pos")                              // v3
    t.dropColumn("amount")                               // v4 (checkpointed)
    // a FRESH handle replays from the checkpoint: the drop must hold
    val t2 = VersionedTable(spark, path, Seq("id"), Seq("part"),
      checkpointInterval = 2)
    assert(t2.read.columns.toSeq == Seq("id", "part"))
    intercept[IllegalArgumentException](
      t2.merge(Seq((9, 9, "p1")).toDF("id", "amount", "part")))
    // a clone of the post-drop table carries the narrowed schema
    val c = t2.cloneTo(tmpDir("dc5c") + "/c")
    assert(c.read.columns.toSeq == Seq("id", "part"))
  }

  test("ADD COLUMN is metadata-only: existing rows read NULL, writes fill " +
      "it, old versions lack it, retired names are refused") {
    val path = tmpDir("dc7") + "/t"
    val t = VersionedTable(spark, path, Seq("id"), Seq("part"))
    t.merge(df((1, 10, "p1")))                           // v1
    val before = dataFiles(path)
    t.addColumn("note", org.apache.spark.sql.types.StringType) // v2
    assert(dataFiles(path) == before, "add must not touch data files")
    assert(t.read.columns.toSeq == Seq("id", "amount", "part", "note"))
    assert(t.read.select("note").as[Option[String]].head().isEmpty)
    assert(!t.readVersion(1).columns.contains("note")) // era-correct
    t.merge(Seq((2, 20, "p1", "x")).toDF("id", "amount", "part", "note")) // v3
    assert(t.read.select("id", "note").as[(Int, Option[String])]
      .collect().toMap == Map(1 -> None, 2 -> Some("x")))
    // duplicate and retired names are refused
    intercept[IllegalArgumentException](
      t.addColumn("AMOUNT", org.apache.spark.sql.types.IntegerType))
    t.dropColumn("note")                                 // v4
    val e = intercept[IllegalArgumentException](
      t.addColumn("note", org.apache.spark.sql.types.StringType))
    assert(e.getMessage.contains("retired"))
    // SQL dispatch
    GraftSql.register(spark, "dc7_t", t)
    GraftSql.run(spark, "ALTER TABLE dc7_t ADD COLUMN tag STRING")  // v5
    assert(GraftSql.run(spark, "SELECT * FROM dc7_t").columns.toSeq ==
      Seq("id", "amount", "part", "tag"))
    // ADD COLUMN DEFAULT is supported (round 11): existing rows read the
    // frozen default — covered in depth by DefaultColumnsSpec
    GraftSql.run(spark, "ALTER TABLE dc7_t ADD COLUMN d INT DEFAULT 7")  // v6
    import spark.implicits._
    assert(GraftSql.run(spark, "SELECT DISTINCT d FROM dc7_t")
      .as[Int].collect().toSeq == Seq(7))
    // FIRST/AFTER positioning is supported since round 12 — covered in
    // depth by AlterColumnSurfaceSpec
    GraftSql.run(spark, "ALTER TABLE dc7_t ADD COLUMN e INT FIRST")  // v7
    assert(GraftSql.run(spark, "SELECT * FROM dc7_t").columns.head == "e")
    GraftSql.run(spark, "DROP TABLE dc7_t")
  }

  test("ALTER TABLE … DROP COLUMN dispatches from SQL") {
    val t = VersionedTable(spark, tmpDir("dc6") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p2")))
    GraftSql.register(spark, "dc6_t", t)
    val r = GraftSql.run(spark, "ALTER TABLE dc6_t DROP COLUMN amount")
    assert(r.as[(String, String, Long)].head() == ("drop column", "dc6_t", 2L))
    assert(GraftSql.run(spark, "SELECT * FROM dc6_t").columns.toSeq ==
      Seq("id", "part"))
    // time travel from SQL still reads the dropped era
    assert(GraftSql.run(spark,
      "SELECT amount FROM dc6_t VERSION AS OF 1 WHERE id = 1")
      .as[Int].head() == 10)
    // IF EXISTS no-ops on a missing column; without it, loud failure
    val v = GraftSql.run(spark,
      "ALTER TABLE dc6_t DROP COLUMN IF EXISTS nope")
      .select("version").as[Long].head()
    assert(v == 2L, "IF EXISTS on a missing column must not commit")
    intercept[IllegalArgumentException](
      GraftSql.run(spark, "ALTER TABLE dc6_t DROP COLUMN nope"))
    GraftSql.run(spark, "DROP TABLE dc6_t")
  }
}
