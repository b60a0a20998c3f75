package graft

import org.apache.spark.sql.DataFrame

import graft.lake.{GraftSql, VersionedTable}

/** COPY INTO (Databricks/Delta-style idempotent file ingest): the
  * copied-file ledger (first load, no-op re-run, delta-only load),
  * PATTERN globbing, the CSV declared-schema path, FORMAT_OPTIONS
  * header handling, COPY_OPTIONS force after RESTORE, checkpoint replay
  * of the ledger, and clone carry-over.
  */
class CopyIntoSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "x", "part")

  /** Stage `rows` as a SINGLE parquet file named `dir/name` (COPY INTO
    * sources are loose files dropped by an uploader, not Spark output
    * dirs — the part-file is lifted out of a scratch write).
    */
  private def putParquet(dir: String, name: String,
                         rows: (Int, Int, String)*): Unit = {
    val stage = tmpDir("cp_stage")
    df(rows: _*).coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(dir, name))
  }

  private def putText(dir: String, name: String, lines: String*): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
      lines.mkString("\n").getBytes("UTF-8"))

  test("parquet: first load, idempotent re-run, delta-only load") {
    val src = tmpDir("cp1_src")
    putParquet(src, "f1.parquet", (1, 10, "a"), (2, 20, "b"))
    val t = VersionedTable(spark, tmpDir("cp1") + "/t", Seq("id"), Seq("part"))
    assert(t.copyFrom(src) == 1)
    assert(t.currentVersion == 1 && t.read.count() == 2)
    // same statement again: the ledger filters everything — no commit
    assert(t.copyFrom(src) == 0)
    assert(t.currentVersion == 1)
    // a new file in the directory loads exactly the delta
    putParquet(src, "f2.parquet", (3, 30, "a"))
    assert(t.copyFrom(src) == 1)
    assert(t.read.count() == 3)
    assert(t.copiedFiles.size == 2)
  }

  test("PATTERN restricts the glob; underscore/dot files are never listed") {
    val src = tmpDir("cp2_src")
    putParquet(src, "f1.parquet", (1, 10, "a"))
    putParquet(src, "g1.parquet", (2, 20, "a"))
    putParquet(src, "_committed.parquet", (9, 90, "z")) // writer sidecar
    val t = VersionedTable(spark, tmpDir("cp2") + "/t", Seq("id"), Seq("part"))
    assert(t.copyFrom(src, pattern = Some("f*.parquet")) == 1)
    assert(t.read.select("id").as[Int].collect().toSet == Set(1))
    // widening the pattern later loads only what the ledger lacks
    assert(t.copyFrom(src) == 1) // g1 — the _ file stays invisible
    assert(t.read.select("id").as[Int].collect().toSet == Set(1, 2))
  }

  test("SQL: CSV copy into a just-CREATEd table uses the declared schema") {
    val work = tmpDir("cp3")
    val src = tmpDir("cp3_src")
    putText(src, "day1.csv", "id,x,part", "1,10,a", "2,20,b")
    GraftSql.run(spark,
      s"""CREATE TABLE cp3_t (id INT, x INT, part STRING) USING graft
          PARTITIONED BY (part) LOCATION '$work/t' TBLPROPERTIES ('pk'='id')""")
    val r1 = GraftSql.run(spark,
      s"COPY INTO cp3_t FROM '$src' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true')").head()
    assert(r1.getAs[Long]("num_files_loaded") == 1L)
    assert(GraftSql.run(spark, "SELECT sum(x) FROM cp3_t").as[Long].head() == 30)
    // re-run: 0 files, no version movement
    val r2 = GraftSql.run(spark,
      s"COPY INTO cp3_t FROM '$src' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true')").head()
    assert(r2.getAs[Long]("num_files_loaded") == 0L)
    // the delta file alone loads on the next run
    putText(src, "day2.csv", "id,x,part", "3,30,a")
    val r3 = GraftSql.run(spark,
      s"COPY INTO cp3_t FROM '$src' FILEFORMAT = CSV " +
        "FORMAT_OPTIONS ('header' = 'true')").head()
    assert(r3.getAs[Long]("num_files_loaded") == 1L)
    assert(GraftSql.run(spark, "SELECT count(*) FROM cp3_t").as[Long].head() == 3)
    GraftSql.run(spark, "DROP TABLE cp3_t")
  }

  test("CSV header defaults to FALSE (Databricks parity): a headerless " +
      "file keeps its first row without any FORMAT_OPTIONS") {
    val work = tmpDir("cp4")
    val src = tmpDir("cp4_src")
    putText(src, "raw.csv", "1,10,a", "2,20,b") // NO header line
    GraftSql.run(spark,
      s"""CREATE TABLE cp4_t (id INT, x INT, part STRING) USING graft
          PARTITIONED BY (part) LOCATION '$work/t' TBLPROPERTIES ('pk'='id')""")
    GraftSql.run(spark, s"COPY INTO cp4_t FROM '$src' FILEFORMAT = CSV")
    // a header=true default would have eaten row id=1 as the header
    assert(GraftSql.run(spark, "SELECT min(id), count(*) FROM cp4_t")
      .as[(Int, Long)].head() == ((1, 2L)))
    // near-miss option keys refuse instead of silently defaulting
    val e1 = intercept[Exception](GraftSql.run(spark,
      s"COPY INTO cp4_t FROM '$src' FILEFORMAT = CSV FORMAT_OPTIONS ('haeder' = 'false')"))
    assert(e1.getMessage.contains("unknown FORMAT_OPTIONS"))
    val e2 = intercept[Exception](GraftSql.run(spark,
      s"COPY INTO cp4_t FROM '$src' FILEFORMAT = PARQUET FORMAT_OPTIONS ('header' = 'false')"))
    assert(e2.getMessage.contains("CSV only"))
    GraftSql.run(spark, "DROP TABLE cp4_t")
  }

  test("checkpoint replays the ledger on a fresh handle") {
    val src = tmpDir("cp5_src")
    val loc = tmpDir("cp5") + "/t"
    putParquet(src, "f1.parquet", (1, 10, "a"))
    val t = VersionedTable(spark, loc, Seq("id"), Seq("part"),
      checkpointInterval = 2)
    assert(t.copyFrom(src) == 1)                       // v1
    putParquet(src, "f2.parquet", (2, 20, "a"))
    assert(t.copyFrom(src) == 1)                       // v2 → checkpoint
    putParquet(src, "f3.parquet", (3, 30, "b"))
    assert(t.copyFrom(src) == 1)                       // v3 (tail)
    // a fresh handle rebuilds checkpoint + tail: full ledger, no reload
    val t2 = VersionedTable(spark, loc, Seq("id"), Seq("part"),
      checkpointInterval = 2)
    assert(t2.copiedFiles.size == 3)
    assert(t2.copyFrom(src) == 0)
    assert(t2.read.count() == 3)
  }

  test("clone carries the ledger; the clone tracks its own deltas") {
    val src = tmpDir("cp6_src")
    putParquet(src, "f1.parquet", (1, 10, "a"))
    val t = VersionedTable(spark, tmpDir("cp6") + "/t", Seq("id"), Seq("part"))
    t.copyFrom(src)
    val c = t.cloneTo(tmpDir("cp6") + "/clone")
    // re-running the SAME copy against the clone stays idempotent
    assert(c.copyFrom(src) == 0)
    putParquet(src, "f2.parquet", (2, 20, "b"))
    assert(c.copyFrom(src) == 1)
    // …without contaminating the source table's ledger
    assert(t.copiedFiles.size == 1 && c.copiedFiles.size == 2)
    assert(t.copyFrom(src) == 1)
  }

  test("ledger survives RESTORE; COPY_OPTIONS force re-ingests the delta") {
    val src = tmpDir("cp7_src")
    putParquet(src, "f1.parquet", (1, 10, "a"))
    val t = VersionedTable(spark, tmpDir("cp7") + "/t", Seq("id"), Seq("part"))
    t.copyFrom(src)                                    // v1
    putParquet(src, "f2.parquet", (2, 20, "b"))
    t.copyFrom(src)                                    // v2
    GraftSql.register(spark, "cp7_t", t)
    GraftSql.run(spark, "RESTORE cp7_t TO VERSION AS OF 1") // v3: f2's rows gone
    assert(t.read.count() == 1)
    // the ledger deliberately survives restore — a plain re-run is a no-op
    assert(t.copyFrom(src) == 0)
    // force is the escape hatch: re-ingest the restored-away file
    val r = GraftSql.run(spark, s"COPY INTO cp7_t FROM '$src' " +
      "FILEFORMAT = PARQUET PATTERN = 'f2.parquet' COPY_OPTIONS ('force' = 'true')").head()
    assert(r.getAs[Long]("num_files_loaded") == 1L)
    assert(t.read.count() == 2)
    // force on keys STILL PRESENT hits append's PK-uniqueness wall — it
    // can never silently double rows
    val e = intercept[Exception](
      t.copyFrom(src, pattern = Some("f1.parquet"), force = true))
    assert(e.getMessage.contains("duplicate a primary key"))
    GraftSql.run(spark, "DROP TABLE cp7_t")
  }

  test("racing COPY INTOs of the same files never double-load") {
    val src = tmpDir("cp9_src")
    putParquet(src, "f1.parquet", (1, 10, "a"), (2, 20, "a"))
    val t = VersionedTable(spark, tmpDir("cp9") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((100, 0, "z")))                     // v1 seed
    val other = VersionedTable(spark, t.path, Seq("id"), Seq("part"))
    // a competing writer lands the SAME copy between our listing and our
    // commit — the optimistic commit must detect the overlap (same
    // partition, same keys) and roll back, never land the rows twice
    var fired = false
    t.beforeCommitHook = () => {
      if (!fired) { fired = true; other.copyFrom(src) }
    }
    intercept[Exception](t.copyFrom(src))
    t.beforeCommitHook = () => ()
    assert(t.read.count() == 3, "rows must land exactly once")
    assert(t.copiedFiles.size == 1, "the file is in the ledger once")
    // and OUR statement, re-run, is now the idempotent no-op
    assert(t.copyFrom(src) == 0)
  }

  test("FILES = (…) loads exactly the named files, stays idempotent, and " +
      "refuses a missing name") {
    val src = tmpDir("cp9_src")
    putParquet(src, "f1.parquet", (1, 10, "a"))
    putParquet(src, "f2.parquet", (2, 20, "b"))
    putParquet(src, "f3.parquet", (3, 30, "a"))
    val t = VersionedTable(spark, tmpDir("cp9") + "/t", Seq("id"), Seq("part"))
    // only the named subset loads — f3 stays out despite matching any glob
    assert(t.copyFrom(src, files = Some(Seq("f1.parquet", "f2.parquet"))) == 2)
    assert(t.read.select("id").as[Int].collect().toSet == Set(1, 2))
    // the ledger applies to explicit names too: re-listing is a no-op,
    // a list overlapping history loads only the fresh file
    assert(t.copyFrom(src, files = Some(Seq("f1.parquet", "f2.parquet"))) == 0)
    assert(t.copyFrom(src, files = Some(Seq("f2.parquet", "f3.parquet"))) == 1)
    assert(t.read.count() == 3)
    // an explicit manifest with a gap is an operator error, not a skip
    val e = intercept[IllegalArgumentException](
      t.copyFrom(src, files = Some(Seq("gone.parquet"))))
    assert(e.getMessage.contains("missing file"))
    // PATTERN and FILES are mutually exclusive
    val e2 = intercept[IllegalArgumentException](t.copyFrom(src,
      pattern = Some("*.parquet"), files = Some(Seq("f1.parquet"))))
    assert(e2.getMessage.contains("not both"))
  }

  test("SQL: COPY INTO … FILES = ('…') round trip") {
    val work = tmpDir("cp10")
    val src = tmpDir("cp10_src")
    putParquet(src, "a.parquet", (1, 10, "a"))
    putParquet(src, "b.parquet", (2, 20, "b"))
    GraftSql.run(spark,
      s"""CREATE TABLE cp10_t (id INT, x INT, part STRING) USING graft
          PARTITIONED BY (part) LOCATION '$work/t' TBLPROPERTIES ('pk'='id')""")
    val r1 = GraftSql.run(spark, s"COPY INTO cp10_t FROM '$src' " +
      "FILEFORMAT = PARQUET FILES = ('a.parquet')").head()
    assert(r1.getAs[Long]("num_files_loaded") == 1L)
    assert(GraftSql.run(spark, "SELECT count(*) FROM cp10_t")
      .as[Long].head() == 1L)
    // widening the list later loads only the delta
    val r2 = GraftSql.run(spark, s"COPY INTO cp10_t FROM '$src' " +
      "FILEFORMAT = PARQUET FILES = ('a.parquet', 'b.parquet')").head()
    assert(r2.getAs[Long]("num_files_loaded") == 1L)
    // an empty list refuses instead of silently loading nothing
    val e = intercept[IllegalArgumentException](GraftSql.run(spark,
      s"COPY INTO cp10_t FROM '$src' FILEFORMAT = PARQUET FILES = ()"))
    assert(e.getMessage.contains("FILES"))
    GraftSql.run(spark, "DROP TABLE cp10_t")
  }

  test("copyFrom refuses a missing source dir and a bad format") {
    val t = VersionedTable(spark, tmpDir("cp8") + "/t", Seq("id"), Seq("part"))
    val e1 = intercept[IllegalArgumentException](
      t.copyFrom(tmpDir("cp8_gone") + "/nope"))
    assert(e1.getMessage.contains("not a directory"))
    val e2 = intercept[IllegalArgumentException](
      t.copyFrom(tmpDir("cp8_src"), format = "json"))
    assert(e2.getMessage.contains("FILEFORMAT"))
    // CSV into a commit-less table with no schema hint is a clear error
    val src = tmpDir("cp8_csv")
    putText(src, "a.csv", "id,x,part", "1,10,a")
    val e3 = intercept[RuntimeException](t.copyFrom(src, format = "csv"))
    assert(e3.getMessage.contains("needs a schema"))
  }
}
