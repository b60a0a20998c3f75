package graft

import org.apache.spark.sql.functions.col

import graft.lake.{GraftSql, VersionedTable}

/** In-place adoption of plain parquet (CONVERT TO GRAFT) and the vacuum
  * DRY RUN planning surface.
  */
class ConvertSpec extends SparkSpec {
  import spark.implicits._

  test("convertFrom references a hive-partitioned parquet dir in place: " +
      "no copy, versioned mutations after, source never vacuumed") {
    val work = tmpDir("cv1")
    // a "foreign" plain-parquet table, written by some other system
    Seq((1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2"))
      .toDF("id", "amount", "part")
      .write.partitionBy("part").parquet(s"$work/src")
    def srcFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$work/src")).map(_.getPath)
        .filter(_.endsWith(".parquet")).toSet
    }
    val before = srcFiles
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    t.convertFrom(s"$work/src")
    assert(t.currentVersion == 1)
    assert(srcFiles == before, "convert must not touch the source")
    assert(!new java.io.File(s"$work/t/data").exists() ||
      new java.io.File(s"$work/t/data").listFiles().isEmpty,
      "convert must not copy data under the table")
    assert(t.read.select("id", "amount", "part").as[(Int, Int, String)]
      .collect().toSet == Set((1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2")))
    // versioned life begins: merge restages ONLY the touched partition
    t.merge(Seq((1, 99, "p1")).toDF("id", "amount", "part")) // v2
    assert(t.read.filter(col("id") === 1).select("amount").as[Int].head() == 99)
    assert(t.readVersion(1).filter(col("id") === 1)
      .select("amount").as[Int].head() == 10) // time travel to the adopted era
    assert(srcFiles == before, "mutation must stage under the table, not the source")
    // vacuum never reclaims the referenced source
    t.vacuum()
    assert(srcFiles == before)
    assert(t.read.count() == 3)
  }

  test("a moved/deleted convert source fails reads with the external-" +
      "source contract named, not a bare path error") {
    val work = tmpDir("cv_gone")
    Seq((1, 10, "p1"), (2, 20, "p2")).toDF("id", "amount", "part")
      .write.partitionBy("part").parquet(s"$work/src")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    t.convertFrom(s"$work/src")
    assert(t.read.count() == 2)
    // the source moves out from under the table (ext= URIs are absolute)
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$work/src"),
      java.nio.file.Paths.get(s"$work/src_moved"))
    val e = intercept[IllegalStateException](t.read.count())
    assert(e.getMessage.contains("external source") &&
      e.getMessage.contains("CONVERT TO GRAFT") &&
      e.getMessage.contains(s"$work/src"))
    // restoring the source at its recorded location heals the table
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$work/src_moved"),
      java.nio.file.Paths.get(s"$work/src"))
    assert(t.read.count() == 2)
  }

  test("ANALYZE … FOR COLUMNS backfills skipping stats on adopted storage") {
    val work = tmpDir("cv_an")
    // a foreign dir with write-order correlation (x tracks the partition)
    // but NO graft stats — the 100 TB shape CONVERT adopts
    (0 until 1000).map(i => (i, i / 10, s"p${i / 250}"))
      .toDF("id", "x", "part")
      .write.partitionBy("part").parquet(s"$work/src")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"),
      statsCols = Seq("x"))
    t.convertFrom(s"$work/src")
    t.readWhere(col("x") < 10).count()
    assert(t.lastScanDirs == 4, "adopted dirs carry no stats — full scan")
    // one metadata commit, no rewrite: stats appear, skipping turns on
    assert(t.analyzeColumns(Seq("x")) == 4)
    assert(t.readWhere(col("x") < 10).count() == 100)
    assert(t.lastScanDirs == 1, s"expected pruning, scanned ${t.lastScanDirs}")
    // idempotent: everything is covered now
    assert(t.analyzeColumns(Seq("x")) == 0)
    // a fresh handle replays the overlay from the log alone
    val t2 = VersionedTable(spark, t.path, Seq("id"), Seq("part"),
      statsCols = Seq("x"))
    assert(t2.readWhere(col("x") >= 90).count() == 100)
    assert(t2.lastScanDirs == 1)
    // SQL surface; a FOR-COLUMNS-less near-miss refuses loudly
    GraftSql.register(spark, "cv_an_t", t)
    val r = GraftSql.run(spark,
      "ANALYZE TABLE cv_an_t COMPUTE STATISTICS FOR COLUMNS x").head()
    assert(r.getAs[Long]("num_dirs_analyzed") == 0L)
    val e = intercept[Exception](GraftSql.run(spark,
      "ANALYZE TABLE cv_an_t COMPUTE STATISTICS"))
    assert(e.getMessage.contains("unsupported ANALYZE"))
    intercept[RuntimeException](t.analyzeColumns(Seq("nope")))
    GraftSql.run(spark, "DROP TABLE cv_an_t")
  }

  test("a second live handle sees another handle's ANALYZE backfill — " +
      "no stale stats-cache window") {
    val work = tmpDir("cv_stale")
    (0 until 400).map(i => (i, i / 10, s"p${i / 100}"))
      .toDF("id", "x", "part").write.partitionBy("part").parquet(s"$work/src")
    val writer = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"),
      statsCols = Seq("x"))
    writer.convertFrom(s"$work/src")
    val reader = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"),
      statsCols = Seq("x"))
    reader.readWhere(col("x") < 5).count() // resolves the stats-less dirs
    assert(reader.lastScanDirs == 4)
    assert(writer.analyzeColumns(Seq("x")) == 4) // the OTHER handle backfills
    assert(reader.readWhere(col("x") < 5).count() == 50)
    assert(reader.lastScanDirs == 1,
      "an already-open handle must see the backfilled stats, not its " +
        "pre-ANALYZE cache entry")
  }

  test("analyze marks all-null dirs covered — re-runs are true no-ops") {
    val work = tmpDir("cv_null")
    Seq((1, Some(5), "p1"), (2, Option.empty[Int], "p2"))
      .toDF("id", "x", "part").write.partitionBy("part").parquet(s"$work/src")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    t.convertFrom(s"$work/src")
    // p2's x is all-null: no min/max claim, but a coverage marker lands
    assert(t.analyzeColumns(Seq("x")) == 2)
    assert(t.analyzeColumns(Seq("x")) == 0, "all-null dirs must not rescan")
    // the marker replays from the log — a fresh handle agrees
    val t2 = VersionedTable(spark, t.path, Seq("id"), Seq("part"))
    assert(t2.analyzeColumns(Seq("x")) == 0)
    // stats-less-but-marked dirs stay conservatively UNPRUNED
    assert(t.readWhere(col("x") === 5).count() == 1)
  }

  test("convert refuses duplicate PKs, missing columns, and wrong layout") {
    val work = tmpDir("cv2")
    Seq((1, 10, "p1"), (1, 20, "p2")).toDF("id", "amount", "part")
      .write.partitionBy("part").parquet(s"$work/dup")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    val e = intercept[IllegalArgumentException](t.convertFrom(s"$work/dup"))
    assert(e.getMessage.contains("uniqueness"))
    // partition layout must match the declared columns
    Seq((1, 10, "x")).toDF("id", "amount", "other")
      .write.partitionBy("other").parquet(s"$work/wrong")
    val e2 = intercept[IllegalArgumentException](t.convertFrom(s"$work/wrong"))
    assert(e2.getMessage.contains("partitioning") ||
      e2.getMessage.contains("column"))
  }

  test("CONVERT TO GRAFT runs from SQL and registers the table") {
    val work = tmpDir("cv3")
    Seq((1, 10, "p1"), (2, 20, "p2")).toDF("id", "amount", "part")
      .write.partitionBy("part").parquet(s"$work/src")
    GraftSql.run(spark,
      s"""CONVERT TO GRAFT '$work/src' AS cv3_t LOCATION '$work/t'
          TBLPROPERTIES ('pk'='id', 'partition'='part')""")
    assert(GraftSql.run(spark, "SELECT count(*) AS n FROM cv3_t")
      .as[Long].head() == 2L)
    GraftSql.run(spark, "UPDATE cv3_t SET amount = amount + 1 WHERE id = 1")
    assert(GraftSql.run(spark,
      "SELECT amount FROM cv3_t WHERE id = 1").as[Int].head() == 11)
    GraftSql.run(spark, "DROP TABLE cv3_t")
  }

  test("CONVERT refuses unknown TBLPROPERTIES keys — a typo'd 'partition' " +
      "would silently adopt the wrong layout") {
    val work = tmpDir("cv5")
    Seq((1, 10, "p1")).toDF("id", "amount", "part")
      .write.partitionBy("part").parquet(s"$work/src")
    val e = intercept[IllegalArgumentException](GraftSql.run(spark,
      s"""CONVERT TO GRAFT '$work/src' AS cv5_t LOCATION '$work/t'
          TBLPROPERTIES ('pk'='id', 'partions'='part')"""))
    assert(e.getMessage.contains("unknown TBLPROPERTIES"))
    assert(GraftSql.registered(spark, "cv5_t").isEmpty,
      "a refused convert must not register the table")
  }

  test("vacuum on a zero-commit table reclaims crashed-writer staging") {
    val work = tmpDir("cv6")
    val t = VersionedTable(spark, s"$work/t", Seq("id"), Seq("part"))
    // simulate a writer that crashed between stage() and commit(): a
    // staged dir under data/ that no log entry references
    val orphan = new java.io.File(s"$work/t/data/crashed_stage/part=p1")
    orphan.mkdirs()
    java.nio.file.Files.write(
      orphan.toPath.resolve("f.parquet"), Array[Byte](1, 2, 3))
    assert(t.currentVersion == 0)
    val planned = t.vacuumPlan()
    assert(planned.nonEmpty, "the orphan staging root must be planned")
    t.vacuum()
    assert(!new java.io.File(s"$work/t/data/crashed_stage").exists(),
      "vacuum must reclaim orphan staging even before any commit")
  }

  test("VACUUM DRY RUN lists exactly what a real vacuum deletes, " +
      "touching nothing") {
    val t = VersionedTable(spark, tmpDir("cv4") + "/t", Seq("id"), Seq("part"))
    t.overwrite(Seq((1, 10, "p1")).toDF("id", "amount", "part"))   // v1
    t.overwrite(Seq((2, 20, "p1")).toDF("id", "amount", "part"))   // v2
    GraftSql.register(spark, "cv4_t", t)
    val planned = GraftSql.run(spark, "VACUUM cv4_t DRY RUN")
      .as[String].collect().toSet
    assert(planned.nonEmpty, "v1's superseded dir should be reclaimable")
    assert(planned.forall(p => new java.io.File(p).exists()),
      "dry run must not delete")
    assert(t.readVersion(1).count() == 1) // history intact after dry run
    GraftSql.run(spark, "VACUUM cv4_t")
    assert(planned.forall(p => !new java.io.File(p).exists()),
      "the real vacuum must delete exactly the planned paths")
    assert(t.read.count() == 1)
    GraftSql.run(spark, "DROP TABLE cv4_t")
  }
}
