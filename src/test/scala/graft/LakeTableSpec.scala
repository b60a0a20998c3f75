package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/** Merge-path tests the reference lacks entirely (its CI stubs Delta out,
  * /root/reference/tests/functions.py:90-98): create, update, insert,
  * idempotence, partition pruning, partition-changing updates (the round-1
  * stale-partition bug), empty batches.
  */
class LakeTableSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, String, String)*): DataFrame =
    rows.toDF("id", "val", "part")

  private def contents(t: LakeTable): Set[(Int, String, String)] =
    t.read.select("id", "val", "part").as[(Int, String, String)].collect().toSet

  test("merge on absent table creates it") {
    val t = LakeTable(spark, tmpDir("lake") + "/t", Seq("id"))
    assert(!t.exists)
    t.merge(df((1, "a", "p1")))
    assert(t.exists && contents(t) == Set((1, "a", "p1")))
  }

  test("unpartitioned merge: update wins, insert lands, others survive") {
    val t = LakeTable(spark, tmpDir("lake") + "/t", Seq("id"))
    t.merge(df((1, "a", "p1"), (2, "b", "p1")))
    t.merge(df((2, "B", "p1"), (3, "c", "p2")))
    assert(contents(t) == Set((1, "a", "p1"), (2, "B", "p1"), (3, "c", "p2")))
  }

  test("merge is idempotent") {
    val t = LakeTable(spark, tmpDir("lake") + "/t", Seq("id"))
    t.merge(df((1, "a", "p1"), (2, "b", "p1")))
    val batch = df((2, "B", "p1"))
    t.merge(batch); val once = contents(t)
    t.merge(batch); assert(contents(t) == once)
  }

  test("partitioned merge updates only touched partitions") {
    val base = tmpDir("lake") + "/t"
    val t = LakeTable(spark, base, Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1"), (2, "b", "p2")))
    val untouchedFiles = Files.list(Paths.get(base, "part=p2")).toArray.toSet
    t.merge(df((1, "A", "p1"), (3, "c", "p3")))
    assert(contents(t) == Set((1, "A", "p1"), (2, "b", "p2"), (3, "c", "p3")))
    // p2 was never rewritten: same physical files
    assert(Files.list(Paths.get(base, "part=p2")).toArray.toSet == untouchedFiles)
  }

  test("partition-changing update removes the old-partition copy (movedRowsPossible)") {
    val base = tmpDir("lake") + "/t"
    val t = LakeTable(spark, base, Seq("id"), Seq("part"), movedRowsPossible = true)
    t.merge(df((1, "a", "p1"), (2, "b", "p1")))
    // move id=1 from p1 → p2; p1 keeps a survivor (id=2)
    t.merge(df((1, "A", "p2")))
    assert(contents(t) == Set((1, "A", "p2"), (2, "b", "p1")))
  }

  test("partition-changing update deletes a zero-survivor old partition dir") {
    val base = tmpDir("lake") + "/t"
    val t = LakeTable(spark, base, Seq("id"), Seq("part"), movedRowsPossible = true)
    t.merge(df((1, "a", "p1"), (2, "b", "p2")))
    // id=1 was p1's ONLY row; moving it must delete part=p1 entirely —
    // round-1 bug: the old copy survived and the PK existed twice.
    t.merge(df((1, "A", "p2")))
    assert(contents(t) == Set((1, "A", "p2"), (2, "b", "p2")))
    assert(!Files.exists(Paths.get(base, "part=p1")))
    assert(t.read.groupBy("id").count().filter(col("count") > 1).count() == 0)
  }

  test("empty update batch leaves the table unchanged") {
    val t = LakeTable(spark, tmpDir("lake") + "/t", Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1")))
    t.merge(df())
    assert(contents(t) == Set((1, "a", "p1")))
  }

  test("append accumulates (rejected-sink pattern)") {
    val t = LakeTable(spark, tmpDir("lake") + "/t", Nil, Seq("part"))
    t.append(df((1, "a", "p1")))
    t.append(df((1, "a", "p1")))
    assert(t.read.count() == 2)
  }

  test("overwrite replaces everything") {
    val t = LakeTable(spark, tmpDir("lake") + "/t", Seq("id"))
    t.merge(df((1, "a", "p1"), (2, "b", "p1")))
    t.overwrite(df((9, "z", "p9")))
    assert(contents(t) == Set((9, "z", "p9")))
  }

  test("compact merges small files, preserving contents and partitioning") {
    val base = tmpDir("lake") + "/t"
    val t = LakeTable(spark, base, Seq("id"), Seq("part"))
    // many tiny appends → many files
    (1 to 6).foreach(i => t.append(df((i, s"v$i", s"p${i % 2}"))))
    val before = contents(t)
    def nFiles = Files.walk(Paths.get(base)).toArray
      .map(_.toString).count(_.endsWith(".parquet"))
    val filesBefore = nFiles
    t.compact()
    assert(contents(t) == before)
    assert(nFiles < filesBefore)
    assert(Files.exists(Paths.get(base, "part=p0")))
  }

  test("optimized write: each partition dir holds ONE file regardless of " +
      "upstream parallelism — not one per (task x dir)") {
    val t = LakeTable(spark, tmpDir("lakeow") + "/t", Seq("id"), Seq("part"))
    // 3 partition values spread across 16 upstream partitions: a raw
    // partitionBy would write up to 16 files per dir (round-13 profiling:
    // ~150 ms parquet-writer init per file made a 2.4k-row write 20 s)
    val batch = spark.range(300)
      .select(col("id").cast("int").as("id"),
        concat(lit("v"), col("id")).as("val"),
        concat(lit("p"), col("id") % 3).as("part"))
      .repartition(16)
    t.merge(batch)
    import scala.jdk.CollectionConverters._
    for (p <- Seq("p0", "p1", "p2")) {
      val files = Files.list(Paths.get(t.path, s"part=$p")).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSeq
      assert(files.size == 1, s"part=$p wrote ${files.size} files")
    }
    assert(t.read.count() == 300)
  }

  test("vacuum removes orphaned staging/old dirs only") {
    val base = tmpDir("lake") + "/t"
    val t = LakeTable(spark, base, Seq("id"))
    t.merge(df((1, "a", "p1")))
    Files.createDirectories(Paths.get(base + ".__staging_dead"))
    Files.createDirectories(Paths.get(base + ".__old_dead"))
    t.vacuum()
    assert(!Files.exists(Paths.get(base + ".__staging_dead")))
    assert(!Files.exists(Paths.get(base + ".__old_dead")))
    assert(contents(t) == Set((1, "a", "p1")))
  }

  test("merge evolves schema: new column null-filled for untouched rows") {
    import spark.implicits._
    val base = tmpDir("lake") + "/t"
    val t = LakeTable(spark, base, Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1"), (2, "b", "p2")))
    val evolvedBatch = Seq((2, "B", "p2", "extra2"), (3, "c", "p3", "extra3"))
      .toDF("id", "val", "part", "note")
    t.merge(evolvedBatch)
    val out = t.read.select("id", "val", "part", "note")
      .as[(Int, String, String, Option[String])].collect().toSet
    assert(out == Set(
      (1, "a", "p1", None), // untouched partition, old footer → null note
      (2, "B", "p2", Some("extra2")),
      (3, "c", "p3", Some("extra3"))))
  }

  test("merge without PK columns is rejected (would cross-join)") {
    val t = LakeTable(spark, tmpDir("lake") + "/t", Nil)
    t.append(df((1, "a", "p1")))
    intercept[IllegalArgumentException] { t.merge(df((2, "b", "p1"))) }
  }

  test("concurrent second writer is rejected, not interleaved") {
    val base = tmpDir("lake") + "/t"
    val t = LakeTable(spark, base, Seq("id"), Seq("part"))
    t.merge(df((1, "a", "p1")))
    // simulate a merge in flight elsewhere: its commit lock exists
    Files.createFile(Paths.get(base + ".__lock"))
    val e = intercept[RuntimeException] { t.merge(df((2, "b", "p1"))) }
    assert(e.getMessage.contains("concurrent writer"))
    assert(contents(t) == Set((1, "a", "p1"))) // untouched by the reject
    intercept[RuntimeException] { t.compact() } // compact is fenced too
    t.vacuum() // crashed-writer recovery clears the stale lock
    t.merge(df((2, "b", "p1")))
    assert(contents(t) == Set((1, "a", "p1"), (2, "b", "p1")))
  }

  test("lock is released after a successful merge and after a failed one") {
    val base = tmpDir("lake") + "/t"
    val t = LakeTable(spark, base, Seq("id"))
    t.merge(df((1, "a", "p1")))
    assert(!Files.exists(Paths.get(base + ".__lock")))
    // a merge that throws mid-commit (write-time task failure) must still
    // release the lock
    val boom = udf(() => { if (true) throw new RuntimeException("boom"); 1 })
    intercept[Exception] { t.merge(df((2, "b", "p1")).withColumn("x", boom())) }
    assert(!Files.exists(Paths.get(base + ".__lock")))
  }
}
