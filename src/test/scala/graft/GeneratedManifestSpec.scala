package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr}

import graft.lake.{ConstraintViolationException, VersionedTable}

/** Generated-column derivation/verification on the write path, and
  * manifest export for external engines.
  */
class GeneratedManifestSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int)*): DataFrame =
    rows.toDF("id", "amount")

  test("omitted generated columns are derived; supplied ones are verified") {
    val t = VersionedTable(spark, tmpDir("gc") + "/t", Seq("id"), Seq("bucket"))
    t.overwrite(df((1, 5), (2, 17)).withColumn("bucket", expr("amount div 10")))
    t.addGeneratedColumn("bucket", "amount div 10")
    // batch WITHOUT the generated (partition!) column: derived on write.
    // `div` yields BIGINT, and the read honors the RECORDED schema — the
    // partition column comes back as the committed LONG, not the
    // narrower type partition-path inference would guess
    t.merge(df((3, 25)))
    val got = t.read.select("id", "amount", "bucket")
      .as[(Int, Int, Long)].collect().toSet
    assert(got == Set((1, 5, 0L), (2, 17, 1L), (3, 25, 2L)))
    // batch WITH a wrong value for it: refused
    val e = intercept[ConstraintViolationException](
      t.merge(df((4, 35)).withColumn("bucket", expr("99"))))
    assert(e.name == "generated:bucket")
    // batch with the CORRECT value passes verification
    t.merge(df((4, 35)).withColumn("bucket", expr("3")))
    assert(t.read.count() == 4)
  }

  test("addGeneratedColumn verifies existing rows and persists across reopen") {
    val path = tmpDir("gc") + "/t"
    val t = VersionedTable(spark, path, Seq("id"))
    t.overwrite(df((1, 5)).withColumn("bucket", expr("42")))
    intercept[ConstraintViolationException](
      t.addGeneratedColumn("bucket", "amount div 10"))
    t.overwrite(df((1, 5)).withColumn("bucket", expr("amount div 10")))
    t.addGeneratedColumn("bucket", "amount div 10")
    val reopened = VersionedTable(spark, path, Seq("id"))
    assert(reopened.generatedCols == Map("bucket" -> "amount div 10"))
    reopened.overwrite(df((9, 99))) // derived through the reopened instance
    assert(reopened.read.select(col("bucket").cast("long")).as[Long]
      .collect().toSeq == Seq(9L))
  }

  test("update re-derives generated columns from updated sources; direct assignment refused") {
    val t = VersionedTable(spark, tmpDir("gc") + "/t", Seq("id"))
    t.overwrite(df((1, 5), (2, 17)).withColumn("bucket", expr("amount div 10")))
    t.addGeneratedColumn("bucket", "amount div 10")
    // updating the SOURCE column must re-derive the generated value
    t.update(col("id") === 1, Map("amount" -> expr("95")))
    val got = t.read.select(col("id"), col("amount"), col("bucket").cast("long"))
      .as[(Int, Int, Long)].collect().toSet
    assert(got == Set((1, 95, 9L), (2, 17, 1L)))
    // assigning the generated column directly is refused
    val e = intercept[IllegalArgumentException](
      t.update(col("id") === 2, Map("bucket" -> expr("99"))))
    assert(e.getMessage.contains("generated"))
  }

  test("constraints and generated columns tolerate batches omitting columns") {
    val t = VersionedTable(spark, tmpDir("gc") + "/t", Seq("id"))
    t.overwrite(df((1, 5)).withColumn("note", expr("'x'")))
    t.addConstraint("note_len", "length(note) < 10")
    // a narrower batch (no note column) stores NULL there; NULL passes CHECK
    t.merge(df((2, 7)))
    assert(t.read.count() == 2)
    // clone carries generated columns
    val t2 = VersionedTable(spark, tmpDir("gc") + "/t2", Seq("id"))
    t2.overwrite(df((1, 5)).withColumn("bucket", expr("amount div 10")))
    t2.addGeneratedColumn("bucket", "amount div 10")
    val c = t2.cloneTo(tmpDir("gc") + "/t2clone")
    assert(c.generatedCols == Map("bucket" -> "amount div 10"))
    c.merge(df((3, 25))) // derived on the clone too
    assert(c.read.filter(col("id") === 3).select(col("bucket").cast("long"))
      .as[Long].head() == 2L)
  }

  test("update refuses source assignments that would move a generated partition column") {
    val t = VersionedTable(spark, tmpDir("gc") + "/t", Seq("id"), Seq("bucket"))
    t.overwrite(df((1, 5), (2, 17)).withColumn("bucket", expr("amount div 10")))
    t.addGeneratedColumn("bucket", "amount div 10")
    // amount 5 → 95 would re-derive bucket 0 → 9: a partition move
    val e = intercept[IllegalArgumentException](
      t.update(col("id") === 1, Map("amount" -> expr("95"))))
    assert(e.getMessage.contains("generated partition column"))
    // a partition-stable source change (5 → 7, both bucket 0) is fine
    t.update(col("id") === 1, Map("amount" -> expr("7")))
    assert(t.read.filter(col("id") === 1)
      .select(col("amount"), col("bucket").cast("long"))
      .as[(Int, Long)].head() == ((7, 0L)))
  }

  test("constraint checks resolve batch columns case-insensitively") {
    val t = VersionedTable(spark, tmpDir("gc") + "/t", Seq("id"))
    t.overwrite(df((1, 5)).withColumn("note", expr("'x'")))
    t.addConstraint("note_len", "length(note) < 5")
    // the violating batch supplies the column as NOTE — the check must
    // still see the real values, not a null-filled shadow column
    val bad = df((2, 7)).withColumn("NOTE", expr("'waytoolongvalue'"))
    intercept[graft.lake.ConstraintViolationException](t.merge(bad))
    assert(t.read.count() == 1)
  }

  test("manifest lists exactly the live files and reads back the snapshot") {
    val t = VersionedTable(spark, tmpDir("mf") + "/t", Seq("id"))
    t.overwrite(df((1, 5), (2, 7)))
    t.merge(df((2, 70), (3, 9)))
    val m = t.writeManifest()
    val src = scala.io.Source.fromFile(m.stripPrefix("file:"))
    val files = try src.getLines().toList finally src.close()
    assert(files.nonEmpty && files.forall(_.endsWith(".parquet")))
    val viaManifest = spark.read.parquet(files: _*)
      .select("id", "amount").as[(Int, Int)].collect().toSet
    assert(viaManifest == Set((1, 5), (2, 70), (3, 9)))
  }

  test("manifest export is refused while deletion vectors are live") {
    val t = VersionedTable(spark, tmpDir("mf") + "/t", Seq("id"))
    t.overwrite(df((1, 5), (2, 7)))
    t.deleteMor(col("id") === 1)
    val e = intercept[RuntimeException](t.writeManifest())
    assert(e.getMessage.contains("deletion vectors"))
    t.compact() // materializes the delete
    val m = t.writeManifest()
    val src = scala.io.Source.fromFile(m.stripPrefix("file:"))
    val files = try src.getLines().toList finally src.close()
    val viaManifest = spark.read.parquet(files: _*)
      .select("id", "amount").as[(Int, Int)].collect().toSet
    assert(viaManifest == Set((2, 7)))
  }

  test("a batch supplying a generated column under different casing is verified") {
    val t = VersionedTable(spark, tmpDir("gc") + "/t", Seq("id"))
    t.overwrite(df((1, 5)).withColumn("bucket", expr("amount div 10")))
    t.addGeneratedColumn("bucket", "amount div 10")
    // wrong value under different casing: must be VERIFIED (and refused),
    // not silently treated as omitted and overwritten with the derivation
    val e = intercept[ConstraintViolationException](
      t.merge(df((2, 17)).withColumn("BUCKET", expr("99"))))
    assert(e.name == "generated:bucket")
    // the correct value under the same casing lands
    t.merge(df((2, 17)).withColumn("BUCKET", expr("1")))
    assert(t.read.select(col("id"), col("amount"), col("bucket").cast("int"))
      .as[(Int, Int, Int)].collect().toSet == Set((1, 5, 0), (2, 17, 1)))
  }

  test("restore drops generated-column definitions added after the target version") {
    val t = VersionedTable(spark, tmpDir("gc") + "/t", Seq("id"))
    t.overwrite(df((1, 5)).withColumn("bucket", expr("amount div 10")))
    val v = t.currentVersion
    t.addGeneratedColumn("bucket", "amount div 10")
    t.restore(v)
    assert(t.generatedCols.isEmpty)
    // no rule in force any more: an off-derivation value is accepted
    t.merge(df((2, 17)).withColumn("bucket", expr("99")))
    assert(t.read.count() == 2)
    val reopened = VersionedTable(spark, t.path, Seq("id"))
    assert(reopened.generatedCols.isEmpty)
  }
}
