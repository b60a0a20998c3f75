package graft

import org.apache.spark.sql.functions._

import graft.lake.{ConstraintViolationException, GraftSql, VersionedTable}

/** CREATE-time generated columns (Delta's `GENERATED ALWAYS AS (expr)`
  * column spec): declared before any commit exists, buffered on the
  * handle, derived from the VERY FIRST batch (the auto-partition-key
  * case), and flushed as `gencol=` lines riding the first commit so a
  * fresh handle replays the same definitions.
  */
class CreateTimeGeneratedSpec extends SparkSpec {
  import spark.implicits._

  test("declareGenerated before the first commit: the first batch derives, " +
      "the definition rides the first commit, fresh handles replay it") {
    val t = VersionedTable(spark, tmpDir("ctg1") + "/t", Seq("id"), Seq("yr"))
    t.declareGenerated(Map("yr" ->
      "substring(cast(d as string), 1, 4)"))
    // first batch OMITS the generated partition key — it must derive
    t.merge(Seq((1, "2024-03-01"), (2, "2025-07-09")).toDF("id", "d")
      .select(col("id"), col("d").cast("date").as("d")))
    assert(t.read.select("yr").as[String].collect().toSet == Set("2024", "2025"))
    assert(t.read.columns.contains("yr"))
    val t2 = t.copy()
    assert(t2.generatedCols.keySet == Set("yr"), "gencol line must replay")
    // later batch supplying a WRONG value is refused (verified, not trusted)
    intercept[ConstraintViolationException] {
      t2.merge(Seq((3, "2026-01-01", "1999")).toDF("id", "d", "yr")
        .select(col("id"), col("d").cast("date").as("d"), col("yr")))
    }
  }

  test("SQL: CREATE TABLE with GENERATED ALWAYS AS column, first INSERT " +
      "derives the partition key, SHOW CREATE TABLE round-trips") {
    val loc = tmpDir("ctg2") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE ctg_t (
         |  id BIGINT, d DATE,
         |  yr STRING GENERATED ALWAYS AS (substring(cast(d as string), 1, 4)))
         |USING graft PARTITIONED BY (yr)
         |LOCATION '$loc' TBLPROPERTIES ('pk' = 'id')""".stripMargin)
    GraftSql.run(spark,
      "INSERT INTO ctg_t VALUES (1, DATE'2023-05-01'), (2, DATE'2024-11-11')")
    val got = GraftSql.run(spark, "SELECT id, yr FROM ctg_t ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "2023"), (2L, "2024")))
    // physically partitioned by the derived key from the first commit
    val parts = new java.io.File(s"$loc/data").listFiles
      .filter(_.isDirectory).flatMap(_.listFiles).map(_.getName)
      .filter(_.startsWith("yr="))
    assert(parts.toSet == Set("yr=2023", "yr=2024"))
    val stmt = GraftSql.run(spark, "SHOW CREATE TABLE ctg_t").as[String].head()
    assert(stmt.contains("GENERATED ALWAYS AS (substring(cast(d as string), 1, 4))"))
    GraftSql.run(spark, "DROP TABLE ctg_t")
  }
}
