package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.lake.{GraftSql, VersionedTable}

/** SQL DML dispatch onto the versioned table: UPDATE/DELETE/MERGE INTO
  * parsed by Spark's parser, honored by the table API, refused when the
  * statement's semantics aren't exactly what merge/update/delete implement.
  */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Int, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  private def contents(t: VersionedTable): Set[(Int, Int, String)] =
    t.read.select("id", "amount", "part").as[(Int, Int, String)].collect().toSet

  test("UPDATE, DELETE and MERGE INTO run from SQL text and version the table") {
    val t = VersionedTable(spark, tmpDir("gsql") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "p1"), (2, 20, "p1"), (3, 30, "p2")))        // v1
    GraftSql.register(spark, "gsql_t", t)

    val r1 = GraftSql.run(spark, "UPDATE gsql_t SET amount = amount + 5 WHERE part = 'p1'")
    assert(r1.as[(String, String, Long)].head() == ("update", "gsql_t", 2L))
    assert(contents(t) == Set((1, 15, "p1"), (2, 25, "p1"), (3, 30, "p2")))

    GraftSql.run(spark, "DELETE FROM gsql_t WHERE id = 2")               // v3
    assert(contents(t) == Set((1, 15, "p1"), (3, 30, "p2")))

    Seq((3, 99, "p2"), (4, 40, "p3")).toDF("id", "amount", "part")
      .createOrReplaceTempView("gsql_src")
    val r3 = GraftSql.run(spark,
      """MERGE INTO gsql_t USING gsql_src ON gsql_t.id = gsql_src.id
         WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(r3.as[(String, String, Long)].head() == ("merge", "gsql_t", 4L))
    assert(contents(t) == Set((1, 15, "p1"), (3, 99, "p2"), (4, 40, "p3")))

    // the registered view tracks the mutations — reads mix in via run()
    val n = GraftSql.run(spark, "SELECT count(*) AS n FROM gsql_t").as[Long].head()
    assert(n == 3L)
    // full history retained
    assert(t.history.map(_._2) == Seq("overwrite", "update", "delete", "merge"))
    assert(contents(t.copy()) == contents(t)) // replays cleanly
    assert(t.readVersion(1).count() == 3)
  }

  test("MERGE shapes the table API cannot honor are refused, not approximated") {
    val t = VersionedTable(spark, tmpDir("gsql2") + "/t", Seq("id"))
    t.overwrite(df((1, 10, "p1")))
    GraftSql.register(spark, "gsql2_t", t)
    Seq((1, 11, "p1")).toDF("id", "amount", "part")
      .createOrReplaceTempView("gsql2_src")
    // conditional matched clause
    val e1 = intercept[IllegalArgumentException](GraftSql.run(spark,
      """MERGE INTO gsql2_t USING gsql2_src ON gsql2_t.id = gsql2_src.id
         WHEN MATCHED AND gsql2_src.amount > 100 THEN UPDATE SET *
         WHEN NOT MATCHED THEN INSERT *"""))
    assert(e1.getMessage.contains("UPDATE SET *"))
    // ON condition not covering the primary key
    val e2 = intercept[IllegalArgumentException](GraftSql.run(spark,
      """MERGE INTO gsql2_t USING gsql2_src ON gsql2_t.amount = gsql2_src.amount
         WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""))
    assert(e2.getMessage.contains("primary-key"))
    assert(t.currentVersion == 1) // nothing committed
  }

  test("statements not targeting a registered table pass through to spark.sql") {
    val out = GraftSql.run(spark, "SELECT 1 + 1 AS two")
    assert(out.as[Int].head() == 2)
    // DML on an unregistered relation falls through to Spark's own
    // handling (which refuses it for a temp view) — never silently no-ops
    Seq((1, 1)).toDF("a", "b").createOrReplaceTempView("gsql_plain")
    intercept[Exception](
      GraftSql.run(spark, "DELETE FROM gsql_plain WHERE a = 1").collect())
  }
}
