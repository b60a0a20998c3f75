package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.lake.{ConstraintViolationException, GraftSql, VersionedTable}

/** ALTER COLUMN … SET NOT NULL / DROP NOT NULL (Delta's nullability
  * constraints): SET verifies existing rows and every later batch in the
  * single constraint aggregate pass; DROP is one metadata commit; the
  * state follows renames, retires with drops, and respects defaults
  * (an omitted NOT NULL column with a declared DEFAULT passes).
  */
class NotNullSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, Integer, String)*): DataFrame =
    rows.toDF("id", "amount", "part")

  test("SET NOT NULL verifies existing rows, then refuses later NULL " +
      "batches (explicit and omitted); DROP NOT NULL re-allows them") {
    val t = VersionedTable(spark, tmpDir("nn1") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, 10, "a"), (2, null, "b")))
    GraftSql.register(spark, "nn1_t", t)
    // existing NULL → refused
    val e0 = intercept[ConstraintViolationException](
      GraftSql.run(spark, "ALTER TABLE nn1_t ALTER COLUMN amount SET NOT NULL"))
    assert(e0.name == "notnull:amount")
    t.update(col("id") === 2, Map("amount" ->
      org.apache.spark.sql.functions.lit(20)))
    GraftSql.run(spark, "ALTER TABLE nn1_t ALTER COLUMN amount SET NOT NULL")
    assert(t.notNullCols == Set("amount"))
    // a batch carrying NULL is refused; one OMITTING the column widens to
    // NULL and is refused too
    val e1 = intercept[ConstraintViolationException](
      t.merge(df((3, null, "a"))))
    assert(e1.name == "notnull:amount")
    val e2 = intercept[ConstraintViolationException](
      t.merge(Seq((4, "a")).toDF("id", "part")))
    assert(e2.name == "notnull:amount")
    // UPDATE assigning NULL into the constrained column refuses too
    val e3 = intercept[ConstraintViolationException](
      t.update(col("id") === 1, Map("amount" ->
        org.apache.spark.sql.functions.lit(null).cast("int"))))
    assert(e3.name == "notnull:amount")
    t.merge(df((5, 50, "a"))) // a clean batch lands
    GraftSql.run(spark, "ALTER TABLE nn1_t ALTER COLUMN amount DROP NOT NULL")
    assert(t.notNullCols.isEmpty)
    t.merge(df((6, null, "b"))) // nullable again
    assert(t.read.filter(col("id") === 6).select("amount")
      .collect().head.isNullAt(0))
    GraftSql.run(spark, "DROP TABLE nn1_t")
  }

  test("a declared DEFAULT satisfies NOT NULL for omitted columns; the " +
      "constraint follows RENAME and retires with DROP COLUMN") {
    val t = VersionedTable(spark, tmpDir("nn2") + "/t", Seq("id"))
    t.overwrite(Seq((1, 10)).toDF("id", "amount"))
    GraftSql.register(spark, "nn2_t", t)
    GraftSql.run(spark, "ALTER TABLE nn2_t ALTER COLUMN amount SET NOT NULL")
    GraftSql.run(spark, "ALTER TABLE nn2_t ALTER COLUMN amount SET DEFAULT 7")
    // the INSERT path default-fills omitted columns BEFORE the constraint
    // pass (merge replaces rows wholesale and never default-fills)
    GraftSql.run(spark, "INSERT INTO nn2_t (id) VALUES (2)")
    assert(t.read.count() == 2)
    assert(t.read.filter(col("id") === 2).select("amount")
      .as[Int].head() == 7)
    GraftSql.run(spark, "ALTER TABLE nn2_t RENAME COLUMN amount TO gross")
    assert(t.notNullCols == Set("gross"), "constraint must follow the rename")
    GraftSql.run(spark, "ALTER TABLE nn2_t DROP COLUMN gross")
    assert(t.notNullCols.isEmpty, "constraint must retire with the drop")
    GraftSql.run(spark, "DROP TABLE nn2_t")
  }

  test("CREATE-time NOT NULL buffers pre-first-commit, the FIRST batch " +
      "already verifies, and attach verifies the declaration") {
    val loc = tmpDir("nn4") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE nn4_t (k BIGINT, amount INT NOT NULL)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    val t = GraftSql.registered(spark, "nn4_t").get
    assert(t.notNullCols == Set("amount"), "declaration must buffer")
    // the very first batch is already under the constraint
    val e = intercept[ConstraintViolationException](
      GraftSql.run(spark, "INSERT INTO nn4_t (k) VALUES (1)"))
    assert(e.name == "notnull:amount")
    GraftSql.run(spark, "INSERT INTO nn4_t VALUES (1, 10)") // v1, flushes
    assert(t.notNullCols == Set("amount"), "declaration must have committed")
    // re-attach with the matching declaration verifies; a bare column
    // list missing the constraint refuses
    GraftSql.unregister(spark, "nn4_t")
    GraftSql.run(spark,
      s"""CREATE TABLE nn4_t (k BIGINT, amount INT NOT NULL)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    assert(GraftSql.registered(spark, "nn4_t").get.notNullCols == Set("amount"))
    // SHOW CREATE TABLE round-trips the clause
    val stmt = GraftSql.run(spark, "SHOW CREATE TABLE nn4_t")
      .collect().head.getString(0)
    assert(stmt.contains("amount INT NOT NULL"), stmt)
    GraftSql.run(spark, "DROP TABLE nn4_t")
  }

  test("REPLACE TABLE supersedes NOT NULL like defaults: re-declared " +
      "NOT NULL survives, re-declared nullable retires, CTAS retires all " +
      "and its batch lands under the post-replace rule set") {
    val loc = tmpDir("nn5") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE nn5_t (k BIGINT, a INT NOT NULL, b INT NOT NULL)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO nn5_t VALUES (1, 10, 20)")
    val t = GraftSql.registered(spark, "nn5_t").get
    assert(t.notNullCols == Set("a", "b"))
    // a keeps its clause, b is re-declared nullable, c arrives NOT NULL
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE nn5_t (k BIGINT, a INT NOT NULL, b INT,
         |  c INT NOT NULL)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    assert(t.notNullCols == Set("a", "c"),
      s"declared map must supersede, got ${t.notNullCols}")
    GraftSql.run(spark, "INSERT INTO nn5_t (k, a, c) VALUES (2, 1, 3)") // b null ok
    val e = intercept[ConstraintViolationException](
      GraftSql.run(spark, "INSERT INTO nn5_t (k, a) VALUES (3, 1)"))
    assert(e.name == "notnull:c")
    // CTAS cannot declare columns → every constraint retires, and the
    // query's own NULLs in a formerly-NOT NULL column land (the retire
    // rides the same atomic commit the batch does)
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE nn5_t
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')
         |AS SELECT CAST(9 AS BIGINT) AS k, CAST(NULL AS INT) AS a""".stripMargin)
    assert(t.notNullCols.isEmpty, s"CTAS must retire all, got ${t.notNullCols}")
    assert(GraftSql.run(spark, "SELECT a FROM nn5_t").collect().head.isNullAt(0))
    GraftSql.run(spark, "DROP TABLE nn5_t")
  }

  test("DROP NOT NULL refuses primary-key columns and absent constraints; " +
      "the state is engine metadata, not a user property") {
    val t = VersionedTable(spark, tmpDir("nn3") + "/t", Seq("id"))
    t.overwrite(Seq((1, 10)).toDF("id", "amount"))
    GraftSql.register(spark, "nn3_t", t)
    val e = intercept[IllegalArgumentException](
      GraftSql.run(spark, "ALTER TABLE nn3_t ALTER COLUMN id DROP NOT NULL"))
    assert(e.getMessage.contains("structural"))
    val e2 = intercept[IllegalArgumentException](
      GraftSql.run(spark, "ALTER TABLE nn3_t ALTER COLUMN amount DROP NOT NULL"))
    assert(e2.getMessage.contains("no NOT NULL"))
    // SET NOT NULL on a pk mirrors the DROP refusal — accepting it would
    // record a graft.notnull.col.id property that could never be dropped
    val e3 = intercept[IllegalArgumentException](
      GraftSql.run(spark, "ALTER TABLE nn3_t ALTER COLUMN id SET NOT NULL"))
    assert(e3.getMessage.contains("structural"))
    GraftSql.run(spark, "ALTER TABLE nn3_t ALTER COLUMN amount SET NOT NULL")
    assert(t.properties.isEmpty, "NOT NULL state never leaks into " +
      "user TBLPROPERTIES")
    GraftSql.run(spark, "DROP TABLE nn3_t")
  }
}
