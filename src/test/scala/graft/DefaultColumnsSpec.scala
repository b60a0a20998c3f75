package graft

import org.apache.spark.sql.functions._

import graft.lake.{GraftSql, VersionedTable}

/** Column DEFAULT values (Delta's allowColumnDefaults): insert-shaped
  * writes that OMIT a defaulted column fill it with the expression, not
  * NULL; merge is excluded (its batch replaces matched rows wholesale).
  */
class DefaultColumnsSpec extends SparkSpec {
  import spark.implicits._

  test("append/overwrite fill omitted defaulted columns; supplied values " +
      "win; the declaration rides the first commit and replays") {
    val t = VersionedTable(spark, tmpDir("def1") + "/t", Seq("id"))
    t.declareDefaults(Map(
      "status" -> (("string", "'pending'")),
      "retries" -> (("int", "0"))))
    t.append(Seq((1, 10.0), (2, 20.0)).toDF("id", "amount"))      // omitted
    val got = t.read.select("id", "status", "retries")
      .as[(Int, String, Int)].collect().toSet
    assert(got == Set((1, "pending", 0), (2, "pending", 0)))
    // supplied values are untouched
    t.append(Seq((3, 30.0, "done", 5)).toDF("id", "amount", "status", "retries"))
    assert(t.read.filter(col("id") === 3).select("status", "retries")
      .as[(String, Int)].head() == (("done", 5)))
    val t2 = t.copy()
    assert(t2.columnDefaults.keySet == Set("status", "retries"),
      "default declarations must replay from the log")
    t2.append(Seq((4, 40.0)).toDF("id", "amount"))
    assert(t2.read.filter(col("id") === 4).select("status").as[String]
      .head() == "pending")
  }

  test("SQL: CREATE TABLE … DEFAULT, INSERT with explicit column list " +
      "omitting the column fills it; SHOW CREATE TABLE round-trips") {
    val loc = tmpDir("def2") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE def_t (
         |  id BIGINT, amount DOUBLE,
         |  status STRING DEFAULT 'new',
         |  created DATE DEFAULT DATE'2026-01-01')
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk' = 'id')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO def_t (id, amount) VALUES (1, 5.5)")
    val r = GraftSql.run(spark,
      "SELECT status, CAST(created AS STRING) AS c FROM def_t WHERE id = 1")
      .as[(String, String)].head()
    assert(r == (("new", "2026-01-01")))
    // positional insert binds every column — explicit values win
    GraftSql.run(spark,
      "INSERT INTO def_t VALUES (2, 6.6, 'old', DATE'2020-02-02')")
    assert(GraftSql.run(spark, "SELECT status FROM def_t WHERE id = 2")
      .as[String].head() == "old")
    val stmt = GraftSql.run(spark, "SHOW CREATE TABLE def_t").as[String].head()
    assert(stmt.contains("DEFAULT 'new'"))
    assert(stmt.contains("DEFAULT DATE'2026-01-01'"))
    GraftSql.run(spark, "DROP TABLE def_t")
  }

  test("ALTER TABLE ADD COLUMN … DEFAULT: existing rows read the frozen " +
      "default, future inserts fill, time travel stays era-correct") {
    val t = VersionedTable(spark, tmpDir("def4") + "/t", Seq("id"))
    t.append(Seq((1, 10.0), (2, 20.0)).toDF("id", "amount"))      // v1
    GraftSql.register(spark, "def_add_t", t)
    GraftSql.run(spark,
      "ALTER TABLE def_add_t ADD COLUMN tier STRING DEFAULT 'bronze'")
    // rows written BEFORE the column read the default, not NULL
    assert(t.read.select("tier").as[String].collect().toSet == Set("bronze"))
    // future inserts omitting it fill; supplying it wins
    GraftSql.run(spark, "INSERT INTO def_add_t (id, amount) VALUES (3, 30.0)")
    GraftSql.run(spark,
      "INSERT INTO def_add_t VALUES (4, 40.0, 'gold')")
    val got = t.read.select("id", "tier").as[(Int, String)].collect().toMap
    assert(got == Map(1 -> "bronze", 2 -> "bronze", 3 -> "bronze", 4 -> "gold"))
    // era-correct: version 1 never shows the column
    assert(!t.readVersion(1).columns.contains("tier"))
    // the frozen default survives a rename (declarations move with it)
    t.renameColumn("tier", "level")
    val t2 = t.copy()
    assert(t2.read.filter(col("id") === 1).select("level").as[String]
      .head() == "bronze")
    // dropping the column retires its declarations
    t2.dropColumn("level")
    assert(t2.columnDefaults.isEmpty)
    GraftSql.unregister(spark, "def_add_t")
  }

  test("ADD COLUMN DEFAULT freezes non-deterministic expressions at ALTER " +
      "time; SET/DROP DEFAULT change only future inserts") {
    val t = VersionedTable(spark, tmpDir("def5") + "/t", Seq("id"))
    t.append(Seq((1, 1.0)).toDF("id", "amount"))
    GraftSql.register(spark, "def_sd_t", t)
    GraftSql.run(spark,
      "ALTER TABLE def_sd_t ADD COLUMN seen DATE DEFAULT current_date()")
    val frozen = t.read.select(col("seen").cast("string")).as[String].head()
    assert(frozen != null && frozen.matches("""\d{4}-\d{2}-\d{2}"""))
    // SET DEFAULT on an ordinary column affects only future inserts
    GraftSql.run(spark,
      "ALTER TABLE def_sd_t ALTER COLUMN amount SET DEFAULT 99.0")
    GraftSql.run(spark, "INSERT INTO def_sd_t (id) VALUES (2)")
    assert(t.read.filter(col("id") === 2).select("amount").as[Double]
      .head() == 99.0)
    assert(t.read.filter(col("id") === 1).select("amount").as[Double]
      .head() == 1.0, "SET DEFAULT must not rewrite existing rows")
    GraftSql.run(spark,
      "ALTER TABLE def_sd_t ALTER COLUMN amount DROP DEFAULT")
    GraftSql.run(spark, "INSERT INTO def_sd_t (id) VALUES (3)")
    assert(t.read.filter(col("id") === 3).select("amount").as[java.lang.Double]
      .collect().head == null, "after DROP DEFAULT omitted columns null-fill")
    // the exists-default from ADD COLUMN keeps governing pre-add files
    assert(t.read.filter(col("id") === 1)
      .select(col("seen").cast("string")).as[String].head() == frozen)
    GraftSql.unregister(spark, "def_sd_t")
  }

  test("REPLACE TABLE retires defaults on dropped columns (no silent " +
      "re-injection) and installs the replace's own DEFAULT clauses") {
    val loc = tmpDir("def6") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE def_rep_t (
         |  k BIGINT, status STRING DEFAULT 'unreviewed')
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO def_rep_t (k) VALUES (1)")
    // replace DROPS status: its default must retire, not re-inject the
    // column onto the replacement's batches
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE def_rep_t (k BIGINT, amount DOUBLE DEFAULT 7.5)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    val t = GraftSql.registered(spark, "def_rep_t").get
    assert(t.columnDefaults.keySet == Set("amount"),
      s"expected only the replace's default, got ${t.columnDefaults.keySet}")
    GraftSql.run(spark, "INSERT INTO def_rep_t (k) VALUES (2)")
    val row = GraftSql.run(spark,
      "SELECT * FROM def_rep_t WHERE k = 2").collect().head
    assert(row.schema.fieldNames.toSeq == Seq("k", "amount"),
      "the dropped defaulted column must not reappear")
    assert(row.getDouble(1) == 7.5)
    GraftSql.run(spark, "DROP TABLE def_rep_t")
  }

  test("REPLACE TABLE retires the default of a column RE-DECLARED without " +
      "one — the declared map supersedes, so post-replace inserts null-fill") {
    val loc = tmpDir("def6b") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE def_rep2_t (
         |  k BIGINT, status STRING DEFAULT 'unreviewed')
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO def_rep2_t (k) VALUES (1)")
    // the replace keeps the COLUMN but drops its DEFAULT clause: the old
    // committed default must retire with it, not silently keep filling
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE def_rep2_t (k BIGINT, status STRING)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    val t = GraftSql.registered(spark, "def_rep2_t").get
    assert(t.columnDefaults.isEmpty,
      s"default-less re-declaration must retire the default, got ${t.columnDefaults}")
    GraftSql.run(spark, "INSERT INTO def_rep2_t (k) VALUES (2)")
    assert(GraftSql.run(spark, "SELECT status FROM def_rep2_t WHERE k = 2")
      .collect().head.isNullAt(0),
      "post-replace omitted column must null-fill, not fill the retired default")
    GraftSql.run(spark, "DROP TABLE def_rep2_t")
  }

  test("REPLACE TABLE retires every exists-default — a replace writes " +
      "all-new files, so no file predates any column") {
    val loc = tmpDir("def6c") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE def_rep3_t (k BIGINT, amount DOUBLE)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO def_rep3_t VALUES (1, 1.0)")
    // ADD COLUMN … DEFAULT records an exists-default for pre-add files
    GraftSql.run(spark,
      "ALTER TABLE def_rep3_t ADD COLUMN tag STRING DEFAULT 'old'")
    val before = GraftSql.registered(spark, "def_rep3_t").get
    assert(before.existsDefaults.keySet == Set("tag"))
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE def_rep3_t (k BIGINT, tag STRING)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    val after = GraftSql.registered(spark, "def_rep3_t").get
    assert(after.existsDefaults.isEmpty,
      s"exists-defaults must all retire on replace, got ${after.existsDefaults}")
    GraftSql.run(spark, "DROP TABLE def_rep3_t")
  }

  test("a TIMESTAMP exists-default freezes to an instant, not a rendered " +
      "string — reading under another session time zone sees the same " +
      "instant") {
    val t = VersionedTable(spark, tmpDir("def7") + "/t", Seq("id"))
    t.append(Seq((1, 1.0)).toDF("id", "amount"))
    GraftSql.register(spark, "def_tz_t", t)
    GraftSql.run(spark, "ALTER TABLE def_tz_t ADD COLUMN seen TIMESTAMP " +
      "DEFAULT TIMESTAMP'2026-01-02 03:04:05'")
    def micros(): Long = t.read.select(unix_micros(col("seen"))).as[Long].head()
    val utc = micros()
    val zone = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
      assert(micros() == utc,
        "the frozen instant must not shift with the reader's session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", zone)
    GraftSql.unregister(spark, "def_tz_t")
  }

  test("the DEFAULT keyword inside VALUES substitutes the declared " +
      "default (or NULL without one); identity columns refuse it") {
    val loc = tmpDir("def8") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE def_kw_t (
         |  id BIGINT, amount DOUBLE, status STRING DEFAULT 'fresh')
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='id')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO def_kw_t VALUES (1, 2.5, DEFAULT)")
    GraftSql.run(spark,
      "INSERT INTO def_kw_t (id, amount, status) VALUES (2, DEFAULT, 'x')")
    val got = GraftSql.run(spark,
      "SELECT id, amount, status FROM def_kw_t ORDER BY id").collect()
    assert(got(0).getString(2) == "fresh")
    assert(got(1).isNullAt(1), "DEFAULT on a non-defaulted column is NULL")
    assert(got(1).getString(2) == "x")
    GraftSql.run(spark, "DROP TABLE def_kw_t")

    val loc2 = tmpDir("def8b") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE def_kw_id_t (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY, k STRING)
         |USING graft LOCATION '$loc2' TBLPROPERTIES ('pk'='k')""".stripMargin)
    val e = intercept[Exception] {
      GraftSql.run(spark,
        "INSERT INTO def_kw_id_t (id, k) VALUES (DEFAULT, 'a')")
    }
    assert(e.getMessage.contains("omit"))
    GraftSql.run(spark, "DROP TABLE def_kw_id_t")
  }

  test("merge does NOT apply defaults (whole-row replace semantics)") {
    val t = VersionedTable(spark, tmpDir("def3") + "/t", Seq("id"))
    t.declareDefaults(Map("status" -> (("string", "'pending'"))))
    t.append(Seq((1, 10.0, "done")).toDF("id", "amount", "status"))
    // merge source omits status: matched row's status null-fills (the
    // documented merge contract) rather than silently resetting to the
    // DEFAULT — a default here would be indistinguishable from data
    t.merge(Seq((1, 99.0)).toDF("id", "amount"))
    assert(t.read.select("status").as[String].head() == null)
  }
}
