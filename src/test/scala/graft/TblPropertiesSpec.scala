package graft

import org.apache.spark.sql.DataFrame

import graft.lake.{GraftSql, VersionedTable}

/** Table properties (Delta's TBLPROPERTIES) as logged metadata commits:
  * set/unset round trips, versioned reads, restore/clone interplay,
  * checkpoint replay, and the SQL surface (ALTER … SET/UNSET
  * TBLPROPERTIES, SHOW TBLPROPERTIES, SHOW CREATE TABLE).
  */
class TblPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Int, String)*): DataFrame = rows.toDF("id", "part")

  test("setProperties / unsetProperties round trip as logged commits") {
    val t = VersionedTable(spark, tmpDir("tp") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, "a"), (2, "b")))                       // v1
    assert(t.properties.isEmpty)
    t.setProperties(Map("owner" -> "etl", "retention" -> "30d")) // v2
    assert(t.properties == Map("owner" -> "etl", "retention" -> "30d"))
    t.setProperties(Map("owner" -> "ml"))                     // v3 (upsert)
    assert(t.properties("owner") == "ml")
    t.unsetProperties(Seq("retention"))                       // v4
    assert(t.properties == Map("owner" -> "ml"))
    // versioned metadata read: each historical version keeps its map
    assert(t.propertiesAsOfVersion(1).isEmpty)
    assert(t.propertiesAsOfVersion(2) ==
      Map("owner" -> "etl", "retention" -> "30d"))
    assert(t.propertiesAsOfVersion(3) ==
      Map("owner" -> "ml", "retention" -> "30d"))
    // a fresh handle replays the same state from the log alone
    val t2 = VersionedTable(spark, t.path, Seq("id"), Seq("part"))
    assert(t2.properties == Map("owner" -> "ml"))
  }

  test("unsetProperties refuses unknown keys unless IF EXISTS") {
    val t = VersionedTable(spark, tmpDir("tp") + "/t", Seq("id"))
    t.overwrite(df((1, "a")))
    t.setProperties(Map("k" -> "v"))
    intercept[IllegalArgumentException](t.unsetProperties(Seq("nope")))
    val v = t.currentVersion
    t.unsetProperties(Seq("nope"), ifExists = true) // all-unknown: no commit
    assert(t.currentVersion == v)
    t.unsetProperties(Seq("k", "nope"), ifExists = true) // known subset unsets
    assert(t.properties.isEmpty && t.currentVersion == v + 1)
  }

  test("restore resets properties to the target version's map") {
    val t = VersionedTable(spark, tmpDir("tp") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, "a")))                         // v1
    t.setProperties(Map("stage" -> "raw"))            // v2
    t.setProperties(Map("stage" -> "curated", "extra" -> "x")) // v3
    t.restore(2)                                      // v4: back to raw, no extra
    assert(t.properties == Map("stage" -> "raw"))
    // and a property-only difference alone triggers a restore commit
    t.restore(3)                                      // v5
    assert(t.properties == Map("stage" -> "curated", "extra" -> "x"))
  }

  test("clone carries the property map; the clone then diverges freely") {
    val t = VersionedTable(spark, tmpDir("tp") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, "a"), (2, "b")))
    t.setProperties(Map("owner" -> "etl"))
    val c = t.cloneTo(tmpDir("tp") + "/clone")
    assert(c.properties == Map("owner" -> "etl"))
    c.setProperties(Map("owner" -> "ml"))
    assert(c.properties("owner") == "ml" && t.properties("owner") == "etl")
  }

  test("properties survive checkpoint replay on a long history") {
    val t = VersionedTable(spark, tmpDir("tp") + "/t", Seq("id"), Seq("part"),
      checkpointInterval = 3)
    t.overwrite(df((1, "a")))
    t.setProperties(Map("keep" -> "me"))
    // push well past a checkpoint boundary with data commits
    (2 to 9).foreach(i => t.merge(df((i, "a"))))
    assert(t.currentVersion >= 9)
    // a fresh handle resolves state via checkpoint + tail
    val t2 = VersionedTable(spark, t.path, Seq("id"), Seq("part"),
      checkpointInterval = 3)
    assert(t2.properties == Map("keep" -> "me"))
  }

  test("SQL: SET/UNSET TBLPROPERTIES, SHOW TBLPROPERTIES, SHOW CREATE TABLE") {
    val t = VersionedTable(spark, tmpDir("tp") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, "a")))
    GraftSql.unregister(spark, "tp_sql")
    GraftSql.register(spark, "tp_sql", t)
    GraftSql.run(spark,
      "ALTER TABLE tp_sql SET TBLPROPERTIES ('team' = 'etl', 'tier' = 'gold')")
    assert(t.properties == Map("team" -> "etl", "tier" -> "gold"))
    val all = GraftSql.run(spark, "SHOW TBLPROPERTIES tp_sql")
      .as[(String, String)].collect().toSeq
    assert(all == Seq("team" -> "etl", "tier" -> "gold"))
    val one = GraftSql.run(spark, "SHOW TBLPROPERTIES tp_sql ('tier')")
      .as[(String, String)].collect().toSeq
    assert(one == Seq("tier" -> "gold"))
    intercept[Exception](
      GraftSql.run(spark, "SHOW TBLPROPERTIES tp_sql ('missing')"))
    GraftSql.run(spark, "ALTER TABLE tp_sql UNSET TBLPROPERTIES ('tier')")
    assert(t.properties == Map("team" -> "etl"))
    // UNSET without IF EXISTS refuses unknown keys; with it, no-ops
    intercept[Exception](
      GraftSql.run(spark, "ALTER TABLE tp_sql UNSET TBLPROPERTIES ('nope')"))
    GraftSql.run(spark,
      "ALTER TABLE tp_sql UNSET TBLPROPERTIES IF EXISTS ('nope')")
    // layout keys are immutable after CREATE
    intercept[Exception](GraftSql.run(spark,
      "ALTER TABLE tp_sql SET TBLPROPERTIES ('pk' = 'other')"))
    val stmt = GraftSql.run(spark, "SHOW CREATE TABLE tp_sql")
      .as[String].head()
    assert(stmt.contains("CREATE TABLE tp_sql") &&
      stmt.contains("USING graft") &&
      stmt.contains("PARTITIONED BY (part)") &&
      stmt.contains("'pk' = 'id'") &&
      stmt.contains("'team' = 'etl'") &&
      stmt.contains(s"LOCATION '${t.path}'"))
    GraftSql.unregister(spark, "tp_sql")
    // the reconstructed statement round-trips: running it re-attaches the
    // same storage with the same layout
    GraftSql.run(spark, stmt)
    assert(GraftSql.run(spark, "SELECT id, part FROM tp_sql ORDER BY id")
      .as[(Int, String)].collect().toSeq == Seq((1, "a")))
    GraftSql.unregister(spark, "tp_sql")
  }

  test("properties declared before the first commit buffer and flush " +
      "with it") {
    val work = tmpDir("tp")
    GraftSql.run(spark,
      s"""CREATE TABLE tp_pend (id INT, part STRING) USING graft
          PARTITIONED BY (part) LOCATION '$work/t'
          TBLPROPERTIES ('pk'='id', 'team'='etl')""")
    // visible immediately, though nothing is committed yet
    assert(GraftSql.run(spark, "SHOW TBLPROPERTIES tp_pend")
      .as[(String, String)].collect().toMap == Map("team" -> "etl"))
    // SET on the declared-only table buffers more (Delta accepts this
    // instead of demanding an artificial first insert)
    GraftSql.run(spark,
      "ALTER TABLE tp_pend SET TBLPROPERTIES ('stage' = 'raw')")
    // reserved layout keys refuse even while buffering
    intercept[Exception](GraftSql.run(spark,
      "ALTER TABLE tp_pend SET TBLPROPERTIES ('pk' = 'x')"))
    // UNSET prunes the buffer under the same missing-key contract
    intercept[Exception](GraftSql.run(spark,
      "ALTER TABLE tp_pend UNSET TBLPROPERTIES ('nope')"))
    GraftSql.run(spark,
      "ALTER TABLE tp_pend UNSET TBLPROPERTIES IF EXISTS ('nope')")
    // the first data commit flushes the buffer as a property commit
    Seq((1, "a")).toDF("id", "part").createOrReplaceTempView("tp_pend_src")
    GraftSql.run(spark, "INSERT INTO tp_pend SELECT * FROM tp_pend_src")
    val t = GraftSql.registered(spark, "tp_pend").get
    assert(t.properties == Map("team" -> "etl", "stage" -> "raw"))
    // a FRESH handle replays them from the log — committed state, not
    // session memory
    val t2 = VersionedTable(spark, t.path, Seq("id"), Seq("part"))
    assert(t2.properties == Map("team" -> "etl", "stage" -> "raw"))
    GraftSql.run(spark, "DROP TABLE tp_pend")
  }

  test("CTAS commits user TBLPROPERTIES immediately; attach verifies " +
      "declared properties against the committed map") {
    val work = tmpDir("tp")
    Seq((1, "a")).toDF("id", "part").createOrReplaceTempView("tp_ctas_src")
    GraftSql.run(spark,
      s"""CREATE TABLE tp_ctas USING graft PARTITIONED BY (part)
          LOCATION '$work/c' TBLPROPERTIES ('pk'='id', 'origin'='ctas')
          AS SELECT * FROM tp_ctas_src""")
    val t = GraftSql.registered(spark, "tp_ctas").get
    assert(t.properties == Map("origin" -> "ctas"))
    GraftSql.run(spark, "DROP TABLE tp_ctas")
    // re-attach declaring the SAME property: fine
    GraftSql.run(spark,
      s"""CREATE TABLE tp_ctas USING graft LOCATION '$work/c'
          TBLPROPERTIES ('pk'='id', 'partition'='part', 'origin'='ctas')""")
    GraftSql.run(spark, "DROP TABLE tp_ctas")
    // …a WRONG value is refused, not silently dropped
    val e = intercept[IllegalArgumentException](GraftSql.run(spark,
      s"""CREATE TABLE tp_ctas USING graft LOCATION '$work/c'
          TBLPROPERTIES ('pk'='id', 'partition'='part', 'origin'='other')"""))
    assert(e.getMessage.contains("do not match the committed table"))
  }

  test("a replace supersedes buffered pre-commit properties") {
    val work = tmpDir("tp")
    GraftSql.run(spark,
      s"""CREATE TABLE tp_rep (id INT, part STRING) USING graft
          PARTITIONED BY (part) LOCATION '$work/t' TBLPROPERTIES ('pk'='id')""")
    // buffered on the declared-only table…
    GraftSql.run(spark, "ALTER TABLE tp_rep SET TBLPROPERTIES ('stage' = 'old')")
    Seq((1, "a")).toDF("id", "part").createOrReplaceTempView("tp_rep_src")
    // …must NOT flush over the replace's declared map afterwards
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE tp_rep USING graft PARTITIONED BY (part)
          LOCATION '$work/t' TBLPROPERTIES ('pk'='id', 'stage' = 'new')
          AS SELECT * FROM tp_rep_src""")
    val t = GraftSql.registered(spark, "tp_rep").get
    assert(t.properties == Map("stage" -> "new"))
    GraftSql.run(spark, "DROP TABLE tp_rep")
  }

  test("REPLACE TABLE is ONE atomic commit: the property delta rides the " +
      "overwrite, and no intermediate version exists") {
    val work = tmpDir("tp")
    Seq((1, "a"), (2, "b")).toDF("id", "part")
      .createOrReplaceTempView("tp_atomic_src")
    GraftSql.run(spark,
      s"""CREATE TABLE tp_atomic USING graft PARTITIONED BY (part)
          LOCATION '$work/t' TBLPROPERTIES ('pk'='id', 'stage'='raw',
          'team'='etl') AS SELECT * FROM tp_atomic_src""")
    val t = GraftSql.registered(spark, "tp_atomic").get
    val v0 = t.currentVersion
    Seq((9, "z")).toDF("id", "part").createOrReplaceTempView("tp_atomic_src2")
    // drops 'owner', changes 'stage', swaps the data — ONE version
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE tp_atomic USING graft PARTITIONED BY (part)
          LOCATION '$work/t' TBLPROPERTIES ('pk'='id', 'stage'='gold')
          AS SELECT * FROM tp_atomic_src2""")
    assert(t.currentVersion == v0 + 1,
      "replace must be a single commit (data + property delta together)")
    assert(t.properties == Map("stage" -> "gold"))
    assert(t.read.count() == 1)
    // time travel: the pre-replace era keeps old data AND old map; no
    // half-applied intermediate (new data + old map) is reachable
    assert(t.propertiesAsOfVersion(v0) ==
      Map("stage" -> "raw", "team" -> "etl"))
    assert(t.readVersion(v0).count() == 2)
    // plain REPLACE (truncate) folds its property wipe the same way
    GraftSql.run(spark,
      s"""REPLACE TABLE tp_atomic (id INT, part STRING) USING graft
          PARTITIONED BY (part) LOCATION '$work/t' TBLPROPERTIES ('pk'='id')""")
    assert(t.currentVersion == v0 + 2 && t.properties.isEmpty)
    GraftSql.run(spark, "DROP TABLE tp_atomic")
  }

  test("CREATE OR REPLACE on an unregistered name attaches committed " +
      "storage and supersedes its property map (no attach clash)") {
    val work = tmpDir("tp")
    // a committed table with a property map, then deregister the name
    Seq((1, "a")).toDF("id", "part").createOrReplaceTempView("tp_orc_src")
    GraftSql.run(spark,
      s"""CREATE TABLE tp_orc USING graft PARTITIONED BY (part)
          LOCATION '$work/t' TBLPROPERTIES ('pk'='id', 'stage'='raw')
          AS SELECT * FROM tp_orc_src""")
    GraftSql.run(spark, "DROP TABLE tp_orc") // storage + commits survive
    // CREATE OR REPLACE with a DIFFERENT map must succeed (Delta
    // semantics: the declared properties become the new map), not refuse
    // with the attach property-match error
    Seq((5, "c")).toDF("id", "part").createOrReplaceTempView("tp_orc_src2")
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE tp_orc USING graft PARTITIONED BY (part)
          LOCATION '$work/t' TBLPROPERTIES ('pk'='id', 'stage'='gold')
          AS SELECT * FROM tp_orc_src2""")
    val t = GraftSql.registered(spark, "tp_orc").get
    assert(t.properties == Map("stage" -> "gold"))
    assert(t.read.as[(Int, String)].collect().toSeq == Seq((5, "c")))
    // …while a PLAIN create (attach) with a clashing map still refuses —
    // the replace path is the only one allowed to supersede
    GraftSql.run(spark, "DROP TABLE tp_orc")
    val e = intercept[IllegalArgumentException](GraftSql.run(spark,
      s"""CREATE TABLE tp_orc USING graft PARTITIONED BY (part)
          LOCATION '$work/t' TBLPROPERTIES ('pk'='id', 'stage'='other')"""))
    assert(e.getMessage.contains("do not match the committed table"))
    // and the declared layout check still guards the OR-REPLACE attach
    val e2 = intercept[IllegalArgumentException](GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE tp_orc USING graft
          LOCATION '$work/t' TBLPROPERTIES ('pk'='part')
          AS SELECT * FROM tp_orc_src2"""))
    assert(e2.getMessage.contains("declared layout"))
  }

  test("reserved layout keys refuse on the API surface too, not just SQL") {
    val t = VersionedTable(spark, tmpDir("tp") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, "a")))
    // the guard lives in setProperties itself — a direct API call cannot
    // shadow the layout either (SHOW CREATE TABLE would emit duplicate
    // keys and attach behavior would depend on duplicate resolution)
    val e = intercept[IllegalArgumentException](
      t.setProperties(Map("PK" -> "other"))) // case-insensitive
    assert(e.getMessage.contains("cannot be changed"))
    intercept[IllegalArgumentException](
      t.setProperties(Map("statscols" -> "x", "ok" -> "1")))
    assert(t.properties.isEmpty && t.currentVersion == 1) // nothing landed
  }

  test("property commits show in history and conflict with in-flight writers") {
    val t = VersionedTable(spark, tmpDir("tp") + "/t", Seq("id"), Seq("part"))
    t.overwrite(df((1, "a")))
    t.setProperties(Map("k" -> "v"))
    val hist = t.historyFrame.select("action").as[String].collect().toSeq
    assert(hist.contains("setproperties"))
    // a property commit landing mid-merge forces the merge to restage
    // (conservative metadata conflict), not silently re-commit
    val other = VersionedTable(spark, t.path, Seq("id"), Seq("part"))
    var fired = false
    t.beforeCommitHook = () => {
      if (!fired) { fired = true; other.setProperties(Map("race" -> "yes")) }
    }
    intercept[Exception](t.merge(df((2, "a"))))
    t.beforeCommitHook = () => ()
    // the racing property landed; the merge rolled back cleanly
    assert(t.properties == Map("k" -> "v", "race" -> "yes"))
    t.merge(df((2, "a"))) // retry on the new state succeeds
    assert(t.read.count() == 2)
  }
}
