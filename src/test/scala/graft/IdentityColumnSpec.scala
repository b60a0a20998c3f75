package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.lake.{GraftSql, VersionedTable}
import graft.lake.VersionedTable.IdentitySpec

/** Identity columns (Delta's GENERATED … AS IDENTITY): system-assigned
  * BIGINT values on insert-shaped writes, unique and step-aligned (gaps
  * allowed — Delta's trade), watermark advanced atomically with the data
  * commit, ALWAYS vs BY DEFAULT explicit-write rules, merge keeps matched
  * rows' ids, SYNC IDENTITY realigns after explicit writes, and the state
  * rides the versioned property map (restore rolls it back; SHOW
  * TBLPROPERTIES never lists it).
  */
class IdentityColumnSpec extends SparkSpec {
  import spark.implicits._

  private def rows(r: (Int, String)*): DataFrame = r.toDF("amount", "part")

  private def ids(t: VersionedTable): Seq[Long] =
    t.read.select(col("id").cast("long")).as[Long].collect().toSeq

  private def assertAligned(got: Seq[Long], start: Long, step: Long): Unit = {
    assert(got.distinct.length == got.length, s"ids must be unique: $got")
    got.foreach { v =>
      assert((v - start) % step == 0, s"id $v not aligned to start=$start step=$step")
      assert(if (step > 0) v >= start else v <= start,
        s"id $v on the wrong side of start=$start for step=$step")
    }
  }

  test("append assigns unique step-aligned ids; the watermark advances " +
      "with the commit and later batches never collide") {
    val t = VersionedTable(spark, tmpDir("id1") + "/t", Seq("id"), Seq("part"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(rows((10, "p1"), (11, "p1"), (12, "p2")))           // v1
    val first = ids(t)
    assert(first.length == 3)
    assertAligned(first, 1, 1)
    val wm1 = t.identityWatermark("id").get
    assert(wm1 == first.max, "watermark = most extreme assigned value")
    t.append(rows((20, "p1"), (21, "p2")))                       // v2
    val all = ids(t)
    assert(all.length == 5)
    assertAligned(all, 1, 1)
    assert(all.distinct.length == 5, "second batch must not reuse ids")
    assert(t.identityWatermark("id").get == all.max)
    // the declaration buffered at declare time rode the FIRST commit:
    // a fresh handle replaying the log sees the same spec and watermark
    val t2 = t.copy()
    assert(t2.identityCols("id") == IdentitySpec(1, 1, allowExplicit = false))
    assert(t2.identityWatermark("id") == t.identityWatermark("id"))
  }

  test("custom START WITH / INCREMENT BY, including a negative step") {
    val t = VersionedTable(spark, tmpDir("id2") + "/t", Seq("id"))
    t.declareIdentity(Map("id" -> IdentitySpec(100, 10, allowExplicit = false)))
    t.append(rows((1, "a"), (2, "b")))
    assertAligned(ids(t), 100, 10)
    assert(ids(t).min >= 100)

    val d = VersionedTable(spark, tmpDir("id2b") + "/t", Seq("id"))
    d.declareIdentity(Map("id" -> IdentitySpec(-1, -5, allowExplicit = false)))
    d.append(rows((1, "a"), (2, "b")))
    assertAligned(ids(d), -1, -5)
    assert(ids(d).max <= -1)
    assert(d.identityWatermark("id").get == ids(d).min,
      "negative step: watermark tracks the MINIMUM")
    d.append(rows((3, "c")))
    assertAligned(ids(d), -1, -5)
    assert(ids(d).distinct.length == 3)
  }

  test("GENERATED ALWAYS refuses an explicitly supplied column; BY DEFAULT " +
      "accepts it and the watermark still advances past explicit values") {
    val t = VersionedTable(spark, tmpDir("id3") + "/t", Seq("id"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(rows((10, "p")))
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((99L, 11, "p")).toDF("id", "amount", "part"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))

    val b = VersionedTable(spark, tmpDir("id3b") + "/t", Seq("id"))
    b.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = true)))
    b.append(Seq((500L, 10, "p")).toDF("id", "amount", "part"))  // explicit
    assert(b.identityWatermark("id").get == 500L,
      "explicit BY DEFAULT values must advance the watermark")
    b.append(rows((11, "p")))                                    // assigned
    val got = ids(b)
    assert(got.distinct.length == 2)
    assert(got.filterNot(_ == 500L).head > 500L,
      "assignment after an explicit write allocates beyond it")
  }

  test("merge keeps matched rows' ids and allocates only for new keys " +
      "(natural-key pk; identity as a surrogate column)") {
    val t = VersionedTable(spark, tmpDir("id4") + "/t", Seq("k"), Seq("part"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    // merge into empty table routes through overwrite: ids assigned
    t.merge(Seq(("a", 10, "p1"), ("b", 20, "p2")).toDF("k", "amount", "part"))
    val before = t.read.select("k", "id").as[(String, Long)].collect().toMap
    assert(before.values.toSeq.distinct.length == 2)
    // upsert: 'a' updated, 'c' new — 'a' must KEEP its id
    t.merge(Seq(("a", 99, "p1"), ("c", 30, "p1")).toDF("k", "amount", "part"))
    val after = t.read.select("k", "id").as[(String, Long)].collect().toMap
    assert(after("a") == before("a"), "matched key must keep its identity value")
    assert(after("b") == before("b"))
    assert(!before.values.toSet.contains(after("c")), "new key gets a fresh id")
    assert(after.values.toSeq.distinct.length == 3)
    assert(t.read.filter(col("k") === "a").select("amount").as[Int].head() == 99)
  }

  test("clause MERGE (mergeInto) preserves target ids under UPDATE SET * " +
      "and assigns for inserts") {
    val t = VersionedTable(spark, tmpDir("id5") + "/t", Seq("k"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(Seq(("a", 10, "p"), ("b", 20, "p")).toDF("k", "amount", "part"))
    val before = t.read.select("k", "id").as[(String, Long)].collect().toMap
    t.mergeInto(Seq(("a", 77, "p"), ("z", 30, "p")).toDF("k", "amount", "part"))
      .whenMatched().updateAll()
      .whenNotMatched().insertAll()
      .execute()
    val after = t.read.select("k", "id").as[(String, Long)].collect().toMap
    assert(after("a") == before("a"), "updateAll must keep the target's id")
    assert(after("b") == before("b"))
    assert(after.values.toSeq.distinct.length == 3)
    assert(!before.values.toSet.contains(after("z")))
  }

  test("SYNC IDENTITY realigns the watermark with the live data") {
    val t = VersionedTable(spark, tmpDir("id6") + "/t", Seq("id"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = true)))
    t.append(Seq((1000L, 10, "p")).toDF("id", "amount", "part"))
    t.delete(col("id") === 1000L)
    // watermark still 1000 (monotone) — sync pulls it back to the data
    assert(t.identityWatermark("id").get == 1000L)
    val wm = t.syncIdentity("id")
    assert(wm == 0L, s"empty table syncs to start - step, got $wm")
    t.append(rows((11, "p")))
    assert(ids(t).forall(_ >= 1L))
  }

  test("identity state is versioned: restore rolls the watermark back with " +
      "the data; SHOW TBLPROPERTIES and the user property map never see it") {
    val t = VersionedTable(spark, tmpDir("id7") + "/t", Seq("id"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(rows((10, "p")))                                    // v1
    val wm1 = t.identityWatermark("id").get
    t.append(rows((20, "p"), (21, "p")))                         // v2
    assert(t.identityWatermark("id").get > wm1)
    t.restore(1)                                                 // v3
    assert(t.identityWatermark("id").get == wm1,
      "restore must roll the watermark back with the data")
    assert(t.properties.isEmpty, "graft.* keys are not user properties")
    // post-restore appends stay unique against the LIVE rows
    t.append(rows((30, "p")))
    assert(ids(t).distinct.length == ids(t).length)
    // and the engine namespace is refused on the user surface
    val e = intercept[IllegalArgumentException] {
      t.setProperties(Map("graft.identity.wm.id" -> "0"))
    }
    assert(e.getMessage.contains("reserved for engine state"))
  }

  test("rename/drop refuse identity columns; declare refuses partition " +
      "columns and non-BIGINT targets on committed tables") {
    val t = VersionedTable(spark, tmpDir("id8") + "/t", Seq("k"), Seq("part"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(Seq(("a", 10, "p")).toDF("k", "amount", "part"))
    assert(intercept[IllegalArgumentException] {
      t.renameColumn("id", "id2")
    }.getMessage.contains("identity"))
    assert(intercept[IllegalArgumentException] {
      t.dropColumn("id")
    }.getMessage.contains("identity"))
    assert(intercept[IllegalArgumentException] {
      t.declareIdentity(Map("part" -> IdentitySpec(1, 1, allowExplicit = false)))
    }.getMessage.contains("partition"))
    intercept[RuntimeException] {
      t.declareIdentity(Map("amount" -> IdentitySpec(1, 1, allowExplicit = false)))
    } // amount is INT, not BIGINT
  }

  test("concurrent writers can never reuse ids: the loser of a commit " +
      "race fails loudly (watermark lines conflict), and its retry " +
      "allocates beyond the winner") {
    val t = VersionedTable(spark, tmpDir("id11") + "/t",
      Seq("k"), Seq("part"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(Seq(("a", "p1")).toDF("k", "part"))
    val rival = t.copy()
    var fired = false
    // DISJOINT partitions: without identity the append retry would
    // re-commit its staging verbatim — with identity, the winner's
    // watermark property line must force the loser to roll back (its
    // staged ids were allocated from the stale watermark)
    t.beforeCommitHook = () =>
      if (!fired) { fired = true; rival.append(Seq(("b", "p2")).toDF("k", "part")) }
    val e = intercept[RuntimeException] {
      t.append(Seq(("c", "p3")).toDF("k", "part"))
    }
    assert(e.getMessage.contains("concurrent writer"))
    t.beforeCommitHook = () => ()
    // the retry (fresh call, fresh allocation from the NEW watermark)
    val t2 = t.copy()
    t2.append(Seq(("c", "p3")).toDF("k", "part"))
    val ids = t2.read.select(col("id").cast("long")).as[Long].collect().toSeq
    assert(ids.length == 3 && ids.distinct.length == 3,
      s"ids must stay unique across the race: $ids")
  }

  test("streaming sink (merge per micro-batch) assigns ids across batches; " +
      "a replayed batch no-ops instead of re-allocating") {
    import org.apache.spark.sql.streaming.OutputMode
    val t = VersionedTable(spark, tmpDir("id12") + "/t", Seq("k"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    val sink = new graft.streaming.TableSink(t, "app-ids", OutputMode.Append())
    sink.addBatch(0, Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    sink.addBatch(1, Seq(("c", 3)).toDF("k", "v"))
    val after2 = t.read.select("k", "id").as[(String, Long)].collect().toMap
    assert(after2.size == 3 && after2.values.toSeq.distinct.length == 3)
    // restart replays batch 1: the txn ledger no-ops it — ids unchanged
    sink.addBatch(1, Seq(("c", 3)).toDF("k", "v"))
    val after3 = t.read.select("k", "id").as[(String, Long)].collect().toMap
    assert(after3 == after2, "a replayed batch must not re-allocate ids")
    // a genuinely new batch updating an existing key keeps its id
    sink.addBatch(2, Seq(("a", 99)).toDF("k", "v"))
    assert(t.read.filter(col("k") === "a").select("id").as[Long].head() ==
      after2("a"))
  }

  test("with recordCdf on, the change-feed insert images carry EXACTLY " +
      "the ids the table committed (assignment is pinned across actions)") {
    val t = VersionedTable(spark, tmpDir("id15") + "/t", Seq("k"),
      recordCdf = true)
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "v"))       // v1
    t.merge(Seq(("b", 20), ("d", 4), ("e", 5)).toDF("k", "v"))       // v2
    val tableIds = t.read.select("k", "id").as[(String, Long)].collect().toMap
    val feedIds = t.changeFeed(1, t.currentVersion)
      .filter(col("change_type") === "insert")
      .select("k", "id").as[(String, Long)].collect().toMap
    feedIds.foreach { case (k, fid) =>
      assert(tableIds(k) == fid,
        s"CDF insert image for '$k' has id $fid but the table holds ${tableIds(k)}")
    }
    assert(tableIds.values.toSeq.distinct.length == 5)
  }

  test("UNSET TBLPROPERTIES cannot delete engine state; the graft.* keys " +
      "read as nonexistent on the user surface") {
    val t = VersionedTable(spark, tmpDir("id16") + "/t", Seq("id"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(rows((10, "p")))
    assert(intercept[IllegalArgumentException] {
      t.unsetProperties(Seq("graft.identity.wm.id"))
    }.getMessage.contains("reserved for engine state"))
    // …and with ifExists semantics the key simply does not exist
    GraftSql.register(spark, "id_unset_t", t)
    val e = intercept[Exception] {
      GraftSql.run(spark,
        "ALTER TABLE id_unset_t UNSET TBLPROPERTIES ('graft.identity.wm.id')")
    }
    assert(e.getMessage.contains("reserved") || e.getMessage.contains("exist"))
    assert(t.identityWatermark("id").isDefined, "watermark must survive")
    GraftSql.unregister(spark, "id_unset_t")
  }

  test("REPLACE TABLE cannot silently drop an identity column; declaring " +
      "it keeps allocation continuous across the replace") {
    val loc = tmpDir("id17") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE id_rep_t (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY, k STRING)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO id_rep_t (k) VALUES ('a'), ('b')")
    val wmBefore = GraftSql.registered(spark, "id_rep_t").get
      .identityWatermark("id").get
    val e = intercept[Exception] {
      GraftSql.run(spark,
        s"""CREATE OR REPLACE TABLE id_rep_t (k STRING)
           |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    }
    assert(e.getMessage.contains("cannot drop identity column"))
    // declaring it: replace succeeds, watermark survives, no id reuse
    GraftSql.run(spark,
      s"""CREATE OR REPLACE TABLE id_rep_t (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY, k STRING)
         |USING graft LOCATION '$loc' TBLPROPERTIES ('pk'='k')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO id_rep_t (k) VALUES ('c')")
    val id = GraftSql.run(spark, "SELECT id FROM id_rep_t WHERE k = 'c'")
      .as[Long].head()
    assert(id > wmBefore, "post-replace allocation continues past the watermark")
    GraftSql.run(spark, "DROP TABLE id_rep_t")
  }

  test("a shallow clone carries the identity spec AND watermark: clone " +
      "writes continue allocation with no id reuse, and a cloned bloom " +
      "index keeps pruning through the external dir references") {
    val t = VersionedTable(spark, tmpDir("id18") + "/t", Seq("k"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(Seq(("a", 1), ("b", 2)).toDF("k", "v"))
    t.createBloomIndex(Map("k" -> ((0.02, None))))
    val wm = t.identityWatermark("id").get
    val c = t.cloneTo(tmpDir("id18c") + "/t")
    assert(c.identityCols("id") == IdentitySpec(1, 1, allowExplicit = false))
    assert(c.identityWatermark("id").contains(wm),
      "the watermark must travel with the clone — reuse would duplicate ids")
    c.append(Seq(("c", 3)).toDF("k", "v"))
    val cloneIds = c.read.select(col("id").cast("long")).as[Long].collect()
    assert(cloneIds.distinct.length == 3)
    assert(cloneIds.max > wm)
    // the cloned bloom index prunes through the ext= references (the
    // sidecars live beside the SOURCE's files)
    assert(c.bloomIndexedCols.keySet == Set("k"))
    c.readWhere(col("k") === "a")
    assert(c.lastScanDirs <= 2, s"scanned ${c.lastScanDirs}")
  }

  test("TRUNCATE (empty overwrite) works on identity tables; the " +
      "watermark survives, so later inserts never reuse truncated ids") {
    val t = VersionedTable(spark, tmpDir("id13") + "/t", Seq("id"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = false)))
    t.append(rows((10, "p"), (11, "p")))
    val wm = t.identityWatermark("id").get
    t.overwrite(rows((0, "")).limit(0))
    assert(t.read.count() == 0L)
    assert(t.identityWatermark("id").contains(wm),
      "an empty overwrite allocates nothing and must not touch the watermark")
    t.append(rows((12, "p")))
    assert(ids(t).head > wm, "post-truncate allocation continues past the watermark")
  }

  test("the graft.* property namespace is refused at CREATE time, not at " +
      "the deferred buffer flush") {
    val loc = tmpDir("id14") + "/t"
    val e = intercept[Exception] {
      GraftSql.run(spark,
        s"""CREATE TABLE id_ns_t (id BIGINT, v INT) USING graft
           |LOCATION '$loc'
           |TBLPROPERTIES ('pk'='id', 'graft.identity.wm.id'='999')""".stripMargin)
    }
    assert(e.getMessage.contains("reserved for engine state"))
  }

  test("SQL surface: CREATE TABLE … GENERATED ALWAYS AS IDENTITY, INSERT " +
      "without the column, SHOW CREATE round-trip, SYNC IDENTITY statement") {
    val loc = tmpDir("id9") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE id_sql_t (
         |  id BIGINT GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2),
         |  amount INT, part STRING)
         |USING graft LOCATION '$loc'
         |TBLPROPERTIES ('pk' = 'id')""".stripMargin)
    GraftSql.run(spark,
      "INSERT INTO id_sql_t VALUES (1, 'p1'), (2, 'p1'), (3, 'p2')")
    val got = GraftSql.run(spark,
      "SELECT id, amount FROM id_sql_t ORDER BY amount")
      .as[(Long, Int)].collect().toSeq
    assert(got.map(_._2) == Seq(1, 2, 3))
    assertAligned(got.map(_._1), 10, 2)
    // second insert keeps uniqueness
    GraftSql.run(spark, "INSERT INTO id_sql_t VALUES (4, 'p2')")
    val all = GraftSql.run(spark, "SELECT id FROM id_sql_t").as[Long].collect()
    assert(all.distinct.length == 4)
    // explicit write refused for ALWAYS
    val e = intercept[Exception] {
      GraftSql.run(spark,
        "INSERT INTO id_sql_t (id, amount, part) VALUES (999, 5, 'p3')")
    }
    assert(e.getMessage.contains("GENERATED ALWAYS AS IDENTITY"))
    // SHOW CREATE TABLE renders the clause; TBLPROPERTIES hide graft.*
    val stmt = GraftSql.run(spark, "SHOW CREATE TABLE id_sql_t").as[String].head()
    assert(stmt.contains("GENERATED ALWAYS AS IDENTITY (START WITH 10 INCREMENT BY 2)"))
    assert(!stmt.contains("graft.identity"))
    val props = GraftSql.run(spark, "SHOW TBLPROPERTIES id_sql_t")
      .select("key").as[String].collect()
    assert(!props.exists(_.startsWith("graft.")))
    // SYNC IDENTITY is dispatched
    val r = GraftSql.run(spark, "ALTER TABLE id_sql_t ALTER COLUMN id SYNC IDENTITY")
    assert(r.columns.nonEmpty)
    GraftSql.run(spark, "DROP TABLE id_sql_t")
  }

  test("SQL: BY DEFAULT accepts explicit ids; MERGE INTO a surrogate-key " +
      "table keeps matched ids") {
    val loc = tmpDir("id10") + "/t"
    GraftSql.run(spark,
      s"""CREATE TABLE id_bd_t (
         |  id BIGINT GENERATED BY DEFAULT AS IDENTITY,
         |  k STRING, amount INT)
         |USING graft LOCATION '$loc'
         |TBLPROPERTIES ('pk' = 'k')""".stripMargin)
    GraftSql.run(spark, "INSERT INTO id_bd_t (k, amount) VALUES ('a', 1), ('b', 2)")
    val before = GraftSql.run(spark, "SELECT k, id FROM id_bd_t")
      .as[(String, Long)].collect().toMap
    Seq(("a", 99), ("c", 3)).toDF("k", "amount")
      .createOrReplaceTempView("id_bd_src")
    GraftSql.run(spark,
      """MERGE INTO id_bd_t USING id_bd_src ON id_bd_t.k = id_bd_src.k
         WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    val after = GraftSql.run(spark, "SELECT k, id FROM id_bd_t")
      .as[(String, Long)].collect().toMap
    assert(after("a") == before("a"))
    assert(after.values.toSeq.distinct.length == 3)
    // explicit id accepted under BY DEFAULT
    GraftSql.run(spark, "INSERT INTO id_bd_t (id, k, amount) VALUES (777, 'z', 9)")
    assert(GraftSql.run(spark, "SELECT id FROM id_bd_t WHERE k = 'z'")
      .as[Long].head() == 777L)
    GraftSql.run(spark, "DROP TABLE id_bd_t")
  }

  test("declaring identity on a POPULATED column seeds the watermark from " +
      "existing values — the next omitted-column insert never collides") {
    val t = VersionedTable(spark, tmpDir("idseed") + "/t", Seq("id"), Seq("part"))
    // v1: plain BIGINT column already holding ids 5, 9, 23
    t.overwrite(Seq((5L, 10, "p1"), (9L, 11, "p1"), (23L, 12, "p2"))
      .toDF("id", "amount", "part"))
    t.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = true)))
    // the declare commit itself seeded the watermark — no insert yet
    assert(t.identityWatermark("id").contains(23L),
      s"watermark must seed from the existing max, got ${t.identityWatermark("id")}")
    t.append(rows((30, "p1"), (31, "p2")))
    val all = ids(t)
    assert(all.length == 5 && all.distinct.length == 5,
      s"seeded allocation must not duplicate existing ids: $all")
    assert(all.filterNot(Set(5L, 9L, 23L)).forall(_ > 23L))
  }

  test("seeding clamps at START (existing values before start do not drag " +
      "allocation behind it) and an all-NULL column seeds nothing") {
    val t = VersionedTable(spark, tmpDir("idseed2") + "/t", Seq("k"))
    t.overwrite(Seq(("a", 3L), ("b", 7L)).toDF("k", "id"))
    t.declareIdentity(Map("id" -> IdentitySpec(1000, 1, allowExplicit = true)))
    // existing max 7 < start 1000: allocation stays at the declared start
    assert(t.identityWatermark("id").contains(999L))
    val t2 = VersionedTable(spark, tmpDir("idseed3") + "/t", Seq("k"))
    t2.overwrite(Seq(("a", Option.empty[Long]), ("b", Option.empty[Long]))
      .toDF("k", "id"))
    t2.declareIdentity(Map("id" -> IdentitySpec(1, 1, allowExplicit = true)))
    assert(t2.identityWatermark("id").isEmpty,
      "an all-NULL column has handed out nothing — no seed")
  }
}
