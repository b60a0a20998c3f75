package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.{GraftSql, VersionedTable}

/** Bloom-filter data skipping (Databricks' BLOOMFILTER INDEX): per-dir
  * immutable sidecars prune equality/IN point lookups on high-cardinality
  * unsorted columns that min/max stats cannot help with. Pruning must be
  * strictly an optimization: a missing/stale sidecar, an unindexed
  * column, or a non-equality predicate all conservatively keep the dir.
  */
class BloomSkipSpec extends SparkSpec {
  import spark.implicits._

  /** High-cardinality unsorted string key: md5 makes every dir's [min,max]
    * straddle essentially any probe, so min/max stats never prune.
    */
  private def batch(lo: Int, hi: Int): DataFrame =
    spark.range(lo, hi).select(col("id"),
      md5(col("id").cast("string")).as("k"),
      (col("id") % 7).as("v"))

  private def keyOf(i: Long): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("point lookups prune dirs that provably lack the key; every present " +
      "key is still found (no false negatives)") {
    val t = VersionedTable(spark, tmpDir("bl1") + "/t", Seq("id"))
    t.overwrite(batch(0, 1000))                                  // dir 1
    t.append(batch(1000, 2000))                                  // dir 2
    t.append(batch(2000, 3000))                                  // dir 3
    val written = t.createBloomIndex(Map("k" -> ((0.01, None))))
    assert(written >= 3, s"expected a sidecar per dir, wrote $written")
    // look up keys from each era — all found, and each scan prunes
    var prunedAtLeastOnce = false
    Seq(5L, 1500L, 2999L).foreach { i =>
      val got = t.readWhere(col("k") === keyOf(i)).select("id").as[Long].collect()
      assert(got.toSeq == Seq(i), s"lookup of id=$i returned ${got.toSeq}")
      assert(t.lastScanDirs >= 1)
      if (t.lastScanDirs < 3) prunedAtLeastOnce = true
    }
    assert(prunedAtLeastOnce,
      "a point key living in one dir should prune at least one other dir")
    // an ABSENT key prunes everything (scan dirs = 0 modulo fpp)
    val none = t.readWhere(col("k") === "not-a-real-md5-key").count()
    assert(none == 0L)
  }

  test("writes after the index is declared maintain it at stage time; IN " +
      "lists and disjunctions prune; unindexed predicates never do") {
    val t = VersionedTable(spark, tmpDir("bl2") + "/t", Seq("id"))
    t.overwrite(batch(0, 1000))
    t.createBloomIndex(Map("k" -> ((0.05, None))))
    t.append(batch(1000, 2000))                                  // maintained
    val hits = t.readWhere(col("k").isin(keyOf(3), keyOf(1999)))
      .select("id").as[Long].collect().toSet
    assert(hits == Set(3L, 1999L))
    // conjunction with an unindexed predicate still prunes via the
    // indexed side; pure unindexed predicates keep every dir
    val one = t.readWhere(col("k") === keyOf(42) && col("v") >= 0)
      .select("id").as[Long].collect()
    assert(one.toSeq == Seq(42L))
    t.readWhere(col("v") === 3)
    assert(t.lastScanDirs == 2, "unindexed predicate must keep all dirs")
  }

  test("a deleted sidecar degrades to conservative keep — results stay " +
      "correct; re-running createBloomIndex backfills exactly the gap") {
    val path = tmpDir("bl3") + "/t"
    val t = VersionedTable(spark, path, Seq("id"))
    t.overwrite(batch(0, 500))
    t.append(batch(500, 1000))
    t.createBloomIndex(Map("k" -> ((0.02, None))))
    def sidecars(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/data"))
        .filter(_.getName.startsWith("_bloom_"))
    }
    val before = sidecars()
    assert(before.nonEmpty)
    before.head.delete()
    // fresh handle (no warm cache): lookup still correct, dir kept
    val t2 = t.copy()
    assert(t2.readWhere(col("k") === keyOf(7)).select("id")
      .as[Long].collect().toSeq == Seq(7L))
    val rebuilt = t2.createBloomIndex(Map("k" -> ((0.02, None))))
    assert(rebuilt == 1, s"backfill should rebuild exactly the gap, got $rebuilt")
    assert(sidecars().length == before.length)
  }

  test("declaring with different options refuses until dropped; drop stops " +
      "pruning but reads stay correct") {
    val t = VersionedTable(spark, tmpDir("bl4") + "/t", Seq("id"))
    t.overwrite(batch(0, 300))
    t.append(batch(300, 600))
    t.createBloomIndex(Map("k" -> ((0.01, None))))
    assert(intercept[IllegalArgumentException] {
      t.createBloomIndex(Map("k" -> ((0.2, None))))
    }.getMessage.contains("different options"))
    t.readWhere(col("k") === keyOf(5))
    assert(t.lastScanDirs == 1, "indexed lookup should prune to one dir")
    t.dropBloomIndex(Seq("k"))
    assert(t.bloomIndexedCols.isEmpty)
    assert(t.readWhere(col("k") === keyOf(5)).select("id")
      .as[Long].collect().toSeq == Seq(5L))
    assert(t.lastScanDirs == 2, "dropped index must not prune")
  }

  test("the index survives a column rename (keyed by physical name) and a " +
      "fresh handle replaying the log") {
    val t = VersionedTable(spark, tmpDir("bl5") + "/t", Seq("id"))
    t.overwrite(batch(0, 400))
    t.append(batch(400, 800))
    t.createBloomIndex(Map("k" -> ((0.02, None))))
    t.renameColumn("k", "fingerprint")
    val t2 = t.copy()
    val got = t2.readWhere(col("fingerprint") === keyOf(444))
      .select("id").as[Long].collect()
    assert(got.toSeq == Seq(444L))
    assert(t2.lastScanDirs == 1,
      "pruning must keep working under the renamed logical name")
  }

  test("compaction restages maintain the index: post-OPTIMIZE dirs carry " +
      "fresh sidecars and point lookups keep pruning") {
    val t = VersionedTable(spark, tmpDir("bl8") + "/t", Seq("id"), Seq("part"))
    def b(lo: Int, hi: Int) = spark.range(lo, hi).select(col("id"),
      md5(col("id").cast("string")).as("k"),
      (col("id") % 4).cast("string").as("part"))
    t.overwrite(b(0, 1000))
    t.append(b(1000, 2000))
    t.createBloomIndex(Map("k" -> ((0.01, None))))
    t.compact()                       // rewrites every partition's dirs
    val got = t.readWhere(col("k") === keyOf(77)).select("id")
      .as[Long].collect()
    assert(got.toSeq == Seq(77L))
    assert(t.lastScanDirs == 1,
      s"post-compact lookup should prune to the key's partition dir, " +
        s"scanned ${t.lastScanDirs}")
  }

  test("TRUNCATE (empty overwrite) works on a bloom-indexed table — the " +
      "empty staging skips sidecar generation instead of failing") {
    val t = VersionedTable(spark, tmpDir("bl9") + "/t", Seq("id"))
    t.overwrite(batch(0, 500))
    t.createBloomIndex(Map("k" -> ((0.02, None))))
    t.overwrite(batch(0, 0))          // empty: zero rows staged
    assert(t.read.count() == 0L)
    t.append(batch(0, 100))           // maintenance resumes on real data
    assert(t.readWhere(col("k") === keyOf(42)).select("id")
      .as[Long].collect().toSeq == Seq(42L))
  }

  test("SQL surface: CREATE BLOOMFILTER INDEX … FOR COLUMNS with OPTIONS, " +
      "DROP BLOOMFILTER INDEX; unknown options refuse") {
    val loc = tmpDir("bl6") + "/t"
    val t = VersionedTable(spark, loc, Seq("id"))
    t.overwrite(batch(0, 500))
    GraftSql.register(spark, "bl_sql_t", t)
    val r = GraftSql.run(spark,
      "CREATE BLOOMFILTER INDEX ON TABLE bl_sql_t " +
        "FOR COLUMNS (k OPTIONS (fpp=0.02, numItems=2000))")
    assert(r.select("sidecars_written").as[Long].head() >= 1L)
    assert(t.bloomIndexedCols.keySet == Set("k"))
    assert(intercept[Exception] {
      GraftSql.run(spark, "CREATE BLOOMFILTER INDEX ON bl_sql_t " +
        "FOR COLUMNS (k OPTIONS (bogus=1))")
    }.getMessage.contains("unknown option"))
    GraftSql.run(spark, "DROP BLOOMFILTER INDEX ON bl_sql_t FOR COLUMNS (k)")
    assert(t.bloomIndexedCols.isEmpty)
    GraftSql.unregister(spark, "bl_sql_t")
  }

  test("the 4M-item sizing clamp is machine-readable: the build's return " +
      "value and the SQL result carry realized vs declared fpp") {
    val t = VersionedTable(spark, tmpDir("bl_clamp") + "/t", Seq("id"))
    t.overwrite(batch(0, 10))
    GraftSql.register(spark, "bl_clamp_t", t)
    // numItems far past the cap at a tight fpp: wanted ≈ 54M items > 4M
    val r = GraftSql.run(spark,
      "CREATE BLOOMFILTER INDEX ON TABLE bl_clamp_t " +
        "FOR COLUMNS (k OPTIONS (fpp=0.001, numItems=30000000))")
    assert(r.columns.contains("clamped_columns"))
    val cell = r.select("clamped_columns").as[String].head()
    assert(cell.startsWith("k:") && cell.contains("/0.0010"), cell)
    GraftSql.unregister(spark, "bl_clamp_t")
    // the detailed API threads the same clamps through its return value
    // (no shared handle state — concurrent builds see only their own);
    // fresh table: a re-create on t would find the DROP's orphaned
    // sidecars still on disk and backfill (hence clamp) nothing
    val t2 = VersionedTable(spark, tmpDir("bl_clamp2") + "/t", Seq("id"))
    t2.overwrite(batch(0, 10))
    val (_, report) = t2.createBloomIndexDetailed(
      Map("k" -> ((0.001, Some(30000000L)))))
    assert(report.size == 1)
    val c = report.head
    assert(c.column == "k" && c.grantedItems == 4000000L &&
      c.wantedItems > 4000000L)
    // the realized fpp is degraded past the declared one — that is the
    // fact the clamp exists to surface
    assert(c.realizedFpp > c.declaredFpp)
    // an un-clamped build reports no clamps (fresh table again)
    val t3 = VersionedTable(spark, tmpDir("bl_clamp3") + "/t", Seq("id"))
    t3.overwrite(batch(0, 10))
    GraftSql.register(spark, "bl_clamp_t3", t3)
    val r2 = GraftSql.run(spark,
      "CREATE BLOOMFILTER INDEX ON TABLE bl_clamp_t3 " +
        "FOR COLUMNS (k OPTIONS (fpp=0.02, numItems=2000))")
    assert(r2.select("sidecars_written").as[Long].head() > 0L)
    assert(r2.select("clamped_columns").as[String].head() == "")
    GraftSql.unregister(spark, "bl_clamp_t3")
  }

  test("long-typed keys prune too, and the sidecar type tag guards " +
      "hash-type drift after ALTER COLUMN TYPE widening") {
    val path = tmpDir("bl7") + "/t"
    val t = VersionedTable(spark, path, Seq("id"))
    // key column is INT here
    t.overwrite(spark.range(0, 1000).select(col("id"),
      (col("id") * 37 % 9973).cast("int").as("code")))
    t.append(spark.range(1000, 2000).select(col("id"),
      (col("id") * 37 % 9973).cast("int").as("code")))
    t.createBloomIndex(Map("code" -> ((0.02, None))))
    t.readWhere(col("code") === 37)
    val prunedBefore = t.lastScanDirs
    assert(prunedBefore <= 2)
    // widen INT → BIGINT: the probe's hash type now depends on where the
    // optimizer leaves the cast. The type tag guarantees the sidecar is
    // only consulted when its build-era type MATCHES the probe's — either
    // era-consistent pruning or conservative keep, never a false negative
    t.alterColumnType("code", org.apache.spark.sql.types.LongType)
    val t2 = t.copy()
    val got = t2.readWhere(col("code") === 37L).count()
    assert(got >= 1L, "post-widen lookup must not lose rows to stale sidecars")
    // mixed eras: a post-widen batch writes LONG files (long-tagged
    // sidecars); lookups across BOTH eras stay exact
    t2.append(spark.range(2000, 3000).select(col("id"),
      (col("id") * 37 % 9973).as("code")))
    val t3 = t2.copy()
    assert(t3.readWhere(col("code") === 37L).count() == got,
      "pre-widen rows must still be found under the widened type")
    val newEra = t3.readWhere(col("code") === (2001L * 37 % 9973))
      .select("id").as[Long].collect().toSet
    assert(newEra.contains(2001L), "post-widen rows must be found")
    t3.createBloomIndex(Map("code" -> ((0.02, None))))
    val t4 = t3.copy()
    assert(t4.readWhere(col("code") === 37L).count() == got)
  }
}
