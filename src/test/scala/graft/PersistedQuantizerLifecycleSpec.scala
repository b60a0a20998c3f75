package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ext.VectorOps
import graft.lake.VersionedTable
import graft.ops.Exprs.qint

/** The full train-once / serve-many ANN lifecycle q216 publishes, driven
  * end to end with the MAINTENANCE leg pointed at the persisted artifact
  * (VERDICT r15 #1's "point q214's maintenance at it"): the quantizer is a
  * versioned artifact table (v1 seed, v2 trained); the cell index is built
  * FROM the artifact; the source then mutates (re-embeds that move cells,
  * takedowns) and a change-feed drain maintains the index using the SAME
  * artifact read — no retrain anywhere after publish, which the spec pins
  * by asserting the artifact version count never moves past 2. Equivalence
  * oracle: maintained index ≡ assignment of the source's final state
  * against the artifact (q214's rebuild-from-final-state pattern).
  */
class PersistedQuantizerLifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(ids: Seq[Long], negate: Long => Boolean = _ => false): DataFrame =
    ids.map { id =>
      var s = 0xC0FFEEL + id * 1000003L
      def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
      val e = Seq.fill(64)(((math.floorMod(next() >>> 16, 2001L) - 1000L) / 1000.0).toFloat)
      (id, if (negate(id)) e.map(x => -x) else e)
    }.toDF("vec_id", "embedding")
      // parquet sources carry nullable array elements; toDF infers
      // containsNull=false, which the versioned table's schema alignment
      // could then never cast back to
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

  test("artifact-built index stays rebuild-equivalent under CDF maintenance " +
      "without retraining") {
    graft.expr.GraftFunctions.register(spark)
    val work = tmpDir("pql") + "/t"
    val src = VersionedTable(spark, s"$work/src", Seq("vec_id"),
      recordCdf = true)
    src.overwrite(vecs(0L until 48L)) // v1: the corpus at train time

    // ── publish the quantizer artifact: v1 = stride seed, v2 = trained ──
    val qt = VersionedTable(spark, s"$work/quantizer", Seq("c_id"))
    qt.overwrite(VectorOps.centroids(src.read, 8)
      .select(col("c_id"), col("ce").cast("array<double>").as("ce")))
    qt.overwrite(VectorOps.trainedCentroids(src.read, 8, 3)
      .select(col("c_id"), col("ce").cast("array<double>").as("ce")))
    assert(qt.currentVersion == 2)
    val cents = qt.read // every downstream leg serves from THIS artifact

    // ── build the cell index FROM the artifact (q213/q216 shape) ──
    val idx = VersionedTable(spark, s"$work/idx",
      Seq("vec_id"), Seq("grp"), statsCols = Seq("cell"))
    def grpOf(c: org.apache.spark.sql.Column) = pmod(c, lit(4L))
    val built = VectorOps.assignCells(src.read, cents)
      .select(col("vec_id"), col("embedding"), col("cell"),
        grpOf(col("cell")).as("grp"))
    assert(built.queryExecution.executedPlan.toString.contains(s"$work/quantizer"),
      "the index build must scan the persisted quantizer artifact's data path")
    idx.overwrite(built)

    // ── maintenance: q214's change-feed flow, quantizer = the artifact ──
    def applyBatch(batch: DataFrame): Unit = {
      val ord = col("_commit_version") * 2 +
        when(col("change_type") === "update_preimage", 0).otherwise(1)
      val latest = batch.groupBy("vec_id")
        .agg(max_by(struct(batch.columns.filter(_ != "vec_id").map(col): _*),
          ord).as("x"))
        .select(col("vec_id") +: batch.columns.filter(_ != "vec_id")
          .map(c => col(s"x.$c").as(c)): _*)
      val up = latest.filter(col("change_type").isin("insert", "update_postimage"))
        .select(col("vec_id"), col("embedding"))
      val del = latest.filter(col("change_type") === "delete").select("vec_id")
      if (!up.isEmpty)
        idx.merge(VectorOps.assignCells(up, cents)
          .select(col("vec_id"), col("embedding"), col("cell"),
            grpOf(col("cell")).as("grp")))
      if (idx.exists && !del.isEmpty) {
        val firstImg = batch.groupBy("vec_id")
          .agg(min_by(struct(batch.columns.filter(_ != "vec_id").map(col): _*),
            ord).as("x"))
          .select(col("vec_id"), col("x.embedding").as("embedding"))
        val delScoped = VectorOps.assignCells(del.join(firstImg, Seq("vec_id")),
            cents, keepEmbedding = false)
          .select(col("vec_id"), grpOf(col("cell")).as("grp"))
        idx.mergeInto(delScoped).whenMatched().delete().execute()
      }
    }
    def drain(): Unit = {
      // startingVersion is exclusive (0 = deliver from v1): the index was
      // built from the v1 snapshot, so maintenance consumes v2 onward
      val q = src.readChangesStream(startingVersion = 1)
        .writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // v2: re-embed a third of the corpus (negation flips every cosine —
    // guaranteed cell moves); v3: take down every 5th vector; one drain
    // spans both so re-embed-then-takedown keys net to a delete
    src.update(col("vec_id") % 3 === 0,
      Map("embedding" -> transform(col("embedding"), x => -x)))
    src.deleteMor(col("vec_id") % 5 === 0)
    drain()

    def keyOf(df: DataFrame): Set[(Long, Long, Long)] = {
      val echk = aggregate(sequence(lit(1), size(col("embedding"))), lit(0L),
        (a, i) => a + i.cast("long") * qint(element_at(col("embedding"), i)))
      df.select(col("vec_id"), col("cell"), echk.as("echk"))
        .as[(Long, Long, Long)].collect().toSet
    }
    val maintained = keyOf(idx.read)
    val rebuilt = keyOf(VectorOps.assignCells(src.read, cents))
    assert(maintained == rebuilt,
      s"maintained index diverged from rebuild: only-maintained=" +
        s"${maintained -- rebuilt}, only-rebuilt=${rebuilt -- maintained}")
    assert(maintained.nonEmpty)
    // some maintained row must have MOVED cells vs the build (the negated
    // embeddings) — otherwise the migration path was never exercised
    val builtCells = keyOf(idx.readVersion(1)).map(t => t._1 -> t._2).toMap
    assert(maintained.exists { case (id, cell, _) =>
      builtCells.get(id).exists(_ != cell) },
      "vacuous maintenance: no surviving row changed cells")
    // train-once/serve-many: maintenance published NO new artifact version
    assert(qt.currentVersion == 2,
      "maintenance must serve the published artifact, never retrain")
  }

  /** VERDICT r16 #8: the artifact's serving state — how many versions the
    * lifecycle has published (seed + trained = 2) and how many cells the
    * CURRENT quantizer serves — is observable from SQL alone, so an
    * operator can audit ANN serving state without the Scala API.
    */
  test("quantizer artifact serving state is observable from SQL") {
    graft.expr.GraftFunctions.register(spark)
    val work = tmpDir("pqlsql") + "/t"
    val src = VersionedTable(spark, s"$work/src", Seq("vec_id"))
    src.overwrite(vecs(0L until 48L))
    val qt = VersionedTable(spark, s"$work/quantizer", Seq("c_id"))
    qt.overwrite(VectorOps.centroids(src.read, 8)
      .select(col("c_id"), col("ce").cast("array<double>").as("ce")))
    qt.overwrite(VectorOps.trainedCentroids(src.read, 8, 3)
      .select(col("c_id"), col("ce").cast("array<double>").as("ce")))
    graft.lake.GraftSql.run(spark,
      s"CREATE TABLE pql_qz USING graft LOCATION '$work/quantizer' " +
        "TBLPROPERTIES ('pk'='c_id')")
    try {
      val d = graft.lake.GraftSql.run(spark, "DESCRIBE DETAIL pql_qz")
        .selectExpr("cast(version as long) v", "cast(num_rows as long) n",
          "pk").head()
      assert(d.getLong(0) == 2L,
        s"artifact lifecycle must show v1 seed + v2 trained, got v=${d.getLong(0)}")
      assert(d.getLong(1) == qt.read.count(),
        "DESCRIBE DETAIL num_rows must equal the served cell count")
      assert(d.getString(2) == "c_id")
      // the publish history (one commit per lifecycle step) from SQL too
      val hist = graft.lake.GraftSql.run(spark, "DESCRIBE HISTORY pql_qz")
      assert(hist.count() == 2L,
        "DESCRIBE HISTORY must list the seed and trained publishes")
    } finally graft.lake.GraftSql.run(spark, "DROP TABLE pql_qz")
  }
}
