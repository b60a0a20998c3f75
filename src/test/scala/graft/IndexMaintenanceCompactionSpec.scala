package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.lake.VersionedTable

/** Maintenance interleaved with maintenance: the q212/q214 change-feed
  * index flow keeps converging to rebuild-equivalence even when table
  * OPTIMIZE (compact) and VACUUM run on the index BETWEEN drains — the
  * composition a production nightly actually is (ingest, maintain,
  * compact, reclaim, repeat). Uses a toy keyed index (id → derived
  * value) so equivalence is checkable in closed form.
  */
class IndexMaintenanceCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  // the "index" derivation: one row per doc, value = reversed text —
  // stands in for bands/cells; any pure row function works
  private def derive(df: DataFrame): DataFrame =
    df.select(pmod(col("doc_id"), lit(4L)).as("grp"), col("doc_id"),
      reverse(col("text")).as("v"))

  test("CDF-maintained index equals a rebuild across compact and vacuum " +
      "between drains") {
    val work = tmpDir("imc") + "/t"
    val src = VersionedTable(spark, s"$work/src", Seq("doc_id"),
      recordCdf = true)
    val idx = VersionedTable(spark, s"$work/idx",
      Seq("grp", "doc_id"), Seq("grp"))
    def applyBatch(batch: DataFrame): Unit = {
      val ord = col("_commit_version") * 2 +
        when(col("change_type") === "update_preimage", 0).otherwise(1)
      val latest = batch.groupBy("doc_id")
        .agg(max_by(struct(batch.columns.filter(_ != "doc_id").map(col): _*),
          ord).as("x"))
        .select(col("doc_id") +: batch.columns.filter(_ != "doc_id")
          .map(c => col(s"x.$c").as(c)): _*)
      val up = latest.filter(col("change_type").isin("insert", "update_postimage"))
        .select(col("doc_id"), col("text"))
      val del = latest.filter(col("change_type") === "delete")
        .select(pmod(col("doc_id"), lit(4L)).as("grp"), col("doc_id"))
      if (!up.isEmpty) idx.merge(derive(up))
      if (idx.exists && !del.isEmpty)
        idx.mergeInto(del).whenMatched().delete().execute()
    }
    def drain(): Unit = {
      val q = src.readChangesStream()
        .writeStream
        .foreachBatch((b: DataFrame, _: Long) => applyBatch(b))
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def rebuilt: Set[(Long, Long, String)] =
      derive(src.read).as[(Long, Long, String)].collect().toSet
    def maintained: Set[(Long, Long, String)] =
      idx.read.select("grp", "doc_id", "v").as[(Long, Long, String)]
        .collect().toSet

    src.overwrite(docs((1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta"),
      (5, "epsilon"), (6, "zeta")))
    drain()
    assert(maintained == rebuilt)

    // OPTIMIZE the index between drains: several small merge commits fold
    // into compacted files; the next drain must land on the compacted state
    idx.compact()
    src.update(col("doc_id") % 2 === 0,
      Map("text" -> concat(col("text"), lit("x"))))
    drain()
    assert(maintained == rebuilt)

    // VACUUM the index (reclaim pre-compaction storage), then delete from
    // the source and drain the takedown
    idx.vacuum(retain = 1)
    src.deleteMor(col("doc_id") % 3 === 0)
    drain()
    assert(maintained == rebuilt)
    assert(maintained.nonEmpty, "vacuous: everything deleted")
    // the merge-delete landed in the right buckets (no stale survivors)
    assert(idx.read.groupBy("doc_id").count().filter(col("count") > 1).isEmpty)
  }
}
