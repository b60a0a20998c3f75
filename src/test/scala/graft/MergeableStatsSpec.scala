package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.VersionedTable
import graft.ops.Exprs

/** Property test of q241's mergeable-counter lemma, driving the SHIPPED
  * maintenance code (TextOps.applyCdfStatsBatch): for RANDOM mutation
  * sequences over a CDF-recording table, the signed-delta maintained
  * counters equal a recompute from the final state — including the paths
  * the per-commit catalog entry never exercises:
  *
  *  - several commits landing in ONE drained batch (the additivity claim:
  *    update pre/post pairs cancel without latest-image resolution);
  *  - a key whose rows all die (maintained keeps a 0-count row, which must
  *    equal the recompute's ABSENT row);
  *  - mutation sequences where the same doc is edited repeatedly and then
  *    deleted (deltas telescope).
  *
  * Seeds are pinned — deterministic, no flaky CI.
  */
class MergeableStatsSpec extends SparkSpec {
  import spark.implicits._

  private def toks(c: org.apache.spark.sql.Column) = Exprs.tokens(c)

  private def drainAll(src: VersionedTable, stats: VersionedTable,
      ckpt: String): Unit = {
    val q = src.readChangesStream()
      .writeStream
      .foreachBatch((b: DataFrame, _: Long) =>
        graft.ext.TextOps.applyCdfStatsBatch(stats, b, "grp"))
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("∀ mutation sequences: CDF-maintained counters ≡ recompute " +
      "(multi-commit single drain, zeroed keys)") {
    (1L to 4L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val work = tmpDir(s"graft_mstats_$seed")
      val src = VersionedTable(spark, s"$work/src", Seq("id"),
        recordCdf = true)
      val stats = VersionedTable(spark, s"$work/stats", Seq("grp"))
      def text(): String =
        Seq.fill(rnd.nextInt(5) + 1)(s"w${rnd.nextInt(9)}").mkString(" ")
      // 24 docs over 4 groups; g3 is small so a delete wave can zero it
      val init = (0L until 24L).map(i =>
        (i, if (i < 22) s"g${i % 3}" else "g3", text()))
      src.overwrite(init.toDF("id", "grp", "text"))
      // drain the initial load alone: the stats table is CREATED here, so
      // every later batch exercises the mergeInto arm — without this
      // split, one AvailableNow drain delivers ALL commits in a single
      // batch and only the overwrite arm ever runs (review finding)
      drainAll(src, stats, s"$work/ckpt")
      assert(stats.exists, s"seed=$seed initial drain must create stats")
      var nextId = 24L
      // 6 random mutation commits BEFORE the second drain — they all land
      // in the same drained stream, often in one multi-commit batch
      (1 to 6).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 => // insert a few new docs
            val rows = (0 until rnd.nextInt(3) + 1).map { _ =>
              val r = (nextId, s"g${rnd.nextInt(4)}", text()); nextId += 1; r
            }
            src.append(rows.toDF("id", "grp", "text"))
          case 1 => // edit a stripe (append two tokens)
            src.update(col("id") % (rnd.nextInt(4) + 2) === rnd.nextInt(2),
              Map("text" -> concat(col("text"), lit(" xx yy"))))
          case 2 => // takedown a stripe (g3 dies under seed-dependent waves)
            src.deleteMor(col("id") % (rnd.nextInt(5) + 3) === rnd.nextInt(3))
        }
      }
      drainAll(src, stats, s"$work/ckpt")
      val maintained = stats.read
        .select(col("grp"), col("n_docs"), col("n_tokens"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val recomputed = src.read
        .select(col("grp"), size(toks(col("text"))).cast("long").as("n"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val keys = maintained.keySet ++ recomputed.keySet
      keys.foreach { k =>
        val m = maintained.getOrElse(k, (0L, 0L))
        val r = recomputed.getOrElse(k, (0L, 0L))
        assert(m == r,
          s"seed=$seed grp=$k maintained=$m recomputed=$r")
      }
      // the MERGE arm must actually have run (≥1 version past the initial
      // overwrite), and the multi-commit additivity path must have been
      // hit: 6 mutation commits drained into at most a handful of batches
      assert(stats.currentVersion >= 2 && stats.currentVersion <= 7,
        s"seed=$seed stats landed ${stats.currentVersion} versions — " +
          "the mergeInto maintenance arm never ran")
    }
  }
}
