package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Stateful streaming sessionization via
  * `KeyValueGroupedDataset.flatMapGroupsWithState` — the custom-state
  * streaming surface (§2.10): a session = events of one user separated by
  * gaps ≤ `gapSec`; session counts survive micro-batch boundaries through
  * `GroupState`, so a session spanning two file drops is counted once.
  *
  * 100 TB posture: state is per-user (bounded by active users, not
  * events), partitioned by the groupByKey shuffle, and checkpointed; each
  * batch sorts only its own per-user slice.
  */
object Sessionize {

  final case class Ev(user_id: Long, sec: Long)
  final case class SessState(lastSec: Long, nSessions: Long)
  final case class SessCount(user_id: Long, n_sessions: Long)

  val DefaultGapSec = 1800L

  /** One state transition: fold this batch's (sorted) events into the
    * user's running (lastSec, count). Batches arrive time-ordered per the
    * file source's discovery order; within a batch we sort.
    */
  def step(gapSec: Long)(
      user: Long, evs: Iterator[Ev], state: GroupState[SessState]): Iterator[SessCount] = {
    var st = state.getOption.getOrElse(SessState(Long.MinValue, 0L))
    evs.toSeq.sortBy(e => (e.sec, e.user_id)).foreach { e =>
      st =
        if (st.lastSec == Long.MinValue || e.sec - st.lastSec > gapSec)
          SessState(e.sec, st.nSessions + 1)
        else SessState(e.sec, st.nSessions)
    }
    state.update(st)
    Iterator.single(SessCount(user, st.nSessions))
  }

  /** Ingest all currently-available CSV files (user_id,sec) from `srcDir`,
    * update per-user session state, and append each batch's updated counts
    * (tagged with the batch id) to `outDir`. `finalCounts` reads the last
    * emission per user.
    */
  def runAvailable(
      spark: SparkSession,
      srcDir: String,
      checkpoint: String,
      outDir: String,
      gapSec: Long = DefaultGapSec): Unit = {
    import spark.implicits._
    val schema = StructType(Seq(
      StructField("user_id", StringType), StructField("sec", StringType)))
    val evs = spark.readStream.option("header", "true").schema(schema).csv(srcDir)
      .select(col("user_id").cast("long"), col("sec").cast("long"))
      .as[Ev]
    val counts = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(step(gapSec))
    val q = counts.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[SessCount], id: Long) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Latest emitted count per user across all processed batches. */
  def finalCounts(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("batch_id").desc)
    spark.read.parquet(outDir)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("user_id", "n_sessions")
  }
}
