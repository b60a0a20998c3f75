package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

import graft.lake.VersionedTable

/** Structured-streaming source over a [[VersionedTable]]'s commit log —
  * Delta's streaming read re-expressed for graft's versioned table.
  *
  * Offsets ARE version numbers: `latestOffset` reports the latest
  * committed (rate-limit-capped) version, and a micro-batch (start, end]
  * is the union of those commits'
  * change records ([[VersionedTable.changesBetween]] — recorded change
  * files when present, the version-1 snapshot as the initial `insert`
  * batch, error-or-skip for unrecorded rewrites). The engine checkpoints
  * the offsets, so a restarted query resumes exactly after the last
  * version its sink committed — per-commit exactly-once, with no state of
  * our own to manage.
  *
  * Scale shape: each micro-batch opens only that commit range's change
  * files (bounded by changed rows); the consumer of a 100 TB table pays
  * for its deltas, never a snapshot re-scan. Registered as the V1
  * `Source`/`StreamSourceProvider` pair — `getBatch` returning a plain
  * parquet read keeps the whole batch inside normal Catalyst planning
  * (pushdown, codegen) rather than a hand-rolled partition reader — plus
  * the engine's `SupportsAdmissionControl`/`SupportsTriggerAvailableNow`
  * surfaces (the `FileStreamSource` pattern), so rate limiting is
  * checkpoint-authoritative and `Trigger.AvailableNow` drains in bounded
  * multi-batches instead of falling back to one giant single batch.
  */
final class TableChangesSource(
    sqlContext: SQLContext,
    metadataPath: String,
    table: VersionedTable,
    startingVersion: Int,
    skipChangeCommits: Boolean,
    maxVersionsPerTrigger: Option[Int]) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{
    ReadLimit, ReadMaxRows, Offset => OffsetV2}

  // frozen at source creation, like Delta's stream schema pinning: a
  // mid-stream schema evolution null-fills (additions appear on restart)
  override val schema: StructType = table.changeStreamSchema

  private def versionOf(o: OffsetV2): Long = o match {
    case l: LongOffset => l.offset
    // restarts hand back SerializedOffset(json) — LongOffset.json is the
    // plain number
    case other => other.json.trim.toLong
  }

  // ── admission control (Delta's maxFilesPerTrigger trade): a consumer
  // restarting far behind catches up in BOUNDED batches. Implemented on
  // the engine's SupportsAdmissionControl surface (the FileStreamSource
  // pattern): latestOffset RECEIVES the last planned offset from the
  // engine's own offset log, so there is no source-side admission state
  // to persist and no recovery window in which a capped offset could sit
  // below the checkpoint and re-deliver committed versions — the cap is
  // always start + maxVersions, and start is checkpoint-authoritative ──

  // pinned end for Trigger.AvailableNow (MultiBatchExecutor): the run
  // drains up to the version current AT QUERY START in rate-limited
  // batches, then stops — commits landing mid-run wait for the next run
  @volatile private var availableNowCap: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(table.currentVersion.toLong)

  // version count rides the maxRows carrier (a version IS one row of the
  // commit stream); the engine only echoes the limit back into
  // latestOffset and progress reporting, it does not interpret it
  override def getDefaultReadLimit: ReadLimit =
    maxVersionsPerTrigger.map(m => ReadLimit.maxRows(m.toLong))
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val base = Option(start).map(versionOf).getOrElse(startingVersion.toLong)
    val cur0 = table.currentVersion.toLong
    val cur = availableNowCap.fold(cur0)(math.min(cur0, _))
    val capped = limit match {
      case r: ReadMaxRows => math.min(cur, base + r.maxRows)
      case _ => cur
    }
    // null = nothing new (the engine wraps in Option) — also covers a
    // startingVersion/AvailableNow cap ahead of the current version
    if (capped <= base) null else LongOffset(capped)
  }

  // progress reporting sees the TRUE head, not the rate-limited one
  override def reportLatestOffset(): OffsetV2 =
    if (table.exists) LongOffset(table.currentVersion.toLong) else null

  override def getOffset: Option[Offset] = throw new UnsupportedOperationException(
    "latestOffset(Offset, ReadLimit) should be called instead of this method")

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(versionOf).getOrElse(startingVersion.toLong).toInt
    val hi = versionOf(end).toInt
    GraftSqlBridge.asStreamingFrame(
      table.changesBetween(lo, hi, skipChangeCommits))
  }

  override def stop(): Unit = ()
}

/** `spark.readStream.format(...)` provider for [[TableChangesSource]];
  * [[VersionedTable.readChangesStream]] is the user-facing constructor.
  */
final class TableChangesProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-table-changes"

  private def tableOf(spark: SparkSession,
                      parameters: Map[String, String]): VersionedTable = {
    def list(k: String) =
      parameters.getOrElse(k, "").split(",").toSeq.filter(_.nonEmpty)
    VersionedTable(spark, parameters("path"), list("pk"), list("partitionCols"))
  }

  override def sourceSchema(
      sqlContext: SQLContext, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): (String, StructType) =
    (shortName(),
      tableOf(sqlContext.sparkSession, parameters).changeStreamSchema)

  override def createSource(
      sqlContext: SQLContext, metadataPath: String, schema: Option[StructType],
      providerName: String, parameters: Map[String, String]): Source = {
    val t = tableOf(sqlContext.sparkSession, parameters)
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "graft-table-changes: set startingVersion OR startingTimestamp, not both")
    // startingTimestamp (Delta's streaming option): the stream begins at
    // the FIRST commit at or after the timestamp — resolved ONCE, on the
    // query's FIRST start, and persisted in the source's metadata dir.
    // A restart reads the persisted resolution instead of re-resolving:
    // a commit that lands AFTER the first start but with a timestamp
    // still below the cutoff must flow (the checkpoint owns the position
    // from the first start), and a fresh re-resolution against the grown
    // log would skip it. A timestamp preceding every commit starts from
    // the initial snapshot; one after the latest commit delivers only
    // future commits.
    // once-resolved start: compute on the query's FIRST start, persist in
    // the source's metadata dir, read back on restart
    def resolvedOnce(resolve: => Int): Int = {
      val f = new org.apache.hadoop.fs.Path(metadataPath,
        "graft-starting-version")
      val fs = f.getFileSystem(
        sqlContext.sparkSession.sessionState.newHadoopConf())
      if (fs.exists(f)) {
        val in = fs.open(f)
        val txt = try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
        // temp-then-rename below: never legitimately truncated
        try txt.toInt
        catch { case _: NumberFormatException =>
          throw new IllegalStateException(
            s"corrupt starting-version file $f ('$txt'): delete it only " +
              "together with the query checkpoint") }
      } else {
        val v = resolve
        val tmp = new org.apache.hadoop.fs.Path(metadataPath,
          s".graft-starting-version.tmp_${
            java.util.UUID.randomUUID().toString.take(8)}")
        val out = fs.create(tmp, true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
        // a crash before the rename just re-resolves next start — no
        // offset can have been planned before source creation returns
        if (!fs.rename(tmp, f) && !fs.exists(f))
          throw new java.io.IOException(
            s"could not persist starting version to $f")
        v
      }
    }
    val startV = parameters.get("startingTimestamp") match {
      case Some(ts) =>
        // versionAsOf(ms-1) = last version strictly BEFORE the timestamp
        // = the exclusive start the source wants; no such version → 0
        // (replay from the initial snapshot)
        resolvedOnce {
          val ms = tsMillis(sqlContext.sparkSession, ts)
          scala.util.Try(t.versionAsOf(ms - 1)).getOrElse(0)
        }
      case None => parameters.getOrElse("startingVersion", "0") match {
        // Delta's startingVersion="latest": only commits made AFTER the
        // query first starts flow — the current version IS the exclusive
        // start, pinned once so a restart cannot silently skip the
        // commits that landed mid-downtime
        case l if l.equalsIgnoreCase("latest") =>
          resolvedOnce(t.currentVersion)
        case n => n.toInt
      }
    }
    new TableChangesSource(
      sqlContext,
      metadataPath,
      t,
      startV,
      parameters.getOrElse("skipChangeCommits", "false").toBoolean,
      parameters.get("maxVersionsPerTrigger").map(_.toInt).filter(_ > 0))
  }

  /** Epoch millis of a timestamp option value, parsed with the session
    * time zone (same cast semantics as SQL `TIMESTAMP AS OF`).
    */
  private def tsMillis(spark: SparkSession, s: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types.TimestampType
    val micros = scala.util.Try(
      Cast(Literal(s), TimestampType,
        Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null))
      .toOption.flatMap(Option(_))
      .getOrElse(sys.error(
        s"graft-table-changes: cannot parse startingTimestamp '$s'"))
    micros.asInstanceOf[Long] / 1000L
  }
}
