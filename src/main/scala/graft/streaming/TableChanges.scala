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
  * Offsets ARE version numbers: `getOffset` reports the latest committed
  * version, and a micro-batch (start, end] is the union of those commits'
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
  * (pushdown, codegen) rather than a hand-rolled partition reader.
  */
final class TableChangesSource(
    sqlContext: SQLContext,
    metadataPath: String,
    table: VersionedTable,
    startingVersion: Int,
    skipChangeCommits: Boolean,
    maxVersionsPerTrigger: Option[Int]) extends Source {

  // frozen at source creation, like Delta's stream schema pinning: a
  // mid-stream schema evolution null-fills (additions appear on restart)
  override val schema: StructType = table.changeStreamSchema

  private def versionOf(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    // restarts hand back SerializedOffset(json) — LongOffset.json is the
    // plain number
    case other => other.json.trim.toLong
  }

  // ── admission control (Delta's maxFilesPerTrigger trade): a consumer
  // restarting far behind catches up in BOUNDED batches. The admission
  // base — the highest version a batch was PLANNED up to — persists in
  // the source's own metadata dir (the FileStreamSource pattern), because
  // a V1 source cannot learn the engine's committed offset on a clean
  // restart: without recovery, the first capped getOffset could sit BELOW
  // the checkpoint and re-deliver committed versions ──
  private val admissionFile =
    new org.apache.hadoop.fs.Path(metadataPath, "graft-admission")
  private def mfs = admissionFile.getFileSystem(
    sqlContext.sparkSession.sessionState.newHadoopConf())

  @volatile private var lastPlanned: Long = {
    val recovered =
      if (maxVersionsPerTrigger.isDefined && mfs.exists(admissionFile)) {
        val in = mfs.open(admissionFile)
        val txt =
          try new String(
            org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
          finally in.close()
        // the file is written temp-then-rename below, so it can never be
        // legitimately truncated; anything unparseable is corruption, and
        // silently falling back to startingVersion would re-deliver
        // committed versions — the exact failure this file exists to
        // prevent. Fail loudly instead.
        try Some(txt.toLong)
        catch {
          case _: NumberFormatException =>
            throw new IllegalStateException(
              s"corrupt admission file $admissionFile ('$txt'): refusing to " +
                "fall back to startingVersion (it could re-deliver committed " +
                "versions); delete it only together with the query checkpoint")
        }
      } else if (maxVersionsPerTrigger.isDefined) {
        // No admission file. If orphaned tmp files exist, a previous
        // persist crashed mid-swap on a filesystem whose overwrite-rename
        // is not atomic; falling back to startingVersion here would
        // re-deliver committed versions. Fail loudly instead of guessing.
        val dir = new org.apache.hadoop.fs.Path(metadataPath)
        val orphans =
          if (mfs.exists(dir))
            mfs.listStatus(dir).map(_.getPath.getName)
              .filter(_.startsWith(".graft-admission.tmp_"))
          else Array.empty[String]
        if (orphans.nonEmpty)
          throw new IllegalStateException(
            s"admission file $admissionFile is missing but in-flight temp " +
              s"files remain (${orphans.mkString(", ")}): a previous swap " +
              "crashed mid-write; refusing to fall back to startingVersion " +
              "(it could re-deliver committed versions). Restore the highest " +
              "temp as the admission file, or delete it together with the " +
              "query checkpoint.")
        None
      } else None
    math.max(startingVersion.toLong, recovered.getOrElse(Long.MinValue))
  }

  private def persistAdmission(v: Long): Unit =
    if (maxVersionsPerTrigger.isDefined) {
      // written at PLAN time, so the file is always ≥ any committed
      // offset — a crash between plan and commit just replans the batch.
      // Temp + atomic rename (the checkpoint/manifest pattern in
      // VersionedTable): a crash mid-write leaves only a temp, never a
      // truncated admission file for recovery to misread.
      val tmp = new org.apache.hadoop.fs.Path(metadataPath,
        s".graft-admission.tmp_${java.util.UUID.randomUUID().toString.take(8)}")
      val out = mfs.create(tmp, true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
      // Atomic swap via FileContext.rename(OVERWRITE): FileSystem.rename
      // would need a delete-then-rename pair, and a crash between the two
      // leaves NO admission file — which recovery above must then treat as
      // possible re-delivery. FileContext renames over the destination in
      // one filesystem operation, so the admission file is always either
      // the old value or the new one, never absent.
      // Filesystems without an AbstractFileSystem binding (s3a/abfs out
      // of the box) throw UnsupportedFileSystemException — fall back to
      // the delete+rename pair there: the recovery-side orphan check
      // above still covers the crash window, and failing every
      // micro-batch would be strictly worse.
      try {
        org.apache.hadoop.fs.FileContext
          .getFileContext(admissionFile.toUri,
            sqlContext.sparkSession.sessionState.newHadoopConf())
          .rename(tmp, admissionFile,
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          if (mfs.exists(admissionFile)) mfs.delete(admissionFile, false)
          if (!mfs.rename(tmp, admissionFile))
            // leave tmp in place: the admission file was already deleted,
            // so recovery MUST find the orphan and fail loudly — deleting
            // it here would silently fall back to startingVersion and
            // re-deliver committed versions
            throw new java.io.IOException(
              s"could not persist admission base to $admissionFile")
        case e: java.io.IOException =>
          // keep tmp on this path too: FileContext's rename is one
          // operation, so the admission file normally survives a failure
          // (recovery reads the old value and the orphan is inert), but if
          // the store DID lose it the orphan is what makes recovery loud
          throw new java.io.IOException(
            s"could not persist admission base to $admissionFile", e)
      }
      // the swap succeeded, so any OTHER tmp is a stale orphan from an
      // earlier failed batch — sweep them now, while the admission file
      // provably exists, so they can never spuriously trip the loud
      // missing-file check above
      val dir = new org.apache.hadoop.fs.Path(metadataPath)
      mfs.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.startsWith(".graft-admission.tmp_") &&
          p.getName != tmp.getName)
        .foreach(p => scala.util.Try(mfs.delete(p, false)))
    }

  override def getOffset: Option[Offset] = {
    val cur = table.currentVersion.toLong
    val capped = maxVersionsPerTrigger
      .fold(cur)(m => math.min(cur, lastPlanned + m))
    if (capped <= math.max(lastPlanned, startingVersion.toLong)) None
    else Some(LongOffset(capped))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val lo = start.map(versionOf).getOrElse(startingVersion.toLong).toInt
    val hi = versionOf(end).toInt
    if (hi.toLong > lastPlanned) {
      lastPlanned = hi.toLong
      persistAdmission(lastPlanned)
    }
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
    val startV = parameters.get("startingTimestamp") match {
      case Some(ts) =>
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
          val ms = tsMillis(sqlContext.sparkSession, ts)
          // versionAsOf(ms-1) = last version strictly BEFORE the
          // timestamp = the exclusive start the source wants; no such
          // version → 0 (replay from the initial snapshot)
          val v = scala.util.Try(t.versionAsOf(ms - 1)).getOrElse(0)
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
      case None => parameters.getOrElse("startingVersion", "0").toInt
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
