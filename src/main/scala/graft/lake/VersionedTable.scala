package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned lake table: Delta-style time travel re-expressed as a
  * directory-granular commit log over plain Parquet.
  *
  * Layout:
  * {{{
  *   path/_log/v00001.log    one entry per commit: action + the RELATIVE
  *                           data dirs it adds/removes
  *   path/data/v00001/...    every commit writes its files under its OWN
  *                           version root; nothing is rewritten in place,
  *                           so every historical version stays readable
  *                           until vacuumed
  * }}}
  *
  * The atomic create of the next log file IS the commit — the protocol the
  * reference gets from Delta's transaction log
  * (/root/reference/scripts/glue/script.py:31-32): data dirs are staged
  * first, the log create claims the version number, and a writer that
  * loses the race fails fast and deletes its staging (readers never see
  * it). Time travel = replaying adds/removes up to version v.
  *
  * vs [[LakeTable]]: LakeTable is the swap-based latest-only variant
  * (lower storage, no history); this trades storage for versioned reads +
  * an auditable [[history]], with [[vacuum]] bounding the trade. PKs are
  * partition-stable here (LakeTable's default contract; LakeTable's
  * opt-in moved-row semi-join discovery would compose unchanged).
  *
  * Scale posture: a merge stages ONLY the touched partitions (static
  * partition predicates prune the current-version scan, as in LakeTable),
  * the log holds directory names (bounded by commits × partitions, never
  * rows), and version replay is driver-side string work.
  */
final case class VersionedTable(
    spark: SparkSession,
    path: String,
    pk: Seq[String],
    partitionCols: Seq[String] = Nil) {

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def logDir = new Path(s"$path/_log")
  private def dataDir = s"$path/data"
  private def vname(v: Int) = f"v$v%05d"

  def exists: Boolean = fs.exists(logDir) && fs.listStatus(logDir).nonEmpty

  /** Latest committed version; 0 = nothing committed yet. */
  def currentVersion: Int =
    if (!fs.exists(logDir)) 0
    else fs.listStatus(logDir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".log"))
      .map(_.stripPrefix("v").stripSuffix(".log").toInt)
      .foldLeft(0)(math.max)

  private case class LogEntry(
      action: String, adds: Seq[String], removes: Seq[String], schemaJson: Option[String])

  private def readLog(v: Int): LogEntry = {
    val bytes = {
      val in = fs.open(new Path(logDir, s"${vname(v)}.log"))
      try { val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        Iterator.continually(in.read(buf)).takeWhile(_ > 0).foreach(out.write(buf, 0, _))
        out.toByteArray
      } finally in.close()
    }
    val lines = new String(bytes, "UTF-8").split("\n").toSeq
    LogEntry(
      lines.collectFirst { case l if l.startsWith("action=") => l.stripPrefix("action=") }.getOrElse("?"),
      lines.filter(_.startsWith("add=")).map(_.stripPrefix("add=")),
      lines.filter(_.startsWith("remove=")).map(_.stripPrefix("remove=")),
      lines.collectFirst { case l if l.startsWith("schema=") => l.stripPrefix("schema=") })
  }

  /** Relative data dirs live at version `v` (log replay, driver-side). */
  private def liveDirs(v: Int): Seq[String] =
    (1 to v).foldLeft(Seq.empty[String]) { (live, i) =>
      val e = readLog(i)
      live.filterNot(e.removes.contains) ++ e.adds
    }

  /** (version, action, dirs added, dirs removed) per commit. */
  def history: Seq[(Int, String, Int, Int)] =
    (1 to currentVersion).map { v =>
      val e = readLog(v)
      (v, e.action, e.adds.length, e.removes.length)
    }

  def read: DataFrame = readVersion(currentVersion)

  /** The table exactly as of commit `v` — dirs are grouped by the version
    * root that wrote them so partition-column discovery gets a clean
    * basePath per group, then unioned by name (null-filling columns added
    * by later schema evolution).
    */
  def readVersion(v: Int): DataFrame = {
    require(v >= 1 && v <= currentVersion, s"version $v out of range 1..$currentVersion")
    val groups = liveDirs(v).groupBy(_.split("/")(0))
    if (groups.isEmpty) {
      // an empty commit is legal (e.g. overwrite with zero rows): the log
      // carries the schema, so the version reads as an empty frame
      val json = (v to 1 by -1).iterator.flatMap(readLog(_).schemaJson)
        .nextOption().getOrElse(sys.error(s"version $v has no data and no recorded schema"))
      val schema = org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val frames = groups.toSeq.sortBy(_._1).map { case (root, dirs) =>
      spark.read.option("mergeSchema", "true")
        .option("basePath", s"$dataDir/$root")
        .parquet(dirs.map(d => s"$dataDir/$d"): _*)
    }
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Stage `df` under a UNIQUE version root (uuid suffix: two racing
    * writers must never share a staging dir — the log create, not the dir
    * name, decides the winner); returns its relative leaf dirs (partition
    * leaves, or the root itself when unpartitioned).
    */
  private def stage(df: DataFrame, next: Int): (Path, Seq[String]) = {
    val rootName = s"${vname(next)}_${java.util.UUID.randomUUID().toString.take(8)}"
    val root = new Path(s"$dataDir/$rootName")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(root.toString)
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
        .flatMap(leaves(_, depth - 1))
    val qualified = fs.makeQualified(root)
    val rel = leaves(root, partitionCols.length).map { leaf =>
      rootName + fs.makeQualified(leaf).toUri.getPath
        .stripPrefix(qualified.toUri.getPath)
    }
    (root, rel)
  }

  /** Atomic commit: create of the log file claims version `next`; a loser
    * of the race deletes its staged dirs and fails fast. Only an
    * already-exists failure means the race was lost — any OTHER I/O error
    * after a successful claim (disk full mid-write) removes the
    * half-written log AND the staging, then rethrows, so no phantom
    * version is left behind.
    */
  private def commit(action: String, next: Int, adds: Seq[String],
                     removes: Seq[String], staged: Path, schemaJson: String): Unit = {
    fs.mkdirs(logDir)
    val logFile = new Path(logDir, s"${vname(next)}.log")
    val content =
      (Seq(s"action=$action", s"schema=$schemaJson") ++
        adds.map("add=" + _) ++ removes.map("remove=" + _)).mkString("\n")
    val out =
      try Some(fs.create(logFile, false)) // overwrite=false → atomic claim
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
        case e: java.io.IOException if e.getMessage != null &&
          e.getMessage.toLowerCase.contains("exist") => None
      }
    out match {
      case None =>
        fs.delete(staged, true)
        sys.error(s"concurrent writer: version $next was committed by another " +
          "writer; this commit's staging has been rolled back — retry on the new state")
      case Some(o) =>
        try { o.write(content.getBytes("UTF-8")); o.close() }
        catch { case e: Throwable =>
          scala.util.Try(o.close())
          fs.delete(logFile, false)
          fs.delete(staged, true)
          throw e
        }
    }
  }

  /** Full replace as a new version (old versions stay readable). */
  def overwrite(df: DataFrame): Unit = {
    val next = currentVersion + 1
    val (root, adds) = stage(df, next)
    commit("overwrite", next, adds, liveDirs(next - 1), root, df.schema.json)
  }

  /** Upsert on PK equality (anti-join ∪ updates, LakeTable's algebra);
    * creates the table if absent. Only the partitions TOUCHED by the batch
    * are read (static partition predicates) and restaged; untouched dirs
    * stay live from their original version.
    */
  def merge(updates: DataFrame): Unit = {
    require(pk.nonEmpty,
      "merge needs primary-key columns (an empty-key anti-join would be a cross join)")
    if (!exists) { overwrite(updates); return }
    val next = currentVersion + 1
    val current = read
    if (partitionCols.isEmpty) {
      val merged = current.join(updates.select(pk.map(col): _*), pk, "left_anti")
        .unionByName(updates, allowMissingColumns = true)
      val (root, adds) = stage(merged, next)
      commit("merge", next, adds, liveDirs(next - 1), root, merged.schema.json)
    } else {
      val touched = updates.select(partitionCols.map(col): _*).distinct().collect()
      val pred: Column = touched.map { r =>
        partitionCols.zipWithIndex
          .map { case (c, i) => col(c) <=> lit(r.get(i)) }
          .reduce(_ && _)
      }.reduceOption(_ || _).getOrElse(lit(false))
      val merged = current.filter(pred)
        .join(updates.select(pk.map(col): _*), pk, "left_anti")
        .unionByName(updates, allowMissingColumns = true)
      val (root, adds) = stage(merged, next)
      // a live dir is superseded iff its partition path matches a restaged
      // leaf's (partition-stable PKs: every touched partition is restaged)
      val newParts = adds.map(_.split("/", 2)(1)).toSet
      val removes = liveDirs(next - 1)
        .filter(d => newParts.contains(d.split("/", 2)(1)))
      commit("merge", next, adds, removes, root, merged.schema.json)
    }
  }

  /** Drop data dirs no retained version references. `retain = 1` keeps
    * only the current version readable; history metadata (the log) is
    * kept — only storage is reclaimed. A version root none of whose leaves
    * survive is deleted whole (including its `_SUCCESS` marker); a root
    * with surviving leaves loses only the unreferenced ones.
    */
  def vacuum(retain: Int = 1): Unit = {
    val cur = currentVersion
    val keepFrom = math.max(1, cur - retain + 1)
    val referenced = (keepFrom to cur).flatMap(liveDirs).toSet
    val referencedRoots = referenced.map(_.split("/")(0))
    val allAdds = (1 to cur).flatMap(v => readLog(v).adds)
    val (deadRootLeaves, mixedRootLeaves) = allAdds.filterNot(referenced.contains)
      .partition(d => !referencedRoots.contains(d.split("/")(0)))
    deadRootLeaves.map(_.split("/")(0)).distinct
      .foreach(r => fs.delete(new Path(s"$dataDir/$r"), true))
    mixedRootLeaves.foreach(d => fs.delete(new Path(s"$dataDir/$d"), true))
    // orphan staging roots from writers that crashed between stage() and
    // commit() appear in NO log entry — reclaim them too (like
    // LakeTable.vacuum's crashed-merge cleanup, only run with no writer
    // in flight)
    val committedRoots = allAdds.map(_.split("/")(0)).toSet
    val dataRoot = new Path(dataDir)
    if (fs.exists(dataRoot))
      fs.listStatus(dataRoot).map(_.getPath)
        .filterNot(p => committedRoots.contains(p.getName))
        .foreach(p => fs.delete(p, true))
  }
}
