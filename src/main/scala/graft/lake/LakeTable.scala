package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A partitioned-Parquet-backed table with Delta-style upsert semantics.
  *
  * The reference upserts via Delta MERGE `whenMatchedUpdateAll /
  * whenNotMatchedInsertAll` on PK equality (/root/reference/scripts/glue/
  * script.py:204-214) with an exception-driven create fallback
  * (script.py:217-227). No Delta jars ship in /opt/spark/jars, so we
  * re-express the semantics over plain Parquet:
  *
  *   merge(updates) ≡ (current LEFT ANTI JOIN updates ON pk) UNION updates
  *
  * — a full-row update means updates always win, which is exactly the
  * anti-join ∪ updates formulation. Updates are PK-deduplicated first
  * (same invariant the reference relies on, script.py:196, which makes the
  * Delta "multiple source rows match" error unreachable).
  *
  * Scale posture (100 TB): when the table is partitioned, merge rewrites
  * ONLY the partitions touched by the batch.
  *
  *  - Default (`movedRowsPossible = false`): PKs are declared
  *    partition-stable — an update never changes a row's partition value
  *    (true for the reference: the partition column `date` derives from the
  *    immutable order_timestamp). Touched = the updates' own partitions, a
  *    DISTINCT over the (small) batch; the current-table scan is pruned
  *    with STATIC partition predicates built from that list, so the merge
  *    never scans the full table. This is the 100 TB path.
  *  - Opt-in (`movedRowsPossible = true`): a PK may move partitions, so
  *    touched additionally includes partitions currently holding an
  *    updated PK (one semi-join over the table — the documented cost of
  *    allowing moves), discovered together with the exact live partition
  *    directories holding those rows via input_file_name(). A live touched
  *    partition with ZERO surviving rows produces no staging leaf; those
  *    directories are deleted at commit (otherwise the old copy of a moved
  *    row would survive — round-1 stale-partition bug).
  *
  * An unpartitioned table falls back to a full rewrite + directory swap.
  * Commit is rename-based (atomic per directory on HDFS-like filesystems,
  * not across directories) — a transaction log is what Delta adds on top;
  * out of scope here (see [[VersionedTable]] for the logged variant).
  * Instead the single-writer contract is ENFORCED for every mutator:
  * an atomic lock-file create fences merge, compact, overwrite AND append
  * commits, and a second concurrent writer fails fast instead of
  * interleaving (see [[withCommitLock]]).
  */
final case class LakeTable(
    spark: SparkSession,
    path: String,
    pk: Seq[String],
    partitionCols: Seq[String] = Nil,
    movedRowsPossible: Boolean = false) {

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Explicit existence probe (replaces the reference's exception-driven
    * `DeltaTable.forPath` try/except, script.py:202-227).
    */
  def exists: Boolean = {
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** mergeSchema because evolved merges rewrite only touched partitions —
    * untouched files keep the pre-evolution footer and their missing
    * columns must read as null.
    */
  def read: DataFrame = spark.read.option("mergeSchema", "true").parquet(path)

  /** Optimized write (Delta's optimizeWrite shape): partitioned batches
    * hash-cluster on the partition key BEFORE partitionBy, so each
    * partition value lands in ONE task and writes ONE file — a raw
    * partitionBy over N shuffle partitions otherwise fans every dir into
    * up to N tiny files, and EVERY downstream read (FK joins, catalog
    * registration, smoke queries) pays listing + footer per file. Trade:
    * one task per partition value per batch — right for this pipeline's
    * bounded daily batches; a giant single-partition batch should
    * pre-split upstream and [[compact]] re-sizes later either way.
    */
  private def writeTo(df: DataFrame, dest: String, mode: String): Unit = {
    val clustered =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df
    val w = clustered.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(dest)
  }

  private def lockPath = new Path(s"$path.__lock")

  /** Single-writer commit guard. Delta serializes writers through its
    * transaction log (script.py:31-32 gets this for free); plain Parquet
    * has no log, so two concurrent merges could interleave partition-dir
    * moves and corrupt the table. We make the contract explicit instead:
    * an atomic lock-file create fences the commit, and a second writer
    * FAILS FAST with a clear error rather than interleaving. A lock left
    * by a crashed writer is removed by [[vacuum]].
    */
  private def withCommitLock[T](op: => T): T = {
    val parent = lockPath.getParent
    if (parent != null && !fs.exists(parent)) fs.mkdirs(parent)
    // claim must be ATOMIC create-if-absent, not exists-then-create: local
    // paths go through O_CREAT|O_EXCL (java.nio), HDFS-likes through
    // create(overwrite=false) which is atomic there and raises
    // FileAlreadyExistsException on contention. (Object stores without
    // atomic create are outside this class's contract.)
    // getScheme's FileSystem base-class default THROWS — Try keeps an
    // exotic filesystem on the create(overwrite=false) fallback instead of
    // failing every commit (same guard as VersionedTable.isLocalFs)
    val claimed =
      if (scala.util.Try(fs.getScheme).toOption.contains("file"))
        try {
          java.nio.file.Files.createFile(java.nio.file.Paths.get(lockPath.toUri.getPath))
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
      else
        try { fs.create(lockPath, false).close(); true }
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          // a generic IOException is contention ONLY if the lock verifiably
          // exists — "Parent directory does not exist" and friends are real
          // faults and must not be masked as a concurrent writer
          case e: java.io.IOException if fs.exists(lockPath) => false
        }
    if (!claimed)
      sys.error(s"concurrent writer: $lockPath exists. LakeTable commits are " +
        "single-writer by contract (a transaction log is what Delta adds); " +
        "if the previous writer crashed, vacuum() clears the stale lock")
    try op finally fs.delete(lockPath, false)
  }

  /** Initial create / full replace (script.py:223-225). Takes the commit
    * lock: an overwrite racing a merge's staging/dir-swap would otherwise
    * interleave with it and corrupt the table — the single-writer contract
    * covers EVERY mutator, not just merge/compact.
    */
  def overwrite(df: DataFrame): Unit = withCommitLock(overwriteUnlocked(df))

  /** Lock-free body for callers already inside [[withCommitLock]] (the
    * lock-file claim is not re-entrant — merge's create-if-absent path
    * would deadlock against its own lock).
    */
  private def overwriteUnlocked(df: DataFrame): Unit = writeTo(df, path, "overwrite")

  /** Append (the rejected-records sink pattern, script.py:190-192). Locked
    * for the same reason as [[overwrite]].
    */
  def append(df: DataFrame): Unit = withCommitLock(writeTo(df, path, "append"))

  /** Compact the table's files to ~`targetFileRows` rows per file (Delta
    * OPTIMIZE's job, which raw Parquet doesn't get for free): repeated
    * small appends/merges leave many tiny files; a full-table streaming
    * read + coalesced rewrite restores healthy file sizes. At 100 TB run
    * per partition on a schedule; here the whole (small) table is rewritten
    * through the same atomic swap/move path as merge.
    */
  def compact(targetFileRows: Long = 1024 * 1024): Unit = withCommitLock {
    if (exists) {
      val current = read
      val rows = current.count()
      val files = math.max(1, math.ceil(rows.toDouble / targetFileRows).toInt)
      val tmp = staging
      val repacked =
        if (partitionCols.nonEmpty) current.repartition(files, partitionCols.map(col): _*)
        else current.repartition(files)
      writeTo(repacked, tmp, "overwrite")
      swapDirs(tmp)
    }
  }

  /** Delete leftover `.__staging_*` / `.__old_*` directories and the
    * `.__lock` file from crashed merges (Delta VACUUM's crash-cleanup role;
    * we have no retention log, so this removes every orphan unconditionally
    * — only run when no merge is in flight).
    */
  def vacuum(): Unit = {
    val parent = new Path(path).getParent
    val prefix = new Path(path).getName
    if (parent != null && fs.exists(parent))
      fs.listStatus(parent).toSeq
        .map(_.getPath)
        .filter { p =>
          val n = p.getName
          n.startsWith(s"$prefix.__staging_") || n.startsWith(s"$prefix.__old_") ||
            n == s"$prefix.__lock"
        }
        .foreach(p => fs.delete(p, true))
  }

  /** Upsert `updates` on PK equality; creates the table if absent.
    * Schema evolution: columns present in only one side are null-filled on
    * the other (Delta's mergeSchema semantics for added columns) — new
    * columns must not be partition columns.
    */
  def merge(updates: DataFrame): Unit = {
    require(pk.nonEmpty,
      "merge needs primary-key columns (an empty-key anti-join would be a cross join); " +
        "PK-less sinks should append")
    withCommitLock {
      if (!exists) overwriteUnlocked(updates)
      else if (partitionCols.nonEmpty) mergePartitioned(updates)
      else mergeFull(updates)
    }
  }

  /** Align two frames on the union of their columns, null-filling gaps —
    * the (current, updates) pair for an evolving merge.
    */
  private def evolved(current: DataFrame, updates: DataFrame): (DataFrame, DataFrame) = {
    val curCols = current.columns.toSeq
    val updCols = updates.columns.toSeq
    val all = curCols ++ updCols.filterNot(curCols.contains)
    def widen(df: DataFrame, have: Seq[String], other: DataFrame) = {
      val missing = all.filterNot(have.contains)
      missing.foldLeft(df) { (d, c) =>
        d.withColumn(c, lit(null).cast(other.schema(c).dataType))
      }.select(all.map(col): _*)
    }
    (widen(current, curCols, updates), widen(updates, updCols, current))
  }

  private def staging = s"$path.__staging_${java.util.UUID.randomUUID().toString.take(8)}"

  /** Unpartitioned: full rewrite into a staging dir, then swap. Staging is
    * required anyway — Spark refuses to overwrite a path it is reading.
    */
  private def mergeFull(updates: DataFrame): Unit = {
    val (cur, upd) = evolved(read, updates)
    val merged = cur.join(upd.select(pk.map(col): _*), pk, "left_anti")
      .unionByName(upd)
    val tmp = staging
    writeTo(merged, tmp, "overwrite")
    swapDirs(tmp)
  }

  /** Static one-partition predicate (p1=v1 AND p2=v2) per touched tuple —
    * literal filters so the parquet scan partition-prunes (visible as
    * PartitionFilters in .explain), unlike a runtime semi-join.
    */
  private def touchedPredicate(touched: Array[org.apache.spark.sql.Row]): Column =
    touched.map { r =>
      partitionCols.zipWithIndex
        .map { case (c, i) => col(c) <=> lit(r.get(i)) }
        .reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))

  /** Partitioned merge: prune to touched partitions, merge, move only those
    * partition directories.
    */
  private def mergePartitioned(rawUpdates: DataFrame): Unit = {
    val (current, updates) = evolved(read, rawUpdates)
    val pcols = partitionCols.map(col)
    // Partitions receiving new/updated rows: DISTINCT over the batch only —
    // bounded by partition count, never by table size.
    val fromUpdates = updates.select(pcols: _*).distinct().collect()

    // Opt-in moved-row handling: find live partitions (and their exact
    // directories) currently holding an upserted PK. This is the only path
    // that scans beyond the batch's own partitions.
    val staleCandidateDirs: Seq[Path] =
      if (!movedRowsPossible) Nil
      else current.join(updates.select(pk.map(col): _*), pk, "left_semi")
        .select(input_file_name().as("f")).distinct()
        .collect().map(r => new Path(r.getString(0)).getParent).distinct.toSeq

    val touched: Array[org.apache.spark.sql.Row] =
      if (!movedRowsPossible) fromUpdates
      else {
        val fromCurrent = current.join(updates.select(pk.map(col): _*), pk, "left_semi")
          .select(pcols: _*).distinct().collect()
        (fromUpdates ++ fromCurrent).distinct
      }

    val currentTouched = current.filter(touchedPredicate(touched))
    val merged = currentTouched
      .join(updates.select(pk.map(col): _*), pk, "left_anti")
      .unionByName(updates)

    val tmp = staging
    writeTo(merged, tmp, "overwrite")
    movePartitionDirs(tmp, staleCandidateDirs)
  }

  private def swapDirs(tmp: String): Unit = {
    val target = new Path(path)
    val trash = new Path(s"$path.__old_${java.util.UUID.randomUUID().toString.take(8)}")
    if (!fs.rename(target, trash)) sys.error(s"merge commit failed: cannot move $target aside")
    if (!fs.rename(new Path(tmp), target)) {
      fs.rename(trash, target) // roll back
      sys.error(s"merge commit failed: cannot move $tmp into place")
    }
    fs.delete(trash, true)
  }

  /** Move every `part=value[/...]` leaf directory from staging over the
    * matching directory in the live table; then delete live directories
    * that held an updated PK but got no staging counterpart (zero
    * survivors after a partition-changing update).
    */
  private def movePartitionDirs(tmp: String, staleCandidates: Seq[Path]): Unit = {
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
        .flatMap(leaves(_, depth - 1))
    val tmpRoot = new Path(tmp)
    // Scheme-independent relative path (input_file_name yields qualified
    // file:/... URIs while `path` may be a bare local path).
    def rel(p: Path, root: Path): String =
      p.toUri.getPath.stripPrefix(root.toUri.getPath).stripPrefix("/")
    val qualifiedTmp = fs.makeQualified(tmpRoot)
    // The per-leaf delete+mkdirs+rename round-trips are driver-side and
    // latency-bound (3 metadata RPCs each on a real filesystem); a merge
    // touching hundreds of partitions would serialize them. Run the leaf
    // moves on a bounded pool — leaves are distinct directories, so the
    // moves are independent (mkdirs on a shared parent is idempotent), and
    // Hadoop FileSystem instances are thread-safe. Every started task is
    // AWAITED before any failure is surfaced: interrupting a sibling
    // (shutdownNow) could kill it between its dest-delete and its rename,
    // leaving a partition removed from the table but never replaced —
    // a worse outcome than finishing the remaining moves.
    val allLeaves = leaves(tmpRoot, partitionCols.length)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(16, allLeaves.size)))
    var tasks = Seq.empty[java.util.concurrent.Future[String]]
    val moved =
      try {
        tasks = allLeaves.map { leaf =>
          pool.submit(new java.util.concurrent.Callable[String] {
            override def call(): String = {
              val r = rel(leaf, qualifiedTmp)
              val dest = new Path(s"$path/$r")
              if (fs.exists(dest)) fs.delete(dest, true)
              fs.mkdirs(dest.getParent)
              if (!fs.rename(leaf, dest)) sys.error(s"merge commit failed: cannot move $leaf")
              r
            }
          })
        }
        val results = tasks.map { t =>
          try Right(t.get())
          catch { case e: java.util.concurrent.ExecutionException => Left(e.getCause) }
        }
        results.collectFirst { case Left(e) => e }.foreach(throw _)
        results.collect { case Right(r) => r }.toSet
      } finally {
        // Normal path: every task was awaited above, this falls straight
        // through. Abrupt exit (caller interrupted inside t.get): drop the
        // NOT-yet-started movers (cancel(false) never interrupts a running
        // one), then wait out the in-flight movers UNINTERRUPTIBLY —
        // killing one between its dest-delete and its rename would leave a
        // partition removed from the table and never replaced. The wait is
        // bounded; only on timeout are workers force-stopped, and a
        // swallowed interrupt is re-asserted for the caller.
        tasks.foreach(_.cancel(false))
        pool.shutdown()
        val deadline = System.nanoTime() +
          java.util.concurrent.TimeUnit.MINUTES.toNanos(10)
        var interrupted = false
        var done = pool.isTerminated
        while (!done && System.nanoTime() < deadline) {
          try done = pool.awaitTermination(1, java.util.concurrent.TimeUnit.SECONDS)
          catch { case _: InterruptedException => interrupted = true }
        }
        if (!done) pool.shutdownNow()
        if (interrupted) Thread.currentThread().interrupt()
      }
    val qualifiedRoot = fs.makeQualified(new Path(path))
    staleCandidates
      .filter(d => !moved.contains(rel(d, qualifiedRoot)))
      .foreach(d => fs.delete(d, true))
    fs.delete(tmpRoot, true)
  }
}
