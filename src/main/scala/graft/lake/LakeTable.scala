package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * ONLY the partitions touched by the batch — touched = partitions of the
  * updates ∪ partitions of current rows whose PK appears in the batch (so a
  * row whose partition value changes is removed from its old partition).
  * The anti-join scans only those partitions (partition pruning on the
  * parquet scan), and the commit moves only those partition directories.
  * An unpartitioned table falls back to a full rewrite + directory swap.
  * Commit is rename-based (atomic per directory on HDFS-like filesystems,
  * not across directories) — a transaction log is what Delta adds on top;
  * out of scope here and documented as such.
  */
final case class LakeTable(
    spark: SparkSession,
    path: String,
    pk: Seq[String],
    partitionCols: Seq[String] = Nil) {

  private def fs: FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Explicit existence probe (replaces the reference's exception-driven
    * `DeltaTable.forPath` try/except, script.py:202-227).
    */
  def exists: Boolean = {
    val p = new Path(path)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  def read: DataFrame = spark.read.parquet(path)

  private def writeTo(df: DataFrame, dest: String, mode: String): Unit = {
    val w = df.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(dest)
  }

  /** Initial create / full replace (script.py:223-225). */
  def overwrite(df: DataFrame): Unit = writeTo(df, path, "overwrite")

  /** Append (the rejected-records sink pattern, script.py:190-192). */
  def append(df: DataFrame): Unit = writeTo(df, path, "append")

  /** Upsert `updates` on PK equality; creates the table if absent. */
  def merge(updates: DataFrame): Unit = {
    if (!exists) { overwrite(updates); return }
    if (partitionCols.nonEmpty) mergePartitioned(updates) else mergeFull(updates)
  }

  private def staging = s"$path.__staging_${java.util.UUID.randomUUID().toString.take(8)}"

  /** Unpartitioned: full rewrite into a staging dir, then swap. Staging is
    * required anyway — Spark refuses to overwrite a path it is reading.
    */
  private def mergeFull(updates: DataFrame): Unit = {
    val merged = read.join(updates.select(pk.map(col): _*), pk, "left_anti")
      .unionByName(updates)
    val tmp = staging
    writeTo(merged, tmp, "overwrite")
    swapDirs(tmp)
  }

  /** Partitioned: prune to touched partitions, merge, move only those
    * partition directories. Touched-partition discovery collects DISTINCT
    * partition values only — bounded by partition count, never by rows.
    */
  private def mergePartitioned(updates: DataFrame): Unit = {
    val current = read
    val pcols = partitionCols.map(col)
    // partitions receiving new/updated rows
    val fromUpdates = updates.select(pcols: _*).distinct()
    // partitions currently holding a row whose PK is being upserted (covers
    // rows whose partition value changes in the update)
    val fromCurrent = current.join(updates.select(pk.map(col): _*), pk, "left_semi")
      .select(pcols: _*).distinct()
    val touched = fromUpdates.union(fromCurrent).distinct()

    // Prune the expensive side: only touched partitions join the batch.
    val currentTouched = current.join(broadcast(touched), partitionCols, "left_semi")
    val merged = currentTouched
      .join(updates.select(pk.map(col): _*), pk, "left_anti")
      .unionByName(updates)

    val tmp = staging
    writeTo(merged, tmp, "overwrite")
    movePartitionDirs(tmp)
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
    * matching directory in the live table.
    */
  private def movePartitionDirs(tmp: String): Unit = {
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == 0) Seq(p)
      else fs.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath)
        .flatMap(leaves(_, depth - 1))
    val tmpRoot = new Path(tmp)
    leaves(tmpRoot, partitionCols.length).foreach { leaf =>
      val rel = leaf.toString.stripPrefix(tmpRoot.toString).stripPrefix("/")
      val dest = new Path(s"$path/$rel")
      if (fs.exists(dest)) fs.delete(dest, true)
      fs.mkdirs(dest.getParent)
      if (!fs.rename(leaf, dest)) sys.error(s"merge commit failed: cannot move $leaf")
    }
    fs.delete(tmpRoot, true)
  }
}
