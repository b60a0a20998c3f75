package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance: apply a batch of
  * attribute changes to a dimension that keeps full history as
  * (valid_from, valid_to, is_current) row versions — the warehouse-side
  * counterpart of the reference's upsert path (which keeps only latest;
  * /root/reference/scripts/glue/script.py merge semantics), for consumers
  * that must reconstruct "the dimension as of" any past effective time.
  *
  * Semantics per change row, keyed by `pk`:
  *  - attrs EQUAL to the key's current row (null-safe)  → no-op
  *  - attrs differ                                      → close the current
  *    row (`valid_to = effective`, `is_current = false`) and open a new
  *    current row (`valid_from = effective`)
  *  - key with no current row in the dimension          → open only
  * Historical (already-closed) rows always pass through untouched, as
  * does a malformed row whose `is_current` is NULL (it matches no change —
  * never silently dropped, never closed).
  *
  * Scale posture: ONE full-outer join on the PK does everything — the
  * dimension is scanned exactly once and shuffled exactly once (full
  * outer cannot broadcast); a changed key fans its joined row out into
  * (closed, opened) via an inline'd two-element array, so there is no
  * second pass to close superseded rows. The change batch must hold one
  * row per key (dedup upstream: [[Dedup]]).
  */
object Scd2 {

  /** `dim` columns: exactly pk ++ tracked ++ (valid_from, valid_to,
    * is_current); `changes` columns: pk ++ tracked. `effective` is the
    * change batch's effective time, cast to valid_from/valid_to's types.
    */
  def applyChanges(
      dim: DataFrame,
      changes: DataFrame,
      pk: Seq[String],
      tracked: Seq[String],
      effective: Column): DataFrame = {
    require(pk.nonEmpty && tracked.nonEmpty, "scd2 needs pk and tracked columns")
    val scdCols = Seq("valid_from", "valid_to", "is_current")
    val attrs = dim.columns.toSeq.filterNot(scdCols.contains)
    require(attrs.toSet == (pk ++ tracked).toSet,
      s"dim columns must be pk ++ tracked ++ (${scdCols.mkString(", ")}); " +
        s"untracked attribute columns are not supported")
    val vfT = dim.schema("valid_from").dataType
    val vtT = dim.schema("valid_to").dataType

    val d = dim.withColumn("__d", lit(1)).as("d")
    val c = changes.withColumn("__c", lit(1)).as("c")
    // only the key's CURRENT row pairs with its change row; history rows
    // (and NULL-is_current rows, where the condition is NULL → no match)
    // fall out as d-only and pass through unchanged
    val joinCond = pk.map(k => col(s"d.$k") === col(s"c.$k")).reduce(_ && _) &&
      col("d.is_current")
    val j = d.join(c, joinCond, "full")

    def row(fields: Seq[(String, Column)]): Column =
      struct(fields.map { case (n, cc) => cc.as(n) }: _*)
    val dAttrs = attrs.map(a => a -> col(s"d.$a"))
    val cAttrs = attrs.map(a => a -> col(s"c.$a"))
    val asis = row(dAttrs ++ Seq(
      "valid_from" -> col("d.valid_from"),
      "valid_to" -> col("d.valid_to"),
      "is_current" -> col("d.is_current")))
    val closed = row(dAttrs ++ Seq(
      "valid_from" -> col("d.valid_from"),
      "valid_to" -> effective.cast(vtT),
      "is_current" -> lit(false)))
    val opened = row(cAttrs ++ Seq(
      "valid_from" -> effective.cast(vfT),
      "valid_to" -> lit(null).cast(vtT),
      "is_current" -> lit(true)))
    val differs = tracked.map(a => !(col(s"c.$a") <=> col(s"d.$a"))).reduce(_ || _)

    val out =
      when(col("c.__c").isNull, array(asis))        // no change for this row
        .when(col("d.__d").isNull, array(opened))   // unseen (or current-less) key
        .when(differs, array(closed, opened))       // real change: close + open
        .otherwise(array(asis))                     // no-op change
    j.select(inline(out)).select(dim.columns.map(col).toSeq: _*)
  }
}
