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
  *  - key not in the dimension                          → open only
  * Historical (already-closed) rows always pass through untouched.
  *
  * Scale posture: two equi-joins on the PK (detect + close) and unions —
  * no windows, no driver-side state; a small change batch broadcasts, so
  * the dimension itself is scanned once and never shuffled. The change
  * batch must hold one row per key (dedup upstream: [[Dedup]]).
  */
object Scd2 {

  /** `dim` columns: pk ++ tracked ++ (valid_from, valid_to, is_current);
    * `changes` columns: pk ++ tracked. `effective` is the change batch's
    * effective time, typed like valid_from/valid_to.
    */
  def applyChanges(
      dim: DataFrame,
      changes: DataFrame,
      pk: Seq[String],
      tracked: Seq[String],
      effective: Column): DataFrame = {
    require(pk.nonEmpty && tracked.nonEmpty, "scd2 needs pk and tracked columns")
    val validToType = dim.schema("valid_to").dataType
    val cur = dim.filter(col("is_current"))
    val hist = dim.filter(!col("is_current"))

    val joinCond = pk.map(k => col(s"c.$k") === col(s"d.$k")).reduce(_ && _)
    val isNew = col(s"d.${pk.head}").isNull
    val differs = tracked.map(c => !(col(s"c.$c") <=> col(s"d.$c"))).reduce(_ || _)
    // rows to open: new keys, and keys whose tracked attrs changed
    val opened = changes.as("c").join(cur.as("d"), joinCond, "left")
      .filter(isNew || differs)
      .select((pk ++ tracked).map(c => col(s"c.$c").as(c)): _*)
      .withColumn("valid_from", effective)
      .withColumn("valid_to", lit(null).cast(validToType))
      .withColumn("is_current", lit(true))
    val changedKeys = opened.select(pk.map(col): _*)
    // current rows superseded by an opened row close; the rest pass through
    val closed = cur.join(changedKeys, pk, "left_semi")
      .withColumn("valid_to", effective)
      .withColumn("is_current", lit(false))
    val untouched = cur.join(changedKeys, pk, "left_anti")
    hist.unionByName(untouched).unionByName(closed)
      .unionByName(opened.select(dim.columns.map(col).toSeq: _*))
  }
}
