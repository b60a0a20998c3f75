package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** A validation rule: when `violated` is true (null counts as false, per
  * Spark 3-valued `when` semantics) the row gets `error`. Rule ORDER is the
  * precedence mechanism — first error wins, exactly as the reference's
  * chained when/otherwise (/root/reference/scripts/glue/script.py:102-149).
  */
final case class Rule(violated: Column, error: String)

object Rule {
  /** "Null primary identifier"-style rules (script.py:104-107). */
  def notNull(colName: String, error: String): Rule =
    Rule(col(colName).isNull, error)

  /** "Non-positive total amount": only flags non-null values
    * (script.py:139 — `isNotNull & (col <= 0)`).
    */
  def positive(colName: String, error: String): Rule =
    Rule(col(colName).isNotNull && col(colName) <= 0, error)
}

/** Builds the reference's validation semantics engine-side.
  *
  * HOW changes vs the reference, WHAT preserved:
  *  - FK existence is a real left join against the (already validated,
  *    deduplicated) parent key set instead of a driver `collect()` +
  *    `isin(<list>)` (script.py:112-132) — the driver-side key list dies at
  *    100 TB; the join broadcasts when the parent is small and sort-merges
  *    when it is not (Catalyst/AQE decides).
  *  - A null FK never gets an FK error (3-valued logic: `~isin(list)` is
  *    null for null keys → `when` treats as false, script.py:118). Our
  *    marker predicate requires `fk IS NOT NULL`, same behavior.
  *  - FK rules never overwrite an earlier error (the reference guards with
  *    `validation_errors.isNull`, script.py:118,129); in a single ordered
  *    when-chain that guard is implied by rule order.
  */
object Validator {

  val ErrorCol = "validation_errors"

  private def fkOkCol(fkCol: String) = s"__fk_ok_$fkCol"

  /** Left-join a marker for FK existence; `Rule` for the miss. The parent
    * side is key-distinct so the join never duplicates child rows.
    */
  def fkRule(child: DataFrame, fkCol: String, parent: DataFrame, parentKey: String,
             error: String): (DataFrame, Rule) = {
    val keys = parent.select(col(parentKey).as(fkCol)).distinct()
      .withColumn(fkOkCol(fkCol), lit(true))
    val marked = child.join(keys, Seq(fkCol), "left")
    val rule = Rule(col(fkCol).isNotNull && col(fkOkCol(fkCol)).isNull, error)
    (marked, rule)
  }

  /** Append `validation_errors`: first rule whose predicate is true wins;
    * null when the row is clean. FK marker columns are dropped.
    */
  def withErrors(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val verdict = rules.foldRight(lit(null).cast(StringType): Column) {
      case (r, acc) => when(r.violated, lit(r.error)).otherwise(acc)
    }
    val markers = df.columns.filter(_.startsWith("__fk_ok_"))
    df.withColumn(ErrorCol, verdict).drop(markers.toSeq: _*)
  }

  /** Split into (valid — errors dropped, rejected — errors kept + audit
    * columns, script.py:152-153,182-183). Callers that consume both sides
    * should persist `validated` first: the reference recomputed the whole
    * cast+validate projection ~5× per dataset because it never cached
    * (SURVEY.md §4.4).
    *
    * `frozenClock` pins `rejection_time` to a fixed instant instead of
    * `current_timestamp()` — for reproducible runs and oracle-comparable
    * audit columns (idempotent re-runs stamp identically).
    */
  def split(validated: DataFrame, sourceName: String,
            frozenClock: Option[java.time.Instant] = None): (DataFrame, DataFrame) = {
    val valid = validated.filter(col(ErrorCol).isNull).drop(ErrorCol)
    val stamp = frozenClock.map(lit(_)).getOrElse(current_timestamp())
    val rejected = validated.filter(col(ErrorCol).isNotNull)
      .withColumn("rejection_time", stamp)
      .withColumn("source", lit(sourceName))
    (valid, rejected)
  }
}
