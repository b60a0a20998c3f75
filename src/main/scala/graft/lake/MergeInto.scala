package graft.lake

import org.apache.spark.sql.{Column, DataFrame}

/** Delta-style conditional MERGE builder over [[VersionedTable]] — the
  * clause surface beyond [[VersionedTable.merge]]'s updateAll/insertAll
  * upsert:
  *
  * {{{
  *   table.mergeInto(source)                       // aliases default t / s
  *     .whenMatched(expr("s.price > t.price")).updateAll()
  *     .whenMatched().delete()
  *     .whenNotMatched().insertAll()
  *     .whenNotMatchedBySource(expr("t.stale")).delete()
  *     .execute()
  * }}}
  *
  * Clause conditions and assignment values are Columns over the aliased
  * sides (`t`.* / `s`.* by default). Clauses evaluate in declaration order
  * per row class — the FIRST satisfied clause acts, later ones are ignored
  * (Delta's rule); a row no clause claims keeps (matched/target-only) or
  * drops (source-only). Execution, staging, conflict retry, constraints,
  * generated columns and change recording are all
  * [[VersionedTable.executeMergeInto]]'s — this class only accumulates
  * clauses.
  */
final class MergeIntoBuilder private[lake] (
    table: VersionedTable, source: DataFrame,
    targetAlias: String, sourceAlias: String) {
  import MergeIntoBuilder._

  private val clauses = scala.collection.mutable.Buffer.empty[Clause]

  /** Clause set for matched rows; `cond` narrows which matches it claims. */
  def whenMatched(cond: Column = null): MatchedClause =
    new MatchedClause(Option(cond))
  /** Clause set for source rows with no target match. */
  def whenNotMatched(cond: Column = null): NotMatchedClause =
    new NotMatchedClause(Option(cond))
  /** Clause set for target rows with no source match (Delta's WHEN NOT
    * MATCHED BY SOURCE) — forces a full-table restage, see
    * [[VersionedTable.executeMergeInto]].
    */
  def whenNotMatchedBySource(cond: Column = null): BySourceClause =
    new BySourceClause(Option(cond))

  final class MatchedClause private[MergeIntoBuilder] (cond: Option[Column]) {
    def updateAll(): MergeIntoBuilder =
      add(Clause(MatchedUpdateAll, cond, Map.empty))
    def update(set: Map[String, Column]): MergeIntoBuilder =
      add(Clause(MatchedUpdate, cond, set))
    def delete(): MergeIntoBuilder =
      add(Clause(MatchedDelete, cond, Map.empty))
  }
  final class NotMatchedClause private[MergeIntoBuilder] (cond: Option[Column]) {
    def insertAll(): MergeIntoBuilder =
      add(Clause(NotMatchedInsertAll, cond, Map.empty))
    def insert(set: Map[String, Column]): MergeIntoBuilder =
      add(Clause(NotMatchedInsert, cond, set))
  }
  final class BySourceClause private[MergeIntoBuilder] (cond: Option[Column]) {
    def update(set: Map[String, Column]): MergeIntoBuilder =
      add(Clause(BySourceUpdate, cond, set))
    def delete(): MergeIntoBuilder =
      add(Clause(BySourceDelete, cond, Map.empty))
  }

  private def add(c: Clause): MergeIntoBuilder = { clauses += c; this }

  private var evolve = false

  /** Delta's `WITH SCHEMA EVOLUTION`: source-only columns join the
    * target schema (pre-existing rows read them as NULL).
    */
  def withSchemaEvolution(): MergeIntoBuilder = { evolve = true; this }

  /** Stage, validate and commit the merge (see
    * [[VersionedTable.executeMergeInto]]).
    */
  def execute(maxAttempts: Int = 5): Unit =
    table.executeMergeInto(source, targetAlias, sourceAlias,
      clauses.toSeq, maxAttempts, evolveSchema = evolve)
}

object MergeIntoBuilder {
  /** Clause kinds, split by the row class they act on. */
  sealed trait Kind { def isDelete: Boolean = false }
  sealed trait MatchedKind extends Kind
  sealed trait NotMatchedKind extends Kind
  sealed trait BySourceKind extends Kind
  case object MatchedUpdateAll extends MatchedKind
  case object MatchedUpdate extends MatchedKind
  case object MatchedDelete extends MatchedKind { override def isDelete = true }
  case object NotMatchedInsertAll extends NotMatchedKind
  case object NotMatchedInsert extends NotMatchedKind
  case object BySourceUpdate extends BySourceKind
  case object BySourceDelete extends BySourceKind { override def isDelete = true }

  private[lake] final case class Clause(
      kind: Kind, cond: Option[Column], set: Map[String, Column])
}
