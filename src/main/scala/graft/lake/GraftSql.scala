package graft.lake

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.lit

/** SQL DML surface for [[VersionedTable]] — the reference's user boundary
  * is plain SQL (Athena queries in its Step Function,
  * /root/reference/step_function_code.json:75,94,113), and Delta exposes
  * UPDATE/DELETE/MERGE INTO as SQL; without this, mutating a graft
  * versioned table requires Scala.
  *
  * Statements are parsed by SPARK'S OWN parser
  * (`sessionState.sqlParser.parsePlan` → the Catalyst `UpdateTable` /
  * `DeleteFromTable` / `MergeIntoTable` unresolved plans), so every
  * expression — conditions, assignment values, merge sources including
  * subqueries — gets real SQL parsing, not regex surgery; this object only
  * dispatches the parsed plan onto the corresponding [[VersionedTable]]
  * mutator. Anything that is not DML on a registered table passes through
  * to `spark.sql` untouched, so reads and DML mix at one entry point:
  *
  * {{{
  *   GraftSql.register(spark, "orders_v", table)
  *   GraftSql.run(spark, "UPDATE orders_v SET price = price * 1.1 WHERE yr = '1997'")
  *   GraftSql.run(spark, "MERGE INTO orders_v USING updates ON orders_v.id = updates.id " +
  *     "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *")
  *   GraftSql.run(spark, "SELECT count(*) FROM orders_v")   // plain spark.sql
  * }}}
  *
  * MERGE accepts exactly the shape [[VersionedTable.merge]] implements —
  * Delta's updateAll/insertAll form (`WHEN MATCHED THEN UPDATE SET * WHEN
  * NOT MATCHED THEN INSERT *`, no clause conditions) with an ON condition
  * that equates every primary-key column — and refuses anything else
  * rather than honoring it approximately.
  *
  * After each DML the table's CURRENT version is re-registered as the temp
  * view, so a following SELECT sees the mutation — the view is a lazy plan
  * over the new version's live dirs, not a materialization.
  */
object GraftSql {

  private val registry =
    scala.collection.concurrent.TrieMap.empty[String, VersionedTable]

  /** Register `table` for DML dispatch under `name`, and expose its
    * current version as a temp view of the same name for reads.
    */
  def register(spark: SparkSession, name: String, table: VersionedTable): Unit = {
    registry(name.toLowerCase) = table
    refreshView(spark, name)
  }

  private def refreshView(spark: SparkSession, name: String): Unit =
    registry(name.toLowerCase).read.createOrReplaceTempView(name)

  /** The registered table a DML statement targets, if any: a single-part
    * relation name (possibly aliased) matching the registry.
    */
  private def targetOf(p: LogicalPlan): Option[(String, VersionedTable)] = p match {
    case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
      val n = r.multipartIdentifier.head
      registry.get(n.toLowerCase).map(n -> _)
    case a: SubqueryAlias => targetOf(a.child)
    case _ => None
  }

  private def c(e: Expression) = GraftSqlBridge.columnOf(e)

  /** Column name of an assignment target (the parser yields an
    * UnresolvedAttribute; a qualified `t.price` assigns `price`).
    */
  private def nameOf(e: Expression): String = e match {
    case u: UnresolvedAttribute => u.nameParts.last
    case other => sys.error(s"unsupported assignment target: ${other.sql}")
  }

  /** Equality pairs (last-name, last-name) conjoined in `e` — the ON
    * condition validator for MERGE.
    */
  private def eqPairs(e: Expression): Seq[(String, String)] = e match {
    case And(l, r) => eqPairs(l) ++ eqPairs(r)
    case EqualTo(a: UnresolvedAttribute, b: UnresolvedAttribute) =>
      Seq((a.nameParts.last.toLowerCase, b.nameParts.last.toLowerCase))
    case _ => Seq.empty
  }

  /** One-row result frame for a DML statement, Delta-style. */
  private def dmlResult(spark: SparkSession, op: String, table: String,
                        version: Int): DataFrame = {
    import spark.implicits._
    Seq((op, table, version.toLong)).toDF("operation", "table", "version")
  }

  /** Run one SQL statement: DML on a registered versioned table dispatches
    * to the table API (returning a one-row operation/table/version frame);
    * everything else returns `spark.sql(sql)`.
    */
  def run(spark: SparkSession, sql: String): DataFrame = {
    val parsed =
      try spark.sessionState.sqlParser.parsePlan(sql)
      catch { case _: Exception => return spark.sql(sql) }
    parsed match {

      case d: DeleteFromTable =>
        targetOf(d.table) match {
          case None => spark.sql(sql)
          case Some((name, t)) =>
            t.delete(c(d.condition))
            refreshView(spark, name)
            dmlResult(spark, "delete", name, t.currentVersion)
        }

      case u: UpdateTable =>
        targetOf(u.table) match {
          case None => spark.sql(sql)
          case Some((name, t)) =>
            val sets = u.assignments.map(a => nameOf(a.key) -> c(a.value)).toMap
            t.update(u.condition.map(c).getOrElse(lit(true)), sets)
            refreshView(spark, name)
            dmlResult(spark, "update", name, t.currentVersion)
        }

      case m: MergeIntoTable =>
        targetOf(m.targetTable) match {
          case None => spark.sql(sql)
          case Some((name, t)) =>
            val okShape =
              m.matchedActions.forall {
                case UpdateStarAction(None) => true
                case _ => false
              } && m.notMatchedActions.forall {
                case InsertStarAction(None) => true
                case _ => false
              } && m.matchedActions.nonEmpty && m.notMatchedActions.nonEmpty
            require(okShape,
              "MERGE INTO a versioned table supports exactly 'WHEN MATCHED " +
                "THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *' " +
                "(primary-key upsert) — conditional or column-level clauses " +
                "are not honored")
            val pairs = eqPairs(m.mergeCondition)
            val missing = t.pk.filterNot(k =>
              pairs.contains((k.toLowerCase, k.toLowerCase)))
            require(missing.isEmpty,
              s"MERGE ON condition must equate every primary-key column; " +
                s"missing: ${missing.mkString(",")}")
            // the source may be any relation or subquery — analysis
            // resolves it from the session catalog
            val src = GraftSqlBridge.ofRows(spark, m.sourceTable)
            // project away source columns the table lacks (SET * / INSERT *
            // bind by name); merge itself null-fills table columns the
            // source omits
            val keep = src.columns.filter(cn =>
              t.tableSchema.fieldNames.exists(_.equalsIgnoreCase(cn)))
            t.merge(src.select(keep.map(org.apache.spark.sql.functions.col).toSeq: _*))
            refreshView(spark, name)
            dmlResult(spark, "merge", name, t.currentVersion)
        }

      case _ => spark.sql(sql)
    }
  }
}
