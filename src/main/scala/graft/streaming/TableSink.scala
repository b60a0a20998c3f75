package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

import graft.lake.VersionedTable

/** Structured-streaming sink INTO a [[VersionedTable]] — the write-side
  * complement of [[TableChangesProvider]], closing the loop that q45/q68
  * previously closed with `foreachBatch { merge }` by hand.
  *
  * Exactly-once: every micro-batch commits through the table's txn
  * idempotency ledger (`txn = (appId, batchId)` — Delta's
  * txnAppId/txnVersion pattern, [[VersionedTable.merge]]). A batch
  * replayed after a sink-side crash — the engine re-calls addBatch with
  * the SAME batchId on restart — no-ops instead of double-applying, so
  * at-least-once delivery from the engine becomes exactly-once in the
  * table. `appId` defaults to the query's checkpoint location: stable
  * across restarts, distinct across queries. Append/Update modes upsert
  * the batch by primary key (merge); Complete mode replaces the table
  * (overwrite), matching the modes' contracts.
  *
  * Scale shape: each commit pays merge's partition-pruned restage on the
  * batch's touched partitions only — a streaming writer into a 100 TB
  * table pays per-batch cost, never a snapshot rewrite.
  */
final class TableSink(table: VersionedTable, appId: String,
                      mode: OutputMode) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is bound to the micro-batch's streaming plan —
    // rebind its rows as a batch frame before handing it to the writers
    // (whose joins/aggregations re-plan it), the standard V1 sink move
    val batch = GraftSqlBridge.asBatchFrame(data)
    if (mode == OutputMode.Complete()) table.overwrite(batch, txn = Some((appId, batchId)))
    else table.merge(batch, txn = Some((appId, batchId)))
  }

  override def toString: String = s"GraftTableSink[${table.path}]"
}

/** `writeStream.format("graft-table")` provider for [[TableSink]] —
  * options mirror [[TableChangesProvider]]: `path`, `pk`,
  * `partitionCols`, `recordCdf`, plus optional `txnAppId` to override the
  * idempotency-ledger key (defaults to `checkpointLocation`).
  */
final class TableSinkProvider extends StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-table"

  override def createSink(
      sqlContext: SQLContext, parameters: Map[String, String],
      partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    def list(k: String) =
      parameters.getOrElse(k, "").split(",").toSeq.filter(_.nonEmpty)
    val table = VersionedTable(
      sqlContext.sparkSession, parameters("path"), list("pk"),
      list("partitionCols"),
      recordCdf = parameters.get("recordCdf").exists(_.toBoolean))
    val appId = parameters.get("txnAppId")
      .orElse(parameters.get("checkpointLocation"))
      .getOrElse(sys.error(
        "graft-table sink needs a checkpointLocation (or explicit txnAppId) " +
          "— without a stable ledger key, replayed batches would double-apply"))
    new TableSink(table, appId, outputMode)
  }
}
