package graft.ops

import graft.ext.{Multimodal, TextOps, VectorOps}

/** Aggregates every query group into the driver contract. */
object Catalog {
  val all: Seq[Q] =
    Relational.queries ++ TextOps.queries ++ VectorOps.queries ++ Multimodal.queries

  def queries = all.map(q => q.name -> q.run).toMap
  def oracleSql = all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
