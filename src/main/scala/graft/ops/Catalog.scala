package graft.ops

import graft.ext.{Multimodal, TextOps, VectorOps}

/** Aggregates every query group into the driver contract. */
object Catalog {
  val all: Seq[Q] =
    Relational.queries ++ Coverage.queries ++
      TextOps.queries ++ VectorOps.queries ++ Multimodal.queries ++
      graft.streaming.StreamOps.queries

  def queries = all.map(q => q.name -> q.run).toMap
  def oracleSql = all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
