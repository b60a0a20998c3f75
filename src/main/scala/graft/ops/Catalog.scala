package graft.ops

import graft.ext.{Multimodal, TextOps, VectorOps}

/** Aggregates every query group into the driver contract. */
object Catalog {
  val all: Seq[Q] = {
    val qs = Relational.queries ++ Coverage.queries ++
      TextOps.queries ++ VectorOps.queries ++ Multimodal.queries ++
      graft.streaming.StreamOps.queries
    val dups = qs.groupBy(_.name).filter(_._2.size > 1).keys
    require(dups.isEmpty, s"duplicate query names would clobber the driver maps: ${dups.mkString(",")}")
    qs
  }

  def queries = all.map(q => q.name -> q.run).toMap
  def oracleSql = all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
