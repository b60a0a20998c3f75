package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Primary-key deduplication.
  *
  * The reference uses `dropDuplicates([pk])` (/root/reference/scripts/glue/
  * script.py:196), which keeps an ARBITRARY row per key — fine for its
  * upsert (rows are identical dupes in practice) but useless against an
  * oracle. `deterministic` keeps the first row per key under an explicit
  * tiebreaker ordering, via row_number over a hash-partitioned window: one
  * shuffle on the key, same as dropDuplicates, no extra cost class.
  */
object Dedup {

  /** Reference-parity dedup (arbitrary survivor). */
  def arbitrary(df: DataFrame, pk: Seq[String]): DataFrame =
    df.dropDuplicates(pk)

  /** Deterministic dedup: survivor = first row per key ordered by
    * `tiebreak`. Use for anything oracle-compared.
    */
  def deterministic(df: DataFrame, pk: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
