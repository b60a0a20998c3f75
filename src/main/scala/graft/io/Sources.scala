package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Readers + schema enforcement.
  *
  * The reference reads bronze CSVs with header=true and no inferSchema
  * (/root/reference/scripts/glue/script.py:239,245,251) so all columns are
  * strings, then casts column-by-column to the declared schema
  * (script.py:169-171); a failed cast yields null (permissive-cast
  * semantics), caught later by validation. We reproduce that with try_cast
  * so the behavior is independent of spark.sql.ansi.enabled, and as ONE
  * select projection instead of N stacked withColumns (one Project node;
  * Catalyst would collapse them anyway but this keeps plans readable).
  */
object Sources {

  /** Bronze CSV scan: header, everything string (reference parity). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").csv(path)

  /** Cast every schema field with null-on-failure semantics, in declared
    * order, dropping columns not in the schema. Single projection.
    */
  def castTo(df: DataFrame, schema: StructType): DataFrame = {
    val cols = schema.fields.map { f =>
      expr(s"try_cast(`${f.name}` AS ${f.dataType.sql})").as(f.name)
    }
    df.select(cols.toSeq: _*)
  }

  /** CSV with declared-schema enforcement (scan + cast, still lazy). */
  def csvWithSchema(spark: SparkSession, path: String, schema: StructType): DataFrame =
    castTo(csv(spark, path), schema)

  /** One driver-testdata table: `<dir>/<name>.parquet`. Column pruning and
    * predicate pushdown reach the parquet scan because this stays a plain
    * relation (check PushedFilters/ReadSchema in .explain).
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
