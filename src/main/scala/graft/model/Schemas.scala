package graft.model

import org.apache.spark.sql.types._

/** Declared entity schemas of the reference lakehouse
  * (see /root/reference/scripts/glue/script.py:62-90). Schema enforcement in
  * the reference is "permissive cast + null-check" — CSVs are read with
  * header=true and NO inferSchema (script.py:239,245,251), so every column
  * lands as string and is cast to these declared types; a failed cast yields
  * null, which the validation layer catches (graft.quality.Validator).
  *
  * Money stays DoubleType for reference parity (script.py:81); swap to
  * DecimalType(12,2) here if exact-money semantics are ever needed — nothing
  * else in the engine assumes Double.
  */
object Schemas {

  /** orders — PK order_id, partition column `date` (script.py:76-83,195,199). */
  val orders: StructType = StructType(Seq(
    StructField("order_num", IntegerType, nullable = true),
    StructField("order_id", IntegerType, nullable = true), // PK; business rule catches nulls
    StructField("user_id", IntegerType, nullable = true),
    StructField("order_timestamp", TimestampType, nullable = true),
    StructField("total_amount", DoubleType, nullable = true),
    StructField("date", DateType, nullable = true)
  ))

  /** order_items — PK id, FKs order_id/product_id, partition `date`
    * (script.py:64-74,112-132).
    */
  val orderItems: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = true),
    StructField("order_id", IntegerType, nullable = true),
    StructField("user_id", IntegerType, nullable = true),
    StructField("days_since_prior_order", IntegerType, nullable = true),
    StructField("product_id", IntegerType, nullable = true),
    StructField("add_to_cart_order", IntegerType, nullable = true),
    StructField("reordered", IntegerType, nullable = true),
    StructField("order_timestamp", TimestampType, nullable = true),
    StructField("date", DateType, nullable = true)
  ))

  /** products — PK product_id, partition `department` (script.py:85-90,199). */
  val products: StructType = StructType(Seq(
    StructField("product_id", IntegerType, nullable = true),
    StructField("department_id", IntegerType, nullable = true),
    StructField("department", StringType, nullable = true),
    StructField("product_name", StringType, nullable = true)
  ))

  /** Rejected-records schema: source columns + audit columns
    * (script.py:97,182-183).
    */
  def rejected(source: StructType): StructType = StructType(
    source.fields.toSeq ++ Seq(
      StructField("validation_errors", StringType, nullable = true),
      StructField("rejection_time", TimestampType, nullable = true),
      StructField("source", StringType, nullable = true)
    )
  )

  // Typed facades for Dataset[T] use where compile-time field checks help.
  final case class Order(
      order_num: Option[Int],
      order_id: Option[Int],
      user_id: Option[Int],
      order_timestamp: Option[java.sql.Timestamp],
      total_amount: Option[Double],
      date: Option[java.sql.Date])

  final case class OrderItem(
      id: Option[Int],
      order_id: Option[Int],
      user_id: Option[Int],
      days_since_prior_order: Option[Int],
      product_id: Option[Int],
      add_to_cart_order: Option[Int],
      reordered: Option[Int],
      order_timestamp: Option[java.sql.Timestamp],
      date: Option[java.sql.Date])

  final case class Product(
      product_id: Option[Int],
      department_id: Option[Int],
      department: Option[String],
      product_name: Option[String])
}
