package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.quality.{Rule, Validator}

/** Mirrors and extends the reference suite
  * (/root/reference/tests/test_glue_etl.py:50-80): per-rule cases,
  * first-error-wins precedence, 3-valued FK logic, split semantics.
  */
class ValidatorSpec extends SparkSpec {
  import spark.implicits._

  private val ts = Timestamp.valueOf("2025-04-01 10:00:00")

  private def ordersRules = Seq(
    Rule.notNull("order_id", "Null order_id primary key"),
    Rule.notNull("order_timestamp", "Invalid timestamp"),
    Rule.positive("total_amount", "Non-positive total amount"))

  private def orders(rows: Seq[(Option[Int], Option[Timestamp], Option[Double])]): DataFrame =
    rows.toDF("order_id", "order_timestamp", "total_amount")

  private def errorsOf(df: DataFrame): Seq[Option[String]] =
    Validator.withErrors(df, ordersRules)
      .select(Validator.ErrorCol).as[Option[String]].collect().toSeq

  test("clean rows get null validation_errors") {
    assert(errorsOf(orders(Seq((Some(1), Some(ts), Some(10.0))))) == Seq(None))
  }

  // Reference case test_glue_etl.py:65-80: one valid, one negative amount.
  test("negative amount rejected, reference parity 1 valid / 1 rejected") {
    val df = orders(Seq(
      (Some(1), Some(ts), Some(100.0)),
      (Some(2), Some(ts), Some(-5.0))))
    val (valid, rejected) =
      Validator.split(Validator.withErrors(df, ordersRules), "orders")
    assert(valid.count() == 1 && rejected.count() == 1)
    assert(rejected.select(Validator.ErrorCol).as[String].head() == "Non-positive total amount")
  }

  test("zero amount rejected; null amount allowed (isNotNull guard)") {
    assert(errorsOf(orders(Seq((Some(1), Some(ts), Some(0.0))))) ==
      Seq(Some("Non-positive total amount")))
    assert(errorsOf(orders(Seq((Some(1), Some(ts), None)))) == Seq(None))
  }

  test("first-error-wins precedence: null PK beats null timestamp beats amount") {
    assert(errorsOf(orders(Seq((None, None, Some(-1.0))))) ==
      Seq(Some("Null order_id primary key")))
    assert(errorsOf(orders(Seq((Some(1), None, Some(-1.0))))) ==
      Seq(Some("Invalid timestamp")))
  }

  test("split: valid side drops error col, rejected keeps it plus audit cols") {
    val df = orders(Seq((Some(1), Some(ts), Some(10.0)), (None, Some(ts), Some(10.0))))
    val (valid, rejected) =
      Validator.split(Validator.withErrors(df, ordersRules), "orders")
    assert(!valid.columns.contains(Validator.ErrorCol))
    assert(rejected.columns.toSet
      .intersect(Set(Validator.ErrorCol, "rejection_time", "source")).size == 3)
    assert(rejected.select("source").as[String].head() == "orders")
  }

  test("row conservation: valid + rejected == input") {
    val df = orders(Seq(
      (Some(1), Some(ts), Some(10.0)), (None, Some(ts), Some(1.0)),
      (Some(3), None, None), (Some(4), Some(ts), Some(-2.0))))
    val (valid, rejected) =
      Validator.split(Validator.withErrors(df, ordersRules), "orders")
    assert(valid.count() + rejected.count() == df.count())
  }

  // Reference case test_glue_etl.py:50-63: valid items against parent keys.
  test("fkRule: members pass, misses flagged, 2-valid-items parity") {
    val items = Seq((1, Some(10)), (2, Some(20))).toDF("id", "order_id")
    val parents = Seq(10, 20).toDF("order_id")
    val (marked, rule) = Validator.fkRule(items, "order_id", parents, "order_id",
      "Invalid order_id reference")
    val out = Validator.withErrors(marked,
      Seq(Rule.notNull("id", "Null primary identifier"), rule))
    assert(out.filter(col(Validator.ErrorCol).isNull).count() == 2)
  }

  test("fkRule 3-valued logic: null FK is NOT an FK miss") {
    val items = Seq((Some(1), None: Option[Int]), (Some(2), Some(99)))
      .toDF("id", "order_id")
    val parents = Seq(10).toDF("order_id")
    val (marked, rule) = Validator.fkRule(items, "order_id", parents, "order_id",
      "Invalid order_id reference")
    val out = Validator.withErrors(marked, Seq(
      Rule.notNull("order_id", "Null order_id"), rule))
      .orderBy("id").select(Validator.ErrorCol).as[Option[String]].collect()
    // null FK → the null rule fires, never the FK rule; real miss → FK rule
    assert(out.toSeq == Seq(Some("Null order_id"), Some("Invalid order_id reference")))
  }

  test("fkRule precedence: FK miss never overwrites an earlier error") {
    val items = Seq((None: Option[Int], Some(99))).toDF("id", "order_id")
    val parents = Seq(10).toDF("order_id")
    val (marked, rule) = Validator.fkRule(items, "order_id", parents, "order_id",
      "Invalid order_id reference")
    val out = Validator.withErrors(marked, Seq(
      Rule.notNull("id", "Null primary identifier"), rule))
    assert(out.select(Validator.ErrorCol).as[String].head() == "Null primary identifier")
  }

  test("fkRule never duplicates child rows even when parent has duplicate keys") {
    val items = Seq((1, 10)).toDF("id", "order_id")
    val parents = Seq(10, 10, 10).toDF("order_id")
    val (marked, _) = Validator.fkRule(items, "order_id", parents, "order_id", "x")
    assert(marked.count() == 1)
  }

  test("empty input: no crash, zero/zero split (reference crashed at script.py:159)") {
    val df = orders(Nil)
    val (valid, rejected) =
      Validator.split(Validator.withErrors(df, ordersRules), "orders")
    assert(valid.count() == 0 && rejected.count() == 0)
  }
}
