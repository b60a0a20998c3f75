package graft

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks the latest right row at or before each left ts") {
    val quotes = Seq( // key, ts, price
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 30L, 3.0),
      ("B", 15L, 9.0)).toDF("sym", "ts", "price")
    val trades = Seq( // key, ts, qty
      ("A", 5L, 100L),  // before any quote → null
      ("A", 20L, 200L), // exactly at quote ts → matches 2.0
      ("A", 25L, 300L), // between → 2.0
      ("A", 99L, 400L), // after all → 3.0
      ("B", 14L, 500L), // before B's only quote → null
      ("C", 50L, 600L)) // key with no quotes at all → null
      .toDF("sym", "ts", "qty")

    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts")
      .as[(String, Long, Long, Option[Double])].collect().toSet
    assert(out == Set(
      ("A", 5L, 100L, None),
      ("A", 20L, 200L, Some(2.0)),
      ("A", 25L, 300L, Some(2.0)),
      ("A", 99L, 400L, Some(3.0)),
      ("B", 14L, 500L, None),
      ("C", 50L, 600L, None)))
  }

  test("null join keys never match (SQL equi-join semantics)") {
    // null-keyed rows exist on BOTH sides: the null left row must keep its
    // row but get a null payload (never the null-keyed right row's price),
    // matching how an SQL equi-join treats NULL = NULL
    val quotes = Seq((Option("A"), 10L, 1.0), (Option.empty[String], 5L, 9.9))
      .toDF("sym", "ts", "price")
    val trades = Seq((Option("A"), 20L, 100L), (Option.empty[String], 20L, 200L))
      .toDF("sym", "ts", "qty")
    val out = AsofJoin.asofJoin(trades, quotes, Seq("sym"), "ts")
      .as[(Option[String], Long, Long, Option[Double])].collect().toSet
    assert(out == Set(
      (Some("A"), 20L, 100L, Some(1.0)),
      (None, 20L, 200L, None)))
  }

  test("column collisions between sides are rejected") {
    val l = Seq(("A", 1L, 7L)).toDF("k", "ts", "v")
    val r = Seq(("A", 1L, 8L)).toDF("k", "ts", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(l, r, Seq("k"), "ts")
    }
  }
}
