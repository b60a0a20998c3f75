package graft

import org.apache.spark.sql.functions._

import graft.etl.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1, 3, "c"), (1, 1, "a"), (1, 2, "b"),
    (2, 5, "e"), (3, 7, "g")).toDF("k", "ord", "v")

  test("arbitrary keeps exactly one row per key") {
    val out = Dedup.arbitrary(df, Seq("k"))
    assert(out.count() == 3)
    assert(out.select("k").distinct().count() == 3)
  }

  test("deterministic keeps the first row under the tiebreaker") {
    val out = Dedup.deterministic(df, Seq("k"), Seq(col("ord")))
      .orderBy("k").as[(Int, Int, String)].collect().toSeq
    assert(out == Seq((1, 1, "a"), (2, 5, "e"), (3, 7, "g")))
  }

  test("deterministic is stable across repeated runs") {
    val a = Dedup.deterministic(df, Seq("k"), Seq(col("ord"))).collect().toSet
    val b = Dedup.deterministic(df, Seq("k"), Seq(col("ord"))).collect().toSet
    assert(a == b)
  }

  test("dedup output is PK-unique even with full-row duplicates") {
    val dup = Seq((1, 1, "a"), (1, 1, "a"), (1, 1, "a")).toDF("k", "ord", "v")
    assert(Dedup.deterministic(dup, Seq("k"), Seq(col("ord"))).count() == 1)
  }
}
