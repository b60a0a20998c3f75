package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin

/** The native AsofJoinExec (custom LogicalPlan + Strategy + SparkPlan)
  * must agree exactly with the composition-based asofJoin — which is
  * itself cross-validated against DuckDB's native ASOF JOIN by q48.
  */
class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  private val clicks = Seq(
    // user 1: candidates before, at, and after the purchase ts
    (1L, 10L, 100L), (1L, 20L, 101L), (1L, 30L, 102L),
    // user 2: only later clicks → no match
    (2L, 50L, 200L),
    // user 3: exact-ts click must match (<=)
    (3L, 25L, 300L)
  ).toDF("user_id", "sec", "click_id")

  private val purchases = Seq(
    (1L, 25L, 9001L), // latest click at/before 25 → 101
    (1L, 5L, 9002L),  // nothing at/before 5 → null
    (2L, 40L, 9003L), // click exists but later → null
    (3L, 25L, 9004L), // exact ts → 300
    (4L, 99L, 9005L)  // user with no clicks at all → null
  ).toDF("user_id", "sec", "purchase_id")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select("user_id", "sec", "purchase_id", "click_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSet

  test("native asof matches the composition operator on edge cases") {
    val viaWindow = AsofJoin.asofJoin(purchases, clicks, Seq("user_id"), "sec")
    val viaNative = AsofJoin.asofJoinNative(purchases, clicks, Seq("user_id"), "sec")
    val expected = Set(
      (1L, 25L, 9001L, Some(101L)),
      (1L, 5L, 9002L, None),
      (2L, 40L, 9003L, None),
      (3L, 25L, 9004L, Some(300L)),
      (4L, 99L, 9005L, None))
    assert(collect(viaWindow) == expected)
    assert(collect(viaNative) == expected)
  }

  test("native asof agrees with composition on bulk random data") {
    val n = 5000
    val left = spark.range(n).select(
      (col("id") % 40).as("user_id"),
      pmod(col("id") * 2654435761L, lit(10000)).as("sec"),
      col("id").as("purchase_id"))
    val right = spark.range(n).select(
      (col("id") % 37).as("user_id"),
      pmod(col("id") * 40503L + 7, lit(10000)).as("sec"),
      col("id").as("click_id"))
    // right must be unique per (key, ts) for deterministic asof
    val rightU = right.groupBy("user_id", "sec").agg(max("click_id").as("click_id"))
    val a = collect(AsofJoin.asofJoin(left, rightU, Seq("user_id"), "sec"))
    val b = collect(AsofJoin.asofJoinNative(left, rightU, Seq("user_id"), "sec"))
    assert(a == b && a.size == n)
  }

  test("null join keys never match, in both operators") {
    // nulls sort FIRST under ascending ordering, so null-keyed rows hit the
    // merge loop before any real key — they must bypass it (RowOrdering's
    // natural ordering would otherwise treat NULL = NULL as a match)
    val l = Seq((Option(1L), 25L, 9001L), (Option.empty[Long], 25L, 9002L))
      .toDF("user_id", "sec", "purchase_id")
    val r = Seq((Option(1L), 10L, 100L), (Option.empty[Long], 10L, 999L))
      .toDF("user_id", "sec", "click_id")
    val expected = Set(
      (Some(1L), 25L, 9001L, Some(100L)),
      (None, 25L, 9002L, None)) // NOT Some(999L): null never equals null
    def got(df: org.apache.spark.sql.DataFrame) =
      df.select("user_id", "sec", "purchase_id", "click_id")
        .as[(Option[Long], Long, Long, Option[Long])].collect().toSet
    assert(got(AsofJoin.asofJoin(l, r, Seq("user_id"), "sec")) == expected)
    assert(got(AsofJoin.asofJoinNative(l, r, Seq("user_id"), "sec")) == expected)
  }

  test("the physical plan actually uses AsofJoinExec") {
    val df = AsofJoin.asofJoinNative(purchases, clicks, Seq("user_id"), "sec")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("AsofJoin"), s"expected AsofJoinExec in:\n$physical")
  }

  test("left-only filters push below the asof node (custom pushdown rule)") {
    val df = AsofJoin.asofJoinNative(purchases, clicks, Seq("user_id"), "sec")
      .filter(col("purchase_id") =!= 9002L) // references the left side only
    val optimized = df.queryExecution.optimizedPlan
    val asof = optimized.collect { case a: graft.plans.AsofJoinPlan => a }.head
    // the predicate must have moved INTO the asof's left subtree
    assert(asof.left.toString.contains("9002"),
      s"filter not pushed into left child:\n$optimized")
    assert(!optimized.toString.linesIterator.next().contains("Filter") ||
      !optimized.toString.linesIterator.next().contains("9002"),
      s"filter still above the asof node:\n$optimized")
    // and the result is unchanged
    val expected = Set(
      (1L, 25L, 9001L, Some(101L)),
      (2L, 40L, 9003L, None),
      (3L, 25L, 9004L, Some(300L)),
      (4L, 99L, 9005L, None))
    assert(collect(df) == expected)
  }

  test("payload-referencing filters stay above the asof node") {
    val df = AsofJoin.asofJoinNative(purchases, clicks, Seq("user_id"), "sec")
      .filter(col("click_id") === 101L) // depends on the match result
    val asof = df.queryExecution.optimizedPlan
      .collect { case a: graft.plans.AsofJoinPlan => a }.head
    assert(!asof.left.toString.contains("101"),
      "payload filter must not push into the left child")
    assert(collect(df) == Set((1L, 25L, 9001L, Some(101L))))
  }
}
