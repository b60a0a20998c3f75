package graft

import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("range join equals the naive inequality join, pairs matched once") {
    val left = (1 to 50).map(i => (i % 5L, i.toLong, i * 17L % 1000)).toDF("k", "lid", "lts")
    val right = (1 to 80).map(i => (i % 5L, i * 13L % 1000)).toDF("k", "rts")
    val (lo, hi) = (1L, 100L)
    val fast = RangeJoin.rangeJoinPairs(left, right, Seq("k"), "lts", "rts", lo, hi)
      .select("k", "lid", "lts", "rts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val naive = left.join(right, Seq("k"))
      .filter($"rts" >= $"lts" + lo && $"rts" <= $"lts" + hi)
      .select("k", "lid", "lts", "rts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // multiset equality: every qualifying pair exactly once
    assert(fast.groupBy(identity).view.mapValues(_.size).toMap ==
      naive.groupBy(identity).view.mapValues(_.size).toMap)
    assert(naive.nonEmpty)
  }

  test("colliding column names are rejected") {
    val l = Seq((1L, 2L)).toDF("k", "ts")
    val r = Seq((1L, 2L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoinPairs(l, r, Seq("k"), "ts", "ts", 0, 10)
    }
  }
}
