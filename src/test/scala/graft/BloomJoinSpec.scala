package graft

import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions
import graft.ops.BloomJoin

/** Bloom pre-filter semantics: result equality with the plain join (no
  * false negatives by construction — build and probe share one xxhash64
  * pipeline), actual big-side reduction before the shuffle, the SQL
  * surface, and the join-type guard.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  private def big = (1L to 10000L).map(k => (k, s"row$k")).toDF("k", "payload")
  private def small = Seq(5L, 500L, 5000L, 20000L).map(k => (k, s"dim$k"))
    .toDF("k", "name")

  test("pre-filtered join equals the plain join") {
    val plain = big.join(small, Seq("k"), "inner")
      .as[(Long, String, String)].collect().toSet
    val bloomed = BloomJoin.preFilteredJoin(big, small, Seq("k"))
      .as[(Long, String, String)].collect().toSet
    assert(bloomed == plain && plain.size == 3) // 20000 has no fact row
  }

  test("the bloom filter cuts the big side before the exact join") {
    GraftFunctions.register(spark)
    val bloom = small
      .agg(call_function(GraftFunctions.BloomAggName, xxhash64(col("k")), lit(100L)))
      .head.getAs[Array[Byte]](0)
    val survivors = big
      .filter(call_function(GraftFunctions.MightContainName, lit(bloom), xxhash64(col("k"))))
      .count()
    // every true match survives; the false-positive residue is a tiny
    // deterministic handful, nowhere near the 10k input
    assert(survivors >= 3 && survivors < 100)
  }

  test("the same reduction is reachable from pure SQL") {
    GraftFunctions.register(spark)
    big.createOrReplaceTempView("bloom_fact")
    small.createOrReplaceTempView("bloom_dim")
    // the filter binary must be a constant or scalar subquery — the same
    // contract Spark's own InjectRuntimeFilter satisfies
    val n = spark.sql(
      s"""SELECT f.k FROM bloom_fact f
         |WHERE ${GraftFunctions.MightContainName}(
         |        (SELECT ${GraftFunctions.BloomAggName}(xxhash64(k), 100) FROM bloom_dim),
         |        xxhash64(f.k))
         |  AND f.k IN (SELECT k FROM bloom_dim)""".stripMargin).count()
    assert(n == 3)
  }

  test("an empty build side yields an empty result without scanning big") {
    val r = BloomJoin.preFilteredJoin(big, small.filter(lit(false)), Seq("k"))
    assert(r.count() == 0 && r.columns.toSeq == Seq("k", "payload", "name"))
  }

  test("join types that need unmatched big-side rows are rejected") {
    intercept[IllegalArgumentException] {
      BloomJoin.preFilteredJoin(big, small, Seq("k"), joinType = "left")
    }
  }
}
