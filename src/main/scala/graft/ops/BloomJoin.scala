package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions

/** Bloom-filter pre-filtered equi-join — the "semi-join reduction" every
  * warehouse engine applies when a selective dimension joins a huge fact
  * (the reference's star joins inherit it from Athena/Presto's dynamic
  * filtering; Spark itself has it as AQE's InjectRuntimeFilter).
  *
  * Shape: ONE scan of the small side builds a Bloom filter over
  * `xxhash64(keys)` (partial aggregation — each partition builds locally,
  * buffers OR-merge on the driver); the serialized filter rides into the
  * big side's scan as a literal predicate, codegen'd via Spark's own
  * `BloomFilterMightContain`, so non-joining rows die AT THE SCAN before
  * the shuffle. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling only the ~matching fraction; the exact
  * join then removes the false-positive residue (never false negatives:
  * build and probe share one hash pipeline).
  *
  * The pair is also SQL-registered (`graft_bloom_agg` /
  * `graft_might_contain`) so the same reduction is reachable from pure
  * SQL. Only `inner` and `left_semi` joins are legal — any other type
  * needs the big side's non-matching rows in the result, which the
  * pre-filter has already dropped.
  */
object BloomJoin {

  /** `big ⋈ small` on equi-`keys` with the Bloom reduction applied to
    * `big`. `expectedItems` sizes the filter (Spark caps bits at
    * `numBits`'s default 8M ≈ 1 MB serialized — small enough to ship as a
    * plan literal); pass the small side's approximate distinct-key count.
    */
  def preFilteredJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      joinType: String = "inner",
      expectedItems: Long = 1000000L): DataFrame = {
    require(keys.nonEmpty, "bloom join needs at least one equi-key")
    val jt = joinType.toLowerCase.replace("_", "")
    require(jt == "inner" || jt == "semi" || jt == "leftsemi",
      s"bloom pre-filter only preserves inner/left_semi semantics, got $joinType")
    GraftFunctions.register(big.sparkSession)
    val hash = xxhash64(keys.map(col): _*)
    // one row, one binary cell: the OR-merged filter over the small side
    val bloom = small
      .agg(call_function(GraftFunctions.BloomAggName, hash, lit(expectedItems)))
      .head.getAs[Array[Byte]](0)
    if (bloom == null) {
      // empty build side: the join result is empty; keep the plan shape
      // (and the schema) without scanning the big side
      return big.filter(lit(false)).join(small, keys, joinType)
    }
    big.filter(call_function(GraftFunctions.MightContainName, lit(bloom), hash))
      .join(small, keys, joinType)
  }
}
