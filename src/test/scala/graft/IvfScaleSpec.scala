package graft

import org.apache.spark.sql.functions._

import graft.ext.VectorOps
import graft.ops.Exprs

/** The IVF centroid count as a scale knob (VERDICT r11 directive #6): at
  * 100 TB C grows ~√N to hold cell size constant, so the quantizer must
  * accept C as a parameter with assignment cost staying O(N·C) — one
  * broadcast argmin pass — and recall holding when the probe width grows
  * with C to keep the probed corpus fraction fixed.
  */
class IvfScaleSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Exprs.t(spark, "/root/testdata/sf0.001", "embeddings")

  private def qd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function(graft.expr.GraftFunctions.QDotName, a, b)
  private def cosC(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    qd(a, b).cast("double") / sqrt((qd(a, a) * qd(b, b)).cast("double"))

  /** Exact brute-force top-5 ids per query — the recall denominator. */
  private def exactTop5: Map[Long, Set[Long]] = {
    graft.expr.GraftFunctions.register(spark)
    val e = emb
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosC(col("qe"), col("embedding")).as("cos"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  private def recallAt(c: Int, probes: Int, exact: Map[Long, Set[Long]]): Double = {
    graft.expr.GraftFunctions.register(spark)
    val got = VectorOps.ivfTopK(emb, c, probes, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val hits = exact.toSeq.map { case (q, ex) =>
      ex.intersect(got.getOrElse(q, Set.empty)).size
    }.sum
    hits.toDouble / (exact.size * 5)
  }

  test("the centroid set scales with C and assignment stays one broadcast " +
      "pass at C=128") {
    val c128 = VectorOps.centroids(emb, 128)
    val n = c128.count()
    // stride = floor(N/C) means the realized count sits in [C, 2C)
    assert(n >= 128 && n < 256, s"got $n centroids for C=128")
    assert(VectorOps.centroids(emb, 32).count() < n)
    // the assignment pass must broadcast the centroid side — never
    // shuffle the (at scale, 100 TB) embedding side for cell assignment
    graft.expr.GraftFunctions.register(spark)
    val plan = VectorOps.ivfTopK(emb, 128, probes = 8, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }

  test("recall@5 holds when C grows 32->128 with the probed fraction kept " +
      "fixed (probes 2->8)") {
    val exact = exactTop5
    val r32 = recallAt(32, 2, exact)
    val r128 = recallAt(128, 8, exact)
    info(s"recall@5: C=32/p=2 -> $r32, C=128/p=8 -> $r128")
    // the refined quantizer must not lose recall (same probed fraction,
    // finer cells); small-sample wiggle allowed. Absolute recall is
    // modest by construction: the synthetic embeddings are near-uniform,
    // so probing ~5% of 500 vectors bounds what ANY coarse quantizer can
    // recall — measured 0.35 (C=32) -> 0.45 (C=128) at pinning time.
    assert(r128 >= r32 - 0.05, s"recall regressed: $r32 -> $r128")
    assert(r128 >= 0.4, s"absolute recall floor: $r128")
  }
}
