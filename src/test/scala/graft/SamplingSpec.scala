package graft

import org.apache.spark.sql.functions._

import graft.ops.Exprs

/** Bernoulli (`sampleBy`) vs salted-hash stratified sampling (q56's
  * mechanism): both hit their per-stratum target rates, but only the
  * salted-hash keep decision is REPRODUCIBLE — the same rows survive at
  * any parallelism, which is what a training-data mix needs (re-running
  * the pipeline must not reshuffle the corpus).
  */
class SamplingSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Exprs.t(spark, dir, "documents")

  private val fractions = Map("en" -> 0.8, "de" -> 0.5, "fr" -> 0.5)

  private def rates(df: org.apache.spark.sql.DataFrame): Map[String, Double] = {
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    df.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble / totals(r.getString(0))).toMap
  }

  private def saltedKeep(df: org.apache.spark.sql.DataFrame) = {
    val rate = when(col("lang") === "en", 80)
      .when(col("lang") === "de", 50)
      .when(col("lang") === "fr", 50)
      .otherwise(25)
    df.filter(Exprs.md5Int("samp:", col("doc_id").cast("string")) % 100 < rate)
  }

  test("sampleBy hits per-stratum Bernoulli rates within tolerance") {
    val sampled = docs.stat.sampleBy("lang", fractions, seed = 42L)
    rates(sampled).foreach { case (lang, r) =>
      val target = fractions.getOrElse(lang, 0.0)
      if (target > 0)
        assert(math.abs(r - target) < 0.15, s"lang=$lang rate=$r target=$target")
    }
  }

  test("salted-hash sampling hits target rates AND is parallelism-invariant") {
    val kept = saltedKeep(docs)
    rates(kept).filterKeys(fractions.contains).foreach { case (lang, r) =>
      assert(math.abs(r - fractions(lang)) < 0.15, s"lang=$lang rate=$r")
    }
    // identical keep SET under different partitionings — the property
    // Bernoulli sampling does not guarantee across engines/restarts
    val ids3 = saltedKeep(docs.repartition(3)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val ids7 = saltedKeep(docs.repartition(7)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids3 == ids7 && ids3.nonEmpty)
  }

  test("q190 PPS sampling: draws total exactly m and are partitioning-invariant") {
    val q = graft.ops.Catalog.all.find(_.name == "q190_pps_sample").get
    val out = q.run(spark, "/root/testdata/sf0.001").collect()
    // systematic PPS telescopes: the m sample points are each assigned to
    // exactly one document, so the draw total is m regardless of skew
    assert(out.map(_.getAs[Long]("n_draws")).sum == 500L)
    assert(out.forall(r =>
      r.getAs[Long]("n_docs_sampled") <= r.getAs[Long]("n_draws")))
  }
}
