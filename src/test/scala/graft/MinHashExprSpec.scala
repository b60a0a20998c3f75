package graft

import org.apache.spark.sql.functions._
import graft.expr.{GraftFunctions, MinHashSig}
import graft.io.Sources
import graft.ops.Exprs

/** The native one-pass MinHash expression must be row-for-row identical to
  * the composed shingle→md5→affine→min formulation (the q34 family's
  * semantics), including the null contract for shingle-less documents.
  */
class MinHashExprSpec extends SparkSpec {
  import spark.implicits._

  test("graft_minhash equals the composed shingle pipeline on every " +
      "document, and is NULL exactly for docs with fewer than 3 tokens") {
    GraftFunctions.register(spark)
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((-1L, "one two"), (-2L, "  "), (-3L, "a b c"))
        .toDF("doc_id", "text"))
    val native = docs.select(col("doc_id"),
      call_function(GraftFunctions.MinHashName, col("text")).as("sig"))

    // composed reference: trigram shingles as arrays, one md5 per shingle,
    // K affine re-maps, per-doc minima
    val toks = docs.select(col("doc_id"), Exprs.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 3)
    val sh = toks.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("t")) - 2), i =>
        concat_ws(" ", element_at(col("t"), i), element_at(col("t"), i + 1),
          element_at(col("t"), i + 2)))).as("x"))
    val hashed = sh.select(col("doc_id") +:
      (0 until MinHashSig.K).map(j =>
        ((Exprs.md5Int("mh:", col("x")) * MinHashSig.HashA(j)
          + MinHashSig.HashB(j)) % MinHashSig.P).as(s"h$j")): _*)
    val minAggs = (0 until MinHashSig.K).map(j => min(col(s"h$j")).as(s"m$j"))
    val composed = hashed.groupBy("doc_id")
      .agg(minAggs.head, minAggs.tail: _*)
      .select(col("doc_id"),
        array((0 until MinHashSig.K).map(j => col(s"m$j")): _*).as("csig"))

    val joined = native.join(composed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("sig"), col("csig"))
      .collect()
    assert(joined.length == docs.count())
    joined.foreach { r =>
      val id = r.getLong(0)
      if (id == -1L || id == -2L) {
        assert(r.isNullAt(1), s"doc $id has <3 tokens — sig must be NULL")
        assert(r.isNullAt(2))
      } else {
        assert(!r.isNullAt(1) && !r.isNullAt(2), s"doc $id missing a side")
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"doc $id native/composed signatures diverge")
      }
    }
  }

  test("the expression participates in whole-stage codegen") {
    GraftFunctions.register(spark)
    // spark.range keeps a real codegen stage (a local Seq constant-folds
    // to LocalTableScan and proves nothing)
    val df = spark.range(4)
      .select(call_function(GraftFunctions.MinHashName,
        concat_ws(" ", lit("alpha"), lit("beta"), lit("gamma"),
          col("id").cast("string"))).as("sig"))
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan rendering;
    // the Project carrying graft_minhash must sit inside one
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("graft_minhash"),
      s"graft_minhash must not break the codegen span:\n$plan")
    assert(df.head().getSeq[Long](0).length == MinHashSig.K)
  }
}
