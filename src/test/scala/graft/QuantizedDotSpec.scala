package graft

import org.apache.spark.sql.functions._

import graft.expr.GraftFunctions
import graft.ops.Exprs

class QuantizedDotSpec extends SparkSpec {
  import spark.implicits._

  private def registered = { GraftFunctions.register(spark); spark }

  private val rows = Seq(
    (Array(1.0f, 2.0f, -0.5f), Array(3.0f, 0.5f, 2.0f)),
    (Array(0.0f, 0.0f), Array(0.0f, 0.0f)),
    (Array(0.1234f, -0.9876f), Array(0.5f, 0.5f)))

  test("native expression matches the higher-order-function formulation") {
    registered
    val df = rows.toDF("a", "b")
    val out = df.select(
      call_function("graft_qdot", col("a"), col("b")).as("native"),
      Exprs.qdot(col("a"), col("b")).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("interpreted path (codegen off) agrees with codegen path") {
    registered
    val df = rows.toDF("a", "b")
    val withCodegen = df.select(call_function("graft_qdot", col("a"), col("b")))
      .as[Long].collect().toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = df.select(call_function("graft_qdot", col("a"), col("b")))
        .as[Long].collect().toSeq
      assert(interpreted == withCodegen)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null array yields null; registration is idempotent") {
    registered
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0f)), None: Option[Array[Float]])).toDF("a", "b")
    val r = df.select(call_function("graft_qdot", col("a"), col("b"))).collect().head
    assert(r.isNullAt(0))
  }

  test("double arrays and mixed float/double sides agree with the float path") {
    registered
    // widening float→double is exact, so qdot over the widened copies must
    // be bit-identical — this is what lets trained (double) centroids score
    // against stored (float) embeddings through the same codegen'd loop
    val df = rows.toDF("a", "b")
      .withColumn("ad", col("a").cast("array<double>"))
      .withColumn("bd", col("b").cast("array<double>"))
    val out = df.select(
      call_function("graft_qdot", col("a"), col("b")).as("ff"),
      call_function("graft_qdot", col("ad"), col("bd")).as("dd"),
      call_function("graft_qdot", col("ad"), col("b")).as("df"),
      call_function("graft_qdot", col("a"), col("bd")).as("fd")).collect()
    out.foreach { r =>
      assert(r.getLong(1) == r.getLong(0))
      assert(r.getLong(2) == r.getLong(0))
      assert(r.getLong(3) == r.getLong(0))
    }
    // interpreted path too: same four shapes, codegen disabled
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(
        call_function("graft_qdot", col("ad"), col("b"))).as[Long].collect().toSeq
      assert(interp == out.map(_.getLong(0)).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("type mismatch is rejected at analysis") {
    registered
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(call_function("graft_qdot", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"))
  }
}
