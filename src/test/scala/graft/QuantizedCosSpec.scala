package graft

import org.apache.spark.sql.functions._

/** Equivalence pin for the fused quantized cosine (graft.expr.QuantizedCos):
  * on every input — including unequal lengths, per-element nulls, zero
  * vectors (null via the zero denominator) and double/float mixes — the
  * fused single-pass expression must be BIT-identical to the composed
  * three-qdot form it replaced, because the oracle SQL still mirrors the
  * composed form and the driver hash-compares the doubles verbatim.
  */
class QuantizedCosSpec extends SparkSpec {
  import spark.implicits._

  private def qd(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function(graft.expr.GraftFunctions.QDotName, a, b)
  private def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    qd(a, b).cast("double") / sqrt((qd(a, a) * qd(b, b)).cast("double"))
  private def fused(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function(graft.expr.GraftFunctions.QCosName, a, b)

  test("fused qcos is bit-identical to the composed three-qdot form") {
    graft.expr.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(20260819L)
    def vec(n: Int): Seq[java.lang.Float] = Seq.tabulate(n) { _ =>
      if (rnd.nextInt(50) == 0) null
      else java.lang.Float.valueOf((rnd.nextFloat() * 8f - 4f))
    }
    val rows = Seq.tabulate(400) { i =>
      val la = if (i % 7 == 0) 3 + rnd.nextInt(5) else 16
      val lb = if (i % 11 == 0) 3 + rnd.nextInt(5) else 16
      (i.toLong, vec(la), vec(lb))
    } ++ Seq( // zero vectors: composed form divides by zero → NULL
      (1000L, Seq.fill(8)(java.lang.Float.valueOf(0f)), vec(8)),
      (1001L, vec(8), Seq.fill(8)(java.lang.Float.valueOf(0f))),
      (1002L, Seq.empty[java.lang.Float], vec(8)))
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(col("id"),
      composed(col("a"), col("b")).as("want"),
      fused(col("a"), col("b")).as("got"),
      // double/float mix: centroids are array<double> in the shipped paths
      composed(col("a").cast("array<double>"), col("b")).as("wantD"),
      fused(col("a").cast("array<double>"), col("b")).as("gotD"))
    val bad = cmp.filter(
      !(col("want") <=> col("got")) || !(col("wantD") <=> col("gotD")))
    assert(bad.isEmpty, s"fused/composed mismatch: ${bad.head(3).mkString(";")}")
    // non-vacuity: some nulls (zero denominator) and some finite values
    val probe = cmp.agg(
      sum(when(col("got").isNull, 1L).otherwise(0L)),
      sum(when(col("got").isNotNull, 1L).otherwise(0L))).head
    assert(probe.getLong(0) > 0 && probe.getLong(1) > 0)
  }

  test("fused qcos interpreted eval matches codegen") {
    graft.expr.GraftFunctions.register(spark)
    val a = Seq(0.5f, -1.25f, 2f).map(java.lang.Float.valueOf)
    val b = Seq(1.5f, 0.25f, -2f).map(java.lang.Float.valueOf)
    val df = Seq((a, b)).toDF("a", "b")
    val viaPlan = df.select(fused(col("a"), col("b"))).head.getDouble(0)
    val expr = graft.expr.QuantizedCos(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        a.map(_.floatValue), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        b.map(_.floatValue), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)))
    assert(expr.eval(null).asInstanceOf[Double] == viaPlan)
  }
}
