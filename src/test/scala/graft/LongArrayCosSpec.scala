package graft

import org.apache.spark.sql.functions._

/** Equivalence pin for the fused int-array cosine (graft.expr.LongArrayCos):
  * on every input — unequal lengths (zip_with null-padding poisons the
  * sum), per-element nulls, zero vectors (null via the zero denominator),
  * and values large enough to wrap the long product — the fused expression
  * must be BIT-identical to the composed three-zip_with-dot form q95
  * shipped with, because the oracle SQL still mirrors the composed form
  * and the driver hash-compares the doubles verbatim.
  */
class LongArrayCosSpec extends SparkSpec {
  import spark.implicits._

  private def dot8(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
  private def composed(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    dot8(a, b).cast("double") / sqrt((dot8(a, a) * dot8(b, b)).cast("double"))
  private def fused(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    call_function(graft.expr.GraftFunctions.LCosName, a, b)

  test("fused lcos is bit-identical to the composed zip_with dot form") {
    graft.expr.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(20260819L)
    def vec(n: Int, big: Boolean = false): Seq[java.lang.Long] = Seq.tabulate(n) { _ =>
      if (rnd.nextInt(50) == 0) null
      else java.lang.Long.valueOf(
        if (big) rnd.nextLong() / 4 else (rnd.nextInt(255) - 127).toLong)
    }
    val rows = Seq.tabulate(400) { i =>
      val la = if (i % 7 == 0) 3 + rnd.nextInt(5) else 16
      val lb = if (i % 11 == 0) 3 + rnd.nextInt(5) else 16
      (i.toLong, vec(la, big = i % 13 == 0), vec(lb, big = i % 13 == 0))
    } ++ Seq( // zero vectors: composed form divides by zero → NULL
      (1000L, Seq.fill(8)(java.lang.Long.valueOf(0L)), vec(8)),
      (1001L, vec(8), Seq.fill(8)(java.lang.Long.valueOf(0L))),
      (1002L, Seq.empty[java.lang.Long], vec(8)),
      (1003L, Seq.empty[java.lang.Long], Seq.empty[java.lang.Long]))
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(col("id"),
      composed(col("a"), col("b")).as("want"),
      fused(col("a"), col("b")).as("got"))
    val bad = cmp.filter(!(col("want") <=> col("got")))
    assert(bad.isEmpty, s"fused/composed mismatch: ${bad.head(3).mkString(";")}")
    // non-vacuity: some nulls (mismatched lengths / zero denominator) and
    // some finite values must both occur
    val probe = cmp.agg(
      sum(when(col("got").isNull, 1L).otherwise(0L)),
      sum(when(col("got").isNotNull, 1L).otherwise(0L))).head
    assert(probe.getLong(0) > 0 && probe.getLong(1) > 0)
  }

  test("fused lcos interpreted eval matches codegen") {
    graft.expr.GraftFunctions.register(spark)
    val a = Seq(5L, -125L, 2L)
    val b = Seq(15L, 25L, -2L)
    val df = Seq((a, b)).toDF("a", "b")
    val viaPlan = df.select(fused(col("a"), col("b"))).head.getDouble(0)
    val lt = org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType)
    val expr = graft.expr.LongArrayCos(
      org.apache.spark.sql.catalyst.expressions.Literal.create(a, lt),
      org.apache.spark.sql.catalyst.expressions.Literal.create(b, lt))
    assert(expr.eval(null).asInstanceOf[Double] == viaPlan)
  }
}
