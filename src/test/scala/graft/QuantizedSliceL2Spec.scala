package graft

import org.apache.spark.sql.functions._

/** Equivalence pin for the fused sliced integer L2
  * (graft.expr.QuantizedSliceL2): `graft_isq(a, sa, b, sb, len)` must be
  * BIT-identical to the interpreted composition it replaced —
  * `aggregate(zip_with(slice(a, sa, len), slice(b, sb, len),
  * (x,y) => (x-y)*(x-y)), 0L, _+_)` — including the clamped-slice /
  * zip_with-null-padding edge semantics: unequal clamped lengths → NULL,
  * equal-but-short lengths → a valid truncated sum, any null element →
  * NULL. The PQ encode/ADC paths rely on this via their DuckDB oracles.
  */
class QuantizedSliceL2Spec extends SparkSpec {
  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column, sa: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, sb: org.apache.spark.sql.Column, len: Int) =
    aggregate(zip_with(slice(a, sa, lit(len)), slice(b, sb, lit(len)),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
  private def fused(a: org.apache.spark.sql.Column, sa: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, sb: org.apache.spark.sql.Column, len: Int) =
    call_function(graft.expr.GraftFunctions.ISqName, a, sa, b, sb, lit(len))

  test("fused isq is bit-identical to the slice+zip_with+aggregate form") {
    graft.expr.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(20260819L)
    def vec(n: Int): Seq[java.lang.Long] = Seq.tabulate(n) { _ =>
      if (rnd.nextInt(60) == 0) null
      else java.lang.Long.valueOf(rnd.nextInt(4001) - 2000L)
    }
    // lengths around the shipped shape (64-dim residuals, 16-long
    // codewords) plus short/ragged arrays that exercise slice clamping
    val rows = Seq.tabulate(300) { i =>
      val la = if (i % 9 == 0) rnd.nextInt(20) else 64
      val lb = if (i % 7 == 0) rnd.nextInt(20) else 16
      (i.toLong, (i % 4) * 16 + 1, vec(la), vec(lb))
    }
    val df = rows.toDF("id", "m1", "a", "b")
    val cmp = df.select(col("id"),
      composed(col("a"), col("m1"), col("b"), lit(1), 16).as("want"),
      fused(col("a"), col("m1"), col("b"), lit(1), 16).as("got"),
      // the both-sides-sliced iSubDists shape
      composed(col("a"), col("m1"), col("a"), col("m1"), 16).as("wantS"),
      fused(col("a"), col("m1"), col("a"), col("m1"), 16).as("gotS"))
    val bad = cmp.filter(
      !(col("want") <=> col("got")) || !(col("wantS") <=> col("gotS")))
    assert(bad.isEmpty, s"fused/composed mismatch: ${bad.head(3).mkString(";")}")
    val probe = cmp.agg(
      sum(when(col("got").isNull, 1L).otherwise(0L)),
      sum(when(col("got").isNotNull, 1L).otherwise(0L))).head
    assert(probe.getLong(0) > 0 && probe.getLong(1) > 0,
      s"edge coverage vacuous: nulls=${probe.getLong(0)} vals=${probe.getLong(1)}")
  }

  test("fused fsq is bit-identical to the qint-diff zip_with form") {
    graft.expr.GraftFunctions.register(spark)
    def qint(x: org.apache.spark.sql.Column) =
      floor(x * lit(1000.0) + lit(0.5)).cast("long")
    def composedF(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(a, b, (x, y) =>
        (qint(x) - qint(y)) * (qint(x) - qint(y))), lit(0L), (acc, v) => acc + v)
    def fusedF(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function(graft.expr.GraftFunctions.FSqName,
        a, lit(1), b, lit(1), lit(Int.MaxValue))
    val rnd = new scala.util.Random(20260820L)
    def vec(n: Int): Seq[java.lang.Float] = Seq.tabulate(n) { _ =>
      if (rnd.nextInt(60) == 0) null
      else java.lang.Float.valueOf(rnd.nextFloat() * 8f - 4f)
    }
    val rows = Seq.tabulate(300) { i =>
      val la = if (i % 9 == 0) rnd.nextInt(20) else 64
      val lb = if (i % 7 == 0) rnd.nextInt(20) else 64 // unequal → NULL
      (i.toLong, vec(la), vec(lb))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(col("id"),
      composedF(col("a"), col("b")).as("want"),
      fusedF(col("a"), col("b")).as("got"),
      composedF(col("a").cast("array<double>"), col("b")).as("wantD"),
      fusedF(col("a").cast("array<double>"), col("b")).as("gotD"))
    val bad = cmp.filter(
      !(col("want") <=> col("got")) || !(col("wantD") <=> col("gotD")))
    assert(bad.isEmpty, s"fsq mismatch: ${bad.head(3).mkString(";")}")
    val probe = cmp.agg(
      sum(when(col("got").isNull, 1L).otherwise(0L)),
      sum(when(col("got").isNotNull, 1L).otherwise(0L))).head
    assert(probe.getLong(0) > 0 && probe.getLong(1) > 0)
  }

  test("fused isq interpreted eval matches codegen path") {
    graft.expr.GraftFunctions.register(spark)
    val a = Seq.tabulate(64)(i => java.lang.Long.valueOf(i.toLong - 30))
    val b = Seq.tabulate(16)(i => java.lang.Long.valueOf(2L * i))
    val viaPlan = Seq((a, b)).toDF("a", "b")
      .select(fused(col("a"), lit(17), col("b"), lit(1), 16)).head.getLong(0)
    val lits = Seq(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        a.map(_.longValue), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal(17),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        b.map(_.longValue), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal(16))
    assert(graft.expr.QuantizedSliceL2(lits).eval(null)
      .asInstanceOf[Long] == viaPlan)
  }
}
