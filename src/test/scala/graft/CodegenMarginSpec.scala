package graft

import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Generated-code margin invariant for every graft expression: no emitted
  * Java line may begin (after whitespace) with '|'. The expression Block
  * gets interpolated into parent whole-stage-codegen templates that call
  * stripMargin AGAIN, and a leading '|' — e.g. half of a line-broken '||'
  * operator — is then eaten as a margin character, producing syntactically
  * invalid Java. Spark falls back to interpreted evaluation SILENTLY, so
  * this ran undetected for a round (r20 Verify: Janino "')' expected
  * instead of 'value_11'") while 12 PQ-family queries quietly lost codegen.
  */
class CodegenMarginSpec extends AnyFunSuite {

  private val longArr = ArrayType(LongType)
  private val floatArr = ArrayType(FloatType)

  private def genLines(e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[String] = {
    val ctx = new CodegenContext
    e.genCode(ctx).code.toString.linesIterator.toSeq ++
      // splitExpressions may have moved code into added functions
      ctx.declareAddedFunctions().linesIterator.toSeq
  }

  private def assertNoMarginLines(name: String,
      e: org.apache.spark.sql.catalyst.expressions.Expression): Unit = {
    val bad = genLines(e).filter(_.dropWhile(_ == ' ').startsWith("|"))
    assert(bad.isEmpty,
      s"$name emits lines a parent stripMargin would corrupt:\n${bad.mkString("\n")}")
  }

  test("no graft expression emits a line starting with '|'") {
    val a = BoundReference(0, longArr, nullable = true)
    val b = BoundReference(1, longArr, nullable = true)
    val fa = BoundReference(0, floatArr, nullable = true)
    val fb = BoundReference(1, floatArr, nullable = true)
    assertNoMarginLines("graft_qdot", graft.expr.QuantizedDot(fa, fb))
    assertNoMarginLines("graft_qcos", graft.expr.QuantizedCos(fa, fb))
    assertNoMarginLines("graft_lcos", graft.expr.LongArrayCos(a, b))
    assertNoMarginLines("graft_isq", graft.expr.QuantizedSliceL2(
      Seq(a, Literal(1), b, Literal(1), Literal(8))))
    assertNoMarginLines("graft_fsq", graft.expr.QuantizedFloatL2(
      Seq(fa, Literal(1), fb, Literal(1), Literal(8))))
    assertNoMarginLines("graft_minhash", graft.expr.MinHashSig(
      BoundReference(0, ArrayType(StringType), nullable = true)))
  }
}
