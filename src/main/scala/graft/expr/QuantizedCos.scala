package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Quantized cosine `cos(a, b)` as ONE fused native expression — the exact
  * composition the engine previously built from three [[QuantizedDot]]
  * calls:
  *
  * {{{ cast(qdot(a,b) as double) / sqrt(cast(qdot(a,a) * qdot(b,b) as double)) }}}
  *
  * Fusing matters because the composed form re-traverses both arrays three
  * times per evaluated PAIR — and the ANN family evaluates it inside
  * O(N·C) broadcast crossJoins (cell assignment, probe ranking) and every
  * candidate-scoring join, so each element paid six `floor(x*1000+0.5)`
  * quantizations and three array walks where one walk and two
  * quantizations suffice. Optimization-guide §1.2/§4: make the per-task
  * inner loop cheap once the job shape is right.
  *
  * Bit-identical to the composed form by construction, clause by clause:
  *   - each partial sum replicates QuantizedDot exactly: `s_ab` over
  *     `min(len a, len b)` elements where BOTH sides are non-null,
  *     `s_aa` over `len a` where `a_i` is non-null, `s_bb` over `len b`
  *     where `b_i` is non-null; integer adds are associative, so the
  *     single-pass accumulation is the same long;
  *   - `s_aa * s_bb` is the same Java long multiply (wrapping like the
  *     former LongType Multiply under ansi=false);
  *   - the denominator is `Math.sqrt((double) product)` — the former
  *     Cast-to-double + Sqrt;
  *   - a zero denominator yields NULL, replicating Spark's non-ANSI
  *     fractional Divide (`input2 == 0 → null`); a NaN denominator (from a
  *     wrapped-negative product outside the supported value domain)
  *     divides through to NaN exactly as before.
  */
case class QuantizedCos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // the composed Divide was nullable (zero denominator), keep that
  override def nullable: Boolean = true
  override def prettyName: String = "graft_qcos"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedCos =
    copy(left = newLeft, right = newRight)

  @inline private def q(d: Double): Long =
    math.floor(d * 1000.0 + 0.5).toLong

  private def isDoubleArr(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val ld = isDoubleArr(left.dataType); val rd = isDoubleArr(right.dataType)
    val na = x.numElements(); val nb = y.numElements()
    val n = math.max(na, nb)
    var sab = 0L; var saa = 0L; var sbb = 0L
    var i = 0
    while (i < n) {
      val aOk = i < na && !x.isNullAt(i)
      val bOk = i < nb && !y.isNullAt(i)
      val qa = if (aOk) q(if (ld) x.getDouble(i) else x.getFloat(i).toDouble) else 0L
      val qb = if (bOk) q(if (rd) y.getDouble(i) else y.getFloat(i).toDouble) else 0L
      if (aOk) saa += qa * qa
      if (bOk) sbb += qb * qb
      if (aOk && bOk) sab += qa * qb
      i += 1
    }
    val denom = math.sqrt((saa * sbb).toDouble)
    if (denom == 0.0) null else sab.toDouble / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val n = ctx.freshName("n")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val aOk = ctx.freshName("aOk")
      val bOk = ctx.freshName("bOk")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      val denom = ctx.freshName("denom")
      def get(arr: String, double: Boolean) =
        if (double) s"$arr.getDouble($i)" else s"((double) $arr.getFloat($i))"
      val av = get(a, isDoubleArr(left.dataType))
      val bv = get(b, isDoubleArr(right.dataType))
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $n = java.lang.Math.max($na, $nb);
         |long $sab = 0L; long $saa = 0L; long $sbb = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  boolean $aOk = $i < $na && !$a.isNullAt($i);
         |  boolean $bOk = $i < $nb && !$b.isNullAt($i);
         |  long $qa = $aOk ? (long) java.lang.Math.floor($av * 1000.0 + 0.5) : 0L;
         |  long $qb = $bOk ? (long) java.lang.Math.floor($bv * 1000.0 + 0.5) : 0L;
         |  if ($aOk) $saa += $qa * $qa;
         |  if ($bOk) $sbb += $qb * $qb;
         |  if ($aOk && $bOk) $sab += $qa * $qb;
         |}
         |double $denom = java.lang.Math.sqrt((double) ($saa * $sbb));
         |if ($denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((double) $sab) / $denom;
         |}
       """.stripMargin
    })
}
