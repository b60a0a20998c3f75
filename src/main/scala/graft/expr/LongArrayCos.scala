package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Cosine over two ALREADY-QUANTIZED integer arrays as one fused native
  * expression — the int8-codes sibling of [[QuantizedCos]]:
  *
  * {{{ graft_lcos(a, b) = Σ a_i·b_i / sqrt((Σ a_i²) · (Σ b_i²)) }}}
  *
  * replacing the composed q95 form built from three interpreted
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0L, _+_)` walks per evaluated
  * PAIR of the brute-force broadcast join (guide §4: no boxed
  * higher-order-function dispatch in the O(N·Q) hot loop). One array walk,
  * zero per-pair allocations, whole-stage-codegen friendly.
  *
  * Bit-identical to the composed form, clause by clause:
  *   - `zip_with` pads the shorter side with null and `(null * y)` is
  *     null, which poisons the aggregate sum — so LENGTH MISMATCH → NULL
  *     (the null dot lands in the numerator, nulling the divide);
  *   - a null ELEMENT anywhere in either array null-poisons at least one
  *     of the three sums → NULL;
  *   - element arithmetic is Java long (wrapping, ansi=false) and
  *     `saa * sbb` is the same wrapping long multiply;
  *   - the denominator is `Math.sqrt((double)(saa*sbb))` — the former
  *     Cast-to-double + Sqrt; a ZERO denominator yields NULL (non-ANSI
  *     fractional Divide), a NaN denominator (wrapped-negative product)
  *     divides through to NaN exactly as before.
  */
case class LongArrayCos(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // null on length mismatch, null element, or zero denominator
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lcos"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayCos =
    copy(left = newLeft, right = newRight)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sab = 0L; var saa = 0L; var sbb = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xa = x.getLong(i); val yb = y.getLong(i)
      saa += xa * xa
      sbb += yb * yb
      sab += xa * yb
      i += 1
    }
    val denom = math.sqrt((saa * sbb).toDouble)
    if (denom == 0.0) null else sab.toDouble / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      val bad = ctx.freshName("bad")
      val denom = ctx.freshName("denom")
      s"""
         |int $n = $a.numElements();
         |boolean $bad = $n != $b.numElements();
         |long $sab = 0L; long $saa = 0L; long $sbb = 0L;
         |for (int $i = 0; !$bad && $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |  long $xa = $a.getLong($i);
         |  long $yb = $b.getLong($i);
         |  $saa += $xa * $xa;
         |  $sbb += $yb * $yb;
         |  $sab += $xa * $yb;
         |}
         |double $denom = java.lang.Math.sqrt((double) ($saa * $sbb));
         |if ($bad || $denom == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((double) $sab) / $denom;
         |}
       """.stripMargin
    })
}
