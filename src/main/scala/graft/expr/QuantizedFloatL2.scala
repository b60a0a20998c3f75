package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Quantized squared L2 between two float/double array SLICES as one fused
  * native expression — the float-input sibling of [[QuantizedSliceL2]]:
  *
  * {{{ graft_fsq(a, aStart, b, bStart, len)
  *       = Σ (q(a[aStart-1+i]) - q(b[bStart-1+i]))²,  q(x) = floor(x*1000 + 0.5) }}}
  *
  * replacing the interpreted
  * `aggregate(zip_with(slice(a,...), slice(b,...), (x,y) =>
  * (qint(x)-qint(y))*(qint(x)-qint(y))), 0L, _+_)` (`pqSq`) evaluated per
  * candidate pair in the flat-PQ subspace scoring and in every exact-arm
  * integer-L2 ranking. Full-width call sites pass a huge `len`: the
  * slice-clamp semantics then reduce to "whole arrays, NULL when lengths
  * differ", exactly like zip_with's null padding poisoning the sum.
  *
  * Parity semantics match QuantizedSliceL2 (clamped slice lengths, n1 ≠ n2
  * → NULL, null element → NULL, Java long wrap); quantization replicates
  * `qint` / QuantizedDot: float widens to double exactly, then
  * `floor(x*1000.0 + 0.5)` as a Java long.
  */
case class QuantizedFloatL2(children: Seq[Expression]) extends Expression {
  require(children.length == 5, "graft_fsq expects (a, aStart, b, bStart, len)")

  private def a = children(0)
  private def aStart = children(1)
  private def b = children(2)
  private def bStart = children(3)
  private def lenE = children(4)

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    def int(dt: DataType) = dt == IntegerType || dt == LongType
    if (arr(a.dataType) && arr(b.dataType) && int(aStart.dataType) &&
        int(bStart.dataType) && int(lenE.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<float|double>, int, array<float|double>, int, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_fsq"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantizedFloatL2 =
    copy(children = newChildren)

  private def isDoubleArr(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  @inline private def q(d: Double): Long =
    math.floor(d * 1000.0 + 0.5).toLong

  override def eval(input: InternalRow): Any = {
    val av = a.eval(input); val sav = aStart.eval(input)
    val bv = b.eval(input); val sbv = bStart.eval(input)
    val lv = lenE.eval(input)
    if (av == null || sav == null || bv == null || sbv == null || lv == null)
      return null
    val x = av.asInstanceOf[ArrayData]; val y = bv.asInstanceOf[ArrayData]
    val ld = isDoubleArr(a.dataType); val rd = isDoubleArr(b.dataType)
    def asInt(v: Any): Int = v match {
      case i: java.lang.Integer => i.intValue
      case l: java.lang.Long => l.intValue
    }
    val sa = asInt(sav); val sb = asInt(sbv); val len = asInt(lv)
    require(sa >= 1 && sb >= 1, s"$prettyName starts must be 1-based positive")
    val n1 = math.max(0, math.min(x.numElements() - (sa - 1), len))
    val n2 = math.max(0, math.min(y.numElements() - (sb - 1), len))
    if (n1 != n2) return null
    var s = 0L
    var i = 0
    while (i < n1) {
      if (x.isNullAt(sa - 1 + i) || y.isNullAt(sb - 1 + i)) return null
      val xv = if (ld) x.getDouble(sa - 1 + i) else x.getFloat(sa - 1 + i).toDouble
      val yv = if (rd) y.getDouble(sb - 1 + i) else y.getFloat(sb - 1 + i).toDouble
      val dv = q(xv) - q(yv)
      s += dv * dv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val Seq(ga, gsa, gb, gsb, glen) = gens
    val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
    val i = ctx.freshName("i"); val s = ctx.freshName("s")
    val dv = ctx.freshName("dv")
    val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
    val ln = ctx.freshName("ln")
    val elNull = ctx.freshName("elNull")
    def get(arr: String, idx: String, double: Boolean) =
      if (double) s"$arr.getDouble($idx)" else s"((double) $arr.getFloat($idx))"
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    // NOTE: no emitted line may BEGIN with '|' — this Block gets embedded
    // into parent whole-stage templates that call stripMargin again, which
    // would eat a leading '|' (half of a line-broken '||') and leave
    // syntactically invalid Java. r20's silent Janino fallback was exactly
    // that: `|| b.isNullAt(..)` on its own line lost one '|' to THIS
    // stripMargin and the other to the parent's.
    val code =
      code"""
        |${gens.map(_.code).mkString("\n")}
        |boolean ${ev.isNull} = true;
        |long ${ev.value} = -1L;
        |if (!($anyNull)) {
        |  int $sa = (int) ${gsa.value};
        |  int $sb = (int) ${gsb.value};
        |  int $ln = (int) ${glen.value};
        |  int $n1 = java.lang.Math.max(0,
        |    java.lang.Math.min(${ga.value}.numElements() - ($sa - 1), $ln));
        |  int $n2 = java.lang.Math.max(0,
        |    java.lang.Math.min(${gb.value}.numElements() - ($sb - 1), $ln));
        |  if ($n1 == $n2) {
        |    long $s = 0L;
        |    boolean $elNull = false;
        |    for (int $i = 0; $i < $n1; $i++) {
        |      if (${ga.value}.isNullAt($sa - 1 + $i) ||
        |          ${gb.value}.isNullAt($sb - 1 + $i)) {
        |        $elNull = true; break;
        |      }
        |      long $dv =
        |        (long) java.lang.Math.floor(${get(ga.value, s"$sa - 1 + $i", isDoubleArr(a.dataType))} * 1000.0 + 0.5)
        |        - (long) java.lang.Math.floor(${get(gb.value, s"$sb - 1 + $i", isDoubleArr(b.dataType))} * 1000.0 + 0.5);
        |      $s += $dv * $dv;
        |    }
        |    if (!$elNull) { ${ev.isNull} = false; ${ev.value} = $s; }
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }
}
