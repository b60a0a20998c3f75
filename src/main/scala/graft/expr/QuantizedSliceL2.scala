package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Integer squared L2 distance between two array SLICES as one fused
  * native expression:
  *
  * {{{ graft_isq(a, aStart, b, bStart, len)
  *       = Σ_{i=0}^{len-1} (a[aStart-1+i] - b[bStart-1+i])²  (1-based starts) }}}
  *
  * replacing the interpreted composition
  * `aggregate(zip_with(slice(a, aStart, len), slice(b, bStart, len), (x,y) =>
  * (x-y)*(x-y)), 0L, _+_)` in the PQ hot paths (subspace encode, ADC
  * tables), which allocated two sliced arrays plus a zipped array and paid
  * boxed lambda dispatch per element — per EVALUATED PAIR of the
  * O(N·M·K) encode crossJoin. Guide §4: no non-codegen expressions in the
  * hot path.
  *
  * Exact-parity semantics with the composed form (pinned by
  * QuantizedSliceL2Spec):
  *   - `slice` clamps: a slice reaching past the end of its array yields
  *     the shorter suffix; slice lengths n1/n2 are
  *     `clamp(len(x) - (start-1), 0, len)`;
  *   - `zip_with` extends to `max(n1, n2)` padding the shorter side with
  *     null, and `(null-y)*(null-y)` is null, which poisons the aggregate
  *     sum to null — so n1 ≠ n2 → NULL, and n1 = n2 < len is a VALID sum
  *     over the n1 common elements;
  *   - any null ELEMENT inside the compared range → NULL (null-poisoned
  *     sum), any null top-level input → NULL;
  *   - element arithmetic is Java long (wrapping), identical to the
  *     former LongType Subtract/Multiply under ansi=false.
  *
  * Starts must be positive (1-based); the shipped call sites only produce
  * `m*PqSub + 1 ≥ 1`. (A zero/negative `slice` start throws in Spark; this
  * expression never receives one — enforced by require at eval for safety.)
  */
case class QuantizedSliceL2(children: Seq[Expression]) extends Expression {
  require(children.length == 5, "graft_isq expects (a, aStart, b, bStart, len)")

  private def a = children(0)
  private def aStart = children(1)
  private def b = children(2)
  private def bStart = children(3)
  private def lenE = children(4)

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    def int(dt: DataType) = dt == IntegerType || dt == LongType
    if (arr(a.dataType) && arr(b.dataType) && int(aStart.dataType) &&
        int(bStart.dataType) && int(lenE.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, int, array<bigint>, int, int), got " +
        children.map(_.dataType.simpleString).mkString(", "))
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "graft_isq"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): QuantizedSliceL2 =
    copy(children = newChildren)

  override def eval(input: InternalRow): Any = {
    val av = a.eval(input); val sav = aStart.eval(input)
    val bv = b.eval(input); val sbv = bStart.eval(input)
    val lv = lenE.eval(input)
    if (av == null || sav == null || bv == null || sbv == null || lv == null)
      return null
    val x = av.asInstanceOf[ArrayData]; val y = bv.asInstanceOf[ArrayData]
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
      val dv = x.getLong(sa - 1 + i) - y.getLong(sb - 1 + i)
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
    val anyNull = gens.map(_.isNull.toString).mkString(" || ")
    // NOTE: no emitted line may BEGIN with '|' — this Block gets embedded
    // into parent whole-stage templates that call stripMargin again, which
    // would eat a leading '|' (half of a line-broken '||') and leave
    // syntactically invalid Java. r20's silent Janino fallback was exactly
    // that: `|| b.isNullAt(..)` on its own line lost one '|' to THIS
    // stripMargin and the other to the parent's (CodegenMarginSpec pins it).
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
        |      long $dv = ${ga.value}.getLong($sa - 1 + $i)
        |        - ${gb.value}.getLong($sb - 1 + $i);
        |      $s += $dv * $dv;
        |    }
        |    if (!$elNull) { ${ev.isNull} = false; ${ev.value} = $s; }
        |  }
        |}
       """.stripMargin
    ev.copy(code = code)
  }
}
