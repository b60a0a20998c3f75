package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-document MinHash signature as a NATIVE Catalyst expression:
  * tokenize → token-trigram shingles → one md5 per shingle → K affine
  * universal-hash re-maps → running minima, all inside ONE narrow pass
  * over the row. Returns `array<bigint>` of length [[MinHashSig.K]], or
  * NULL for documents with fewer than 3 tokens (no shingles — the same
  * rows the exploded formulation drops).
  *
  * Identical semantics to the composed pipeline in `graft.ext.TextOps`
  * (`shingleRows` → `sigsOf`: posexplode + window-lead + groupBy-min) and
  * to the DuckDB oracle formula `(md5int('mh:' || sh) * a_j + b_j) % P` —
  * but with ZERO shuffles: the exploded path pays one doc_id shuffle for
  * the lead window plus the groupBy's partial-agg exchange, while this
  * expression emits the finished signature from the scan task itself, so
  * LSH banding can follow in the same stage. At 100 TB that removes the
  * widest shuffle of the dedup pipeline (per-shingle rows never leave the
  * mapper). The md5 call dominates, so the generated code delegates to a
  * static helper; the win is row-pipeline shape, not arithmetic.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def nullSafeEval(t: Any): Any =
    MinHashSig.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expr.MinHashSig.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
}

object MinHashSig {
  /** Signature width; the affine family mirrors graft.ext.TextOps (one md5
    * per shingle + K integer re-hashes — md5int < 2^32 and a_j < 2^21 keep
    * every product below 2^63, exact in both engines).
    */
  val K = 12
  val P = 2147483647L
  val HashA: Array[Long] = Array.tabulate(K)(j => 2L * (j * 65497 + 40507) + 1)
  val HashB: Array[Long] = Array.tabulate(K)(j => (j * 97561L + 12841) % P)

  private val md = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes of ("mh:" + s) as an unsigned 32-bit value — the
    * byte-level equal of Exprs.md5Int("mh:", _) / the oracle's
    * CAST('0x' || substr(md5('mh:' || x), 1, 8) AS BIGINT).
    */
  private def md5Int(s: String): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(("mh:" + s).getBytes("UTF-8"))
    (((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
      ((h(2) & 0xffL) << 8) | (h(3) & 0xffL))
  }

  /** Called from generated code — must stay public and static-shaped. */
  def compute(text: UTF8String): GenericArrayData = {
    // UTF8String.toLowerCase IS Spark's lower() — a JVM-locale lowercase
    // (even Locale.ROOT) diverges from it on locale-sensitive codepoints,
    // silently breaking the row-for-row parity with the composed
    // tokens(lower(...)) pipeline that q183/q184 prove
    val toks = text.toLowerCase.toString
      .split("\\s+").filter(_.nonEmpty)
    if (toks.length < 3) return null
    val mins = Array.fill(K)(Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + 2 < toks.length) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
        .append(' ').append(toks(i + 2))
      val h = md5Int(sb.toString)
      var j = 0
      while (j < K) {
        val v = (h * HashA(j) + HashB(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
