package graft.ext

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k best (score desc, id asc) pairs.
  *
  * This is the scale-correct shape for per-group top-k: a window
  * (`row_number over partitionBy(group)`) shuffles EVERY candidate row to
  * the group's single partition and sorts it all; the aggregator keeps k
  * rows per partition map-side and merges k-sized buffers — shuffle volume
  * is k per (group × partition), independent of candidate count, and a
  * group with a billion candidates no longer lands on one reducer.
  *
  * The (−score, id) ordering is a total order, so results are deterministic
  * and oracle-comparable. Registered via `functions.udaf` (SURVEY.md §7.5 —
  * the one genuinely custom typed-aggregation need).
  */
object TopK {

  final case class Scored(id: Long, score: Double)

  final class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    private def best(xs: Seq[Scored]): Seq[Scored] =
      xs.sortBy(s => (-s.score, s.id)).take(k)
    private def beats(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)
    override def zero: Seq[Scored] = Nil
    override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
      if (b.lengthCompare(k) >= 0 && !beats(a, b.last))
        b // fast path: candidate is worse than the current k-th
      else {
        // the buffer is always sorted (zero/merge/this branch keep it so):
        // an ordered insert + trim is O(k) per accepted row, not the
        // O(k log k) re-sort of sorting the whole buffer each time
        val i = b.indexWhere(beats(a, _)) match { case -1 => b.length; case x => x }
        ((b.take(i) :+ a) ++ b.drop(i)).take(k)
      }
    override def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] = best(b1 ++ b2)
    override def finish(r: Seq[Scored]): Seq[Scored] = r
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }
}
