package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property test of the unigram-LM Viterbi segmenter
  * (graft.ext.TextOps.uniSegment) — the DP every q253/q254 E-step runs.
  * Drives the SHIPPED code over random words and random piece-cost models
  * (seeds pinned — deterministic, no flaky CI):
  *
  *  1. prune-monotonicity THEOREM: under FIXED costs, removing multi-char
  *     pieces can never LOWER the optimal segmentation cost (the minimum
  *     over a subset of paths ≥ the minimum over the superset) — the
  *     invariant that makes q253's EM prune sound: the pruned model's
  *     corpus cost can only be re-earned by the M-step, never by the DP.
  *  2. path validity: the returned pieces concatenate exactly to the word
  *     and their summed costs equal the reported optimum — before and
  *     after pruning (single chars always survive, so feasibility holds).
  *  3. the tie-break is the documented one: at equal total cost the
  *     backtrack prefers the LONGER last piece (what the oracle's
  *     ORDER BY cost, length(piece) DESC mirrors).
  */
class UniSegSpec extends AnyFunSuite {

  private val alphabet = "abcd"

  private def randWord(r: scala.util.Random): String =
    Seq.fill(1 + r.nextInt(12))(alphabet(r.nextInt(alphabet.length))).mkString

  test("∀ models: pruning never lowers the optimum; paths stay valid") {
    (1 to 100).foreach { seed =>
      val r = new scala.util.Random(seed)
      val words = Seq.fill(12)(randWord(r))
      val chars: Map[String, Long] =
        alphabet.map(c => c.toString -> (1L + r.nextInt(2000))).toMap
      val multi: Map[String, Long] = words.flatMap { w =>
        (0 until w.length).flatMap { i =>
          (2 to 3).filter(i + _ <= w.length).map(l => w.substring(i, i + l))
        }
      }.distinct.filter(_ => r.nextBoolean())
        .map(p => p -> (1L + r.nextInt(3000))).toMap
      val model = chars ++ multi
      // prune a random subset of the multi-char pieces — chars stay
      val pruned = model.filter { case (p, _) =>
        p.length == 1 || r.nextBoolean() }
      words.foreach { w =>
        val (c1, ps1) = graft.ext.TextOps.uniSegment(w, model)
        val (c2, ps2) = graft.ext.TextOps.uniSegment(w, pruned)
        assert(ps1.mkString == w, s"full-model path must spell '$w'")
        assert(ps2.mkString == w, s"pruned-model path must spell '$w'")
        assert(ps1.map(model).sum == c1, "full path must achieve its dp cost")
        assert(ps2.map(pruned).sum == c2, "pruned path must achieve its dp cost")
        assert(c2 >= c1,
          s"prune-monotonicity broken on '$w': pruned $c2 < full $c1")
      }
    }
  }

  test("equal-cost ties resolve to the longer last piece") {
    val m = Map("a" -> 1L, "b" -> 1L, "ab" -> 2L)
    // dp("ab") = 2 via [a, b] AND via [ab] — the documented tie-break
    // must pick the single longer piece
    assert(graft.ext.TextOps.uniSegment("ab", m)._2 == Seq("ab"))
    // and stay cost-optimal when the longer piece is strictly worse
    val m2 = Map("a" -> 1L, "b" -> 1L, "ab" -> 5L)
    assert(graft.ext.TextOps.uniSegment("ab", m2)._2 == Seq("a", "b"))
  }
}
