package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test of q217/q220's central trick: applying a BPE merge via
  * builtin non-overlapping left-to-right replace() on the two-space
  * symbol encoding is EXACTLY the greedy list-walk merge every BPE
  * implementation performs — including overlap runs ("a a a" merges
  * once, "a a a a" twice) and merged symbols that re-participate in
  * later pair positions. The reference implementation below is the
  * direct list fold; the encoding invariant (two spaces between symbols,
  * two at each edge) must also survive every merge, or a LATER round's
  * pattern would silently stop matching.
  */
class BpeMergeSpec extends AnyFunSuite {

  private def draw[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private def encode(syms: Seq[String]): String =
    "  " + syms.map(_ + "  ").mkString

  private def decode(w: String): Seq[String] = {
    val t = w.trim
    if (t.isEmpty) Seq.empty else t.split("  ").toSeq
  }

  /** Reference greedy merge: scan left to right, merge the FIRST
    * eligible (a, b) adjacency, continue AFTER the merged symbol.
    */
  private def refMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  private val symGen = Gen.oneOf("a", "b", "c", "ab", "bc", "aa")
  private val wordGen = Gen.listOfN(12, symGen).map(_.toSeq)

  test("replace() on the two-space encoding IS the greedy list merge") {
    (1L to 500L).foreach { seed =>
      val syms = draw(wordGen, seed)
      val a = draw(symGen, seed * 31 + 1)
      val b = draw(symGen, seed * 31 + 2)
      val replaced = encode(syms).replace(s" $a  $b ", s" $a$b ")
      assert(decode(replaced) == refMerge(syms, a, b),
        s"seed=$seed syms=$syms merge=($a,$b)")
    }
  }

  /** Tokenizer ROUND-TRIP (VERDICT r16 #8): whatever merge chain training
    * learns, concatenating a word's BPE tokens reproduces the word — the
    * char-level seed encoding partitions the word and merges only ever
    * concatenate adjacent parts, so decode = concat is the exact inverse
    * of q220's encode. Merges are drawn from the CURRENT symbol
    * adjacencies (as training would produce), not random symbol pairs,
    * so every draw actually rewrites the word.
    */
  test("decode (token concat) inverts the encode under learned-style merge chains") {
    // q217's char-level seed encoding: each char a symbol, two-space joined
    def charEncode(w0: String): String = "  " + w0.flatMap(c => s"$c  ")
    (1L to 500L).foreach { seed =>
      val w0 = draw(Gen.listOfN(10, Gen.oneOf('a', 'b', 'c', 'd')), seed).mkString
      var w = charEncode(w0)
      (1 to 5).foreach { r =>
        val syms = decode(w)
        if (syms.length >= 2) {
          val i = draw(Gen.chooseNum(0, syms.length - 2), seed * 31 + r)
          val (a, b) = (syms(i), syms(i + 1))
          w = w.replace(s" $a  $b ", s" $a$b ")
        }
        assert(decode(w).mkString == w0,
          s"seed=$seed round $r: tokens ${decode(w)} do not concat to '$w0'")
      }
    }
  }

  test("the encoding invariant survives chains of merges") {
    (1L to 200L).foreach { seed =>
      val syms = draw(wordGen, seed)
      val merges = draw(Gen.listOfN(4, Gen.zip(symGen, symGen)), seed + 7919)
      var w = encode(syms)
      var ref: Seq[String] = syms
      merges.foreach { case (a, b) =>
        w = w.replace(s" $a  $b ", s" $a$b ")
        ref = refMerge(ref, a, b)
        assert(decode(w) == ref, s"seed=$seed after merge ($a,$b): $w vs $ref")
        // invariant: still two spaces at both edges and between symbols
        assert(w == encode(ref),
          s"seed=$seed encoding drifted: '$w' vs '${encode(ref)}'")
      }
    }
  }
}
