package graft

import org.apache.spark.sql.functions._

/** Property test of the per-subspace PQ codebook trainer, driving the
  * SHIPPED code (VectorOps.seedPqBook / trainedPqBook / pqCodes) over
  * RANDOM residual sets — the q245 distortion-monotonicity theorem must
  * hold for EVERY residual distribution, not just the sf corpora:
  *
  *   distortion(trained) ≤ distortion(seed)
  *
  * because each Lloyd step is monotone over INTEGER codebooks (the argmin
  * assignment cannot increase the objective, and floor(s/n + 0.5) is the
  * squared-distance-optimal integer codeword per coordinate). Also pinned:
  * the trained book keeps exactly the seed's (m, j) keys (empty codewords
  * keep their previous value rather than vanishing), every emitted code
  * references a live codeword, and a fixed point stops early (training a
  * degenerate all-identical residual set longer changes nothing — the
  * property that makes the oracle's fixed unrolled round count sound).
  * Seeds are pinned — deterministic, no flaky CI.
  */
class PqTrainSpec extends SparkSpec {
  import spark.implicits._

  private def distortion(res: org.apache.spark.sql.DataFrame,
      book: Seq[(Int, Long, Seq[Long])]): Long =
    graft.ext.VectorOps.pqCodes(res, book.toDF("m", "j", "cv"))
      .agg(sum("dist")).head.getLong(0)

  private def resOf(rows: Seq[(Long, Seq[Long])]) = rows.toDF("vec_id", "qr")

  test("∀ residual sets: Lloyd training never increases distortion; keys and codes stay live") {
    (1L to 4L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      // seed 3 = CLUSTERED residuals (4 tight clusters — the k-means win
      // case); others uniform in the quantized-residual range
      val clustered = seed == 3L
      val centers = Seq.fill(4)(Array.fill(64)(rnd.nextInt(3001) - 1500L))
      val rows = (0L until 60L).map { i =>
        val qr =
          if (clustered) {
            val c = centers(rnd.nextInt(4))
            c.map(v => v + rnd.nextInt(21) - 10L).toSeq
          } else Seq.fill(64)(rnd.nextInt(3001) - 1500L)
        (i, qr)
      }
      val res = resOf(rows)
      val stride = math.max(1L, 60L / 8L)
      val seedBook = graft.ext.VectorOps.seedPqBook(res, stride)
      val trained = graft.ext.VectorOps.trainedPqBook(res, stride, rounds = 2)
      assert(trained.map(b => (b._1, b._2)) == seedBook.map(b => (b._1, b._2)),
        s"seed=$seed: trained book must keep exactly the seed's (m, j) keys")
      val dSeed = distortion(res, seedBook)
      val dTrained = distortion(res, trained)
      assert(dTrained <= dSeed,
        s"seed=$seed: training INCREASED distortion $dSeed -> $dTrained — " +
          "a Lloyd step is not monotone (update or assignment broken)")
      if (clustered)
        assert(dTrained < dSeed,
          s"seed=$seed: clustered residuals must strictly improve " +
            s"($dSeed -> $dTrained) — the trainer learned nothing")
      // every emitted code references a live (m, j) codeword
      val live = trained.map(b => (b._1, b._2)).toSet
      val codes = graft.ext.VectorOps
        .pqCodes(res, trained.toDF("m", "j", "cv"))
        .select("m", "code").distinct().collect()
        .map(r => (r.getInt(0), r.getLong(1)))
      assert(codes.forall(live),
        s"seed=$seed: codes reference codewords outside the book")
    }
  }

  test("a fixed point stops early: more rounds change nothing on degenerate input") {
    // all residuals identical: round 1 reaches the exact integer fixed
    // point, so rounds=1 and rounds=5 must produce the SAME book — the
    // equivalence that lets the oracle unroll a FIXED round count while
    // the engine stops when converged
    val qr = Seq.tabulate(64)(i => (i * 37 % 400) - 200L)
    val res = resOf((0L until 40L).map(i => (i, qr)))
    val one = graft.ext.VectorOps.trainedPqBook(res, 5L, rounds = 1)
    val five = graft.ext.VectorOps.trainedPqBook(res, 5L, rounds = 5)
    assert(one == five,
      "degenerate input must reach a fixed point in one round; extra " +
        "rounds changed the book — the early stop (or the update) is broken")
  }

  test("packedCellCodes ≡ packCodes∘pqCodes + cell re-join, for random residuals") {
    // the one-pass encode (cell carried through both aggregations) must be
    // row-identical to the original two-pass spelling it replaced — same
    // argmin ties, same m-ordered codes array, same (vec_id, cell) keying
    (1L to 3L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 50L).map { i =>
        (i, i % 7, Seq.fill(64)(rnd.nextInt(3001) - 1500L))
      }
      val res = rows.toDF("vec_id", "cell", "qr")
      val book = graft.ext.VectorOps
        .seedPqBook(res.select("vec_id", "qr"), 6L).toDF("m", "j", "cv")
      val fused = graft.ext.VectorOps.packedCellCodes(res, book)
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      val twoPass = graft.ext.VectorOps
        .packCodes(graft.ext.VectorOps.pqCodes(res, book))
        .join(res.select("vec_id", "cell"), Seq("vec_id"))
        .select(col("vec_id"), col("cell"), col("codes"))
        .orderBy("vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2)))
      assert(fused.sameElements(twoPass),
        s"seed=$seed: fused encode diverged from the two-pass spelling")
    }
  }
}
