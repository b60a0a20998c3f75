package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Multimodal

/** Fuzz the hand-rolled container parsers: binary columns at 100 TB WILL
  * contain corrupt payloads, and the per-asset degradation contract
  * (decode → Try → stub) can only contain EXCEPTIONS — so every parser
  * must fail malformed input with IllegalArgumentException (a named
  * require), never an index error, a checked codec exception, an OOM, or
  * a hang. Seeded byte-flips and every-prefix truncations over valid
  * containers; success is allowed (a mutation may hit ancillary bytes).
  */
class ContainerFuzzSpec extends AnyFunSuite {

  private def valid[T](body: => T): Unit = { body; () }

  /** Run `decode` over mutations; anything but success/IAE fails. */
  private def fuzz(name: String, container: Array[Byte],
      decode: Array[Byte] => Any): Unit = {
    def attempt(bytes: Array[Byte], what: String): Unit =
      try { decode(bytes); () }
      catch {
        case _: IllegalArgumentException => ()
        case e: Throwable =>
          fail(s"$name/$what: ${e.getClass.getName}: ${e.getMessage}")
      }
    val rnd = new scala.util.Random(name.hashCode)
    for (trial <- 0 until 600) {
      val m = container.clone()
      val flips = 1 + trial % 3
      for (_ <- 0 until flips) {
        val pos = rnd.nextInt(m.length)
        m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
      }
      attempt(m, s"flip trial $trial")
    }
    for (cut <- 0 until container.length)
      attempt(container.take(cut), s"truncate at $cut")
  }

  test("PNG pixel decoder survives byte-flips and truncations with only " +
      "named errors") {
    val raw = Array.tabulate(6 * 5 * 3)(i => ((i * 31 + 7) % 256).toByte)
    val png = Multimodal.encodePng(6, 5, raw)
    valid(Multimodal.decodePng(png))
    fuzz("png", png, Multimodal.decodePng)
  }

  test("WAV decoder survives byte-flips and truncations with only " +
      "named errors") {
    val wav = Multimodal.encodeWav(8000, 2,
      Array.tabulate(64)(i => (i * 997).toShort))
    valid(Multimodal.decodeWav(wav))
    fuzz("wav", wav, Multimodal.decodeWav)
  }

  test("AVI frame walker survives byte-flips and truncations with only " +
      "named errors") {
    val frames = (0 until 2).map(f =>
      Multimodal.encodeJpeg(4, 3, Array.fill(12)((40 * f + 9).toByte)))
    val avi = Multimodal.encodeAvi(4, 3, 12, frames)
    valid(Multimodal.decodeAviFrames(avi))
    fuzz("avi", avi, Multimodal.decodeAviFrames)
  }

  test("the ImageIO JPEG route never escalates past Exception under fuzz " +
      "— the per-asset Try contract holds (dim cap blocks allocation " +
      "attacks before ImageIO sees them)") {
    val jpeg = Multimodal.encodeJpeg(9, 7, Array.fill(63)(55.toByte))
    val rnd = new scala.util.Random(97)
    for (trial <- 0 until 400) {
      val m = jpeg.clone()
      for (_ <- 0 to trial % 3) {
        val pos = rnd.nextInt(m.length)
        m(pos) = (m(pos) ^ (1 << rnd.nextInt(8))).toByte
      }
      try { Multimodal.decodeJpeg(m); () }
      catch {
        case _: Exception => () // contained by the decode() Try
        case e: Throwable =>
          fail(s"jpeg flip trial $trial escalated: ${e.getClass.getName}")
      }
    }
    for (cut <- 0 until jpeg.length)
      try { Multimodal.decodeJpeg(jpeg.take(cut)); () }
      catch {
        case _: Exception => ()
        case e: Throwable =>
          fail(s"jpeg truncate $cut escalated: ${e.getClass.getName}")
      }
  }

  test("image-header parser NEVER throws — garbage parses to None") {
    val containers = Seq(
      Multimodal.pngBytes(9, 7, "body".getBytes),
      Multimodal.jpegBytes(9, 7, "body".getBytes))
    for (c <- containers) {
      fuzz("dims", c, b => { Multimodal.parseImageDims(b); () })
      // stricter contract than the decoders: no exception at all
      val rnd = new scala.util.Random(41)
      for (_ <- 0 until 300) {
        val m = c.clone()
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
        Multimodal.parseImageDims(m) // must not throw
      }
    }
  }
}
