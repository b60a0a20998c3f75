package graft

import graft.ext.Multimodal
import graft.ext.Multimodal.Asset

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractFeatures: byte counts, md5 checksum, stub decode stats") {
    val payload = "hello".getBytes("UTF-8")
    val ds = Seq(Asset(1L, "s1", payload, 5, 35, 3)).toDS()
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(f.n_bytes == 5)
    assert(f.checksum == "5d41402abc4b2a76b9719d911017c592") // md5("hello")
    // stub decode: unsigned byte values of "hello"
    val expectedMean = payload.map(_ & 0xff).sum.toDouble / 5
    assert(math.abs(f.mean_intensity - expectedMean) < 1e-12)
    assert(f.frames_sampled == 1) // indices 0..4, stride 16 → only index 0
    // nearest-neighbor resize of the 5 decoded values to 16 samples
    assert(f.thumbnail.length == 16)
    assert(f.thumbnail(0) == ('h' & 0xff) && f.thumbnail(15) == ('o' & 0xff))
  }

  test("extractFeatures is a narrow map: row count and partitioning preserved") {
    val ds = spark.range(100)
      .map(i => Asset(i, s"s${i % 3}", Array.fill(8)(i.toByte), 8, 1, 3))
      .repartition(4)
    val out = Multimodal.extractFeatures(ds, batchSize = 16)
    assert(out.count() == 100)
    assert(out.rdd.getNumPartitions == 4)
  }

  test("assets view over documents has binary payload and typed metadata") {
    val ds = Multimodal.assets(spark, "/root/testdata/sf0.001")
    val a = ds.head()
    assert(a.payload.nonEmpty && a.channels == 3 && a.width >= 0 && a.width < 640)
  }

  test("PNG and JPEG containers round-trip their dimensions through the real parser") {
    val body = "pixels".getBytes("UTF-8")
    for ((w, h) <- Seq((0, 0), (1, 1), (639, 479), (65535, 65535))) {
      assert(Multimodal.parseImageDims(Multimodal.pngBytes(w, h, body))
        .contains(("png", w, h)), s"png $w x $h")
      assert(Multimodal.parseImageDims(Multimodal.jpegBytes(w, h, body))
        .contains(("jpeg", w, h)), s"jpeg $w x $h")
    }
    // PNG width/height are 31-bit — above the JPEG 16-bit ceiling
    assert(Multimodal.parseImageDims(Multimodal.pngBytes(1 << 20, 3, body))
      .contains(("png", 1 << 20, 3)))
    // garbage and truncated inputs parse to None, never throw
    assert(Multimodal.parseImageDims("not an image".getBytes).isEmpty)
    assert(Multimodal.parseImageDims(Array[Byte](0xff.toByte, 0xd8.toByte)).isEmpty)
    assert(Multimodal.parseImageDims(Array.emptyByteArray).isEmpty)
  }

  test("PNG pixel codec round-trips bit-exactly across all five filter " +
      "types, odd dims, and multi-chunk IDAT") {
    val rnd = new scala.util.Random(42)
    // heights ≥ 5 exercise every filter type (encoder cycles y % 5);
    // 61x7 RGB = 1281 filtered bytes → deflate output spans IDAT chunks
    for ((w, h) <- Seq((1, 1), (3, 5), (16, 12), (61, 7))) {
      val raw = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val png = Multimodal.encodePng(w, h, raw)
      // the header parser and the full decoder must agree on dimensions
      assert(Multimodal.parseImageDims(png).contains(("png", w, h)))
      val (dw, dh, back) = Multimodal.decodePng(png)
      assert(dw == w && dh == h)
      assert(back.toSeq == raw.toSeq, s"pixel mismatch at ${w}x$h")
    }
  }

  test("extractFeatures routes a genuine PNG payload through the REAL " +
      "pixel codec: mean intensity is the true pixel mean, not the stub's") {
    val raw = Array.tabulate(4 * 3 * 3)(i => ((i * 37 + 5) % 256).toByte)
    val png = Multimodal.encodePng(4, 3, raw)
    val ds = spark.createDataset(Seq(
      Asset(1L, "s", png, 4, 3, 3),
      Asset(2L, "s", "not an image".getBytes, 12, 1, 3)))
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    val trueMean = raw.map(_ & 0xff).map(_.toLong).sum.toDouble / raw.length
    assert(math.abs(out(0).mean_intensity - trueMean) < 1e-12,
      s"PNG payload must decode for real: ${out(0).mean_intensity} vs $trueMean")
    // the non-image payload still takes the marked stub path
    val stubMean = "not an image".getBytes.map(_ & 0xff)
      .map(_.toLong).sum.toDouble / 12
    assert(math.abs(out(1).mean_intensity - stubMean) < 1e-12)
  }

  test("JPEG codec: constant grayscale round-trips bit-exactly at quality " +
      "1.0 for every value 0..255 — the invariant the q158 oracle leans on") {
    for (v <- 0 until 256) {
      val w = v % 16 + 1; val h = v * 7 % 12 + 1
      val jpeg = Multimodal.encodeJpeg(w, h, Array.fill(w * h)(v.toByte))
      // the container is genuine JFIF: the real header parser reads it
      assert(Multimodal.parseImageDims(jpeg).contains(("jpeg", w, h)), s"v=$v")
      val (dw, dh, px) = Multimodal.decodeJpeg(jpeg)
      assert(dw == w && dh == h, s"v=$v dims")
      assert(px.length == w * h && px.forall(_ == v),
        s"v=$v: decoded ${px.distinct.toSeq} != constant $v")
    }
  }

  test("JPEG codec: non-constant color image decodes through the full " +
      "entropy path within lossy tolerance — not the stub's byte echo") {
    val w = 16; val h = 12
    val raw = Array.tabulate(w * h * 3)(i => ((i * 13 + 7) % 256).toByte)
    val jpeg = Multimodal.encodeJpeg(w, h, raw, gray = false)
    val (dw, dh, px) = Multimodal.decodeJpeg(jpeg)
    assert(dw == w && dh == h && px.length == w * h * 3)
    val trueMean = raw.map(_ & 0xff).map(_.toLong).sum.toDouble / raw.length
    val decMean = px.map(_.toLong).sum.toDouble / px.length
    // lossy but must track the real pixels; the stub (payload-byte echo
    // over compressed JFIF bytes) lands nowhere near this
    assert(math.abs(decMean - trueMean) < 8.0, s"$decMean vs $trueMean")
  }

  test("extractFeatures routes a genuine JPEG payload through the REAL " +
      "ImageIO decode, and degrades malformed containers to the stub " +
      "per-asset instead of failing the job") {
    val w = 8; val h = 6; val v = 77
    val jpeg = Multimodal.encodeJpeg(w, h, Array.fill(w * h)(v.toByte))
    // JFIF-signature container whose entropy data ImageIO cannot decode
    // (the handcrafted header-only fixture) — must fall back, not throw
    val fakeJpeg = Multimodal.jpegBytes(4, 3, "entropy?".getBytes)
    // PNG-signature container with corrupt chunk data — must fall back too
    val fakePng = Multimodal.pngBytes(4, 3, "pixels".getBytes)
    val ds = spark.createDataset(Seq(
      Asset(1L, "s", jpeg, w, h, 1),
      Asset(2L, "s", fakeJpeg, 4, 3, 3),
      Asset(3L, "s", fakePng, 4, 3, 3)))
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    assert(math.abs(out(0).mean_intensity - v) < 1e-12,
      s"JPEG payload must decode for real: ${out(0).mean_intensity} vs $v")
    val stubMean = (p: Array[Byte]) =>
      p.map(_ & 0xff).map(_.toLong).sum.toDouble / p.length
    assert(math.abs(out(1).mean_intensity - stubMean(fakeJpeg)) < 1e-12)
    assert(math.abs(out(2).mean_intensity - stubMean(fakePng)) < 1e-12)
  }

  test("WAV codec: PCM16 round-trips bit-exactly (mono and stereo, " +
      "full sample range) and agrees with javax.sound.sampled") {
    val rnd = new scala.util.Random(7)
    for ((channels, n) <- Seq((1, 1), (1, 257), (2, 64))) {
      val samples = Array.tabulate(n * channels)(i =>
        if (i == 0) Short.MinValue else if (i == 1 && n > 1) Short.MaxValue
        else rnd.nextInt(65536).toShort)
      val wav = Multimodal.encodeWav(8000, channels, samples)
      assert(Multimodal.isWav(wav))
      val (rate, ch, back) = Multimodal.decodeWav(wav)
      assert(rate == 8000 && ch == channels)
      assert(back.toSeq == samples.toSeq, s"ch=$channels n=$n")
      // cross-validate the container against the JDK's own WAV reader
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate == 8000f && fmt.getChannels == channels &&
        fmt.getSampleSizeInBits == 16)
      val raw = ais.readAllBytes()
      val jdk = Array.tabulate(raw.length / 2)(j =>
        ((raw(2 * j) & 0xff) | (raw(2 * j + 1) << 8)).toShort)
      assert(jdk.toSeq == samples.toSeq, "JDK reader disagrees")
    }
  }

  test("WAV decoder verifies structure: truncated chunks, non-PCM format, " +
      "and bad block align all throw named errors; odd-size ancillary " +
      "chunks are word-align skipped") {
    val wav = Multimodal.encodeWav(8000, 1, Array[Short](1, 2, 3))
    // truncate mid-data
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeWav(wav.take(wav.length - 2))
    }.getMessage.contains("truncated"))
    // flip the PCM format tag to 3 (IEEE float)
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeWav(nonPcm)
    }.getMessage.contains("PCM"))
    // corrupt block align
    val badAlign = wav.clone(); badAlign(32) = 7
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeWav(badAlign)
    }.getMessage.contains("block align"))
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeWav("RIFFxxxxWAVE".getBytes)
    }.getMessage.contains("missing fmt"))
    // an odd-length ancillary chunk before fmt/data: the walk must skip
    // its pad byte or every later offset is off by one
    val bb = java.nio.ByteBuffer.allocate(wav.length + 8 + 3 + 1)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(wav, 0, 12)
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte]('i', 'n', 'f', 0)) // 3 bytes + pad
    bb.put(wav, 12, wav.length - 12)
    val withList = bb.array()
    // fix the RIFF size field
    val szFix = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(withList.length - 8).array()
    System.arraycopy(szFix, 0, withList, 4, 4)
    val (_, _, back) = Multimodal.decodeWav(withList)
    assert(back.toSeq == Seq[Short](1, 2, 3))
    // a second data chunk must concatenate (streaming writers split data)
    val two = java.nio.ByteBuffer.allocate(wav.length + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    two.put(wav)
    two.put("data".getBytes("US-ASCII")).putInt(4)
      .putShort(7.toShort).putShort(9.toShort)
    val twoArr = two.array()
    val szFix2 = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(twoArr.length - 8).array()
    System.arraycopy(szFix2, 0, twoArr, 4, 4)
    assert(Multimodal.decodeWav(twoArr)._3.toSeq == Seq[Short](1, 2, 3, 7, 9))
  }

  test("extractFeatures routes a genuine WAV payload through the REAL " +
      "PCM decode: mean intensity is the byte-scaled sample mean") {
    val samples = Array[Short](-32768, 0, 32767, 1024)
    val wav = Multimodal.encodeWav(8000, 1, samples)
    val ds = spark.createDataset(Seq(Asset(1L, "s", wav, 4, 1, 1)))
    val f = Multimodal.extractFeatures(ds).collect().head
    val expected = samples.map(s => (s + 32768) >> 8)
      .map(_.toLong).sum.toDouble / samples.length
    assert(math.abs(f.mean_intensity - expected) < 1e-12,
      s"WAV payload must decode for real: ${f.mean_intensity} vs $expected")
  }

  test("MJPEG AVI container: frames round-trip through the RIFF walk and " +
      "per-frame JPEG decode; structural defects throw named errors") {
    val w = 6; val h = 4
    val frames = (0 until 3).map(f =>
      Multimodal.encodeJpeg(w, h, Array.fill(w * h)((40 * f + 7).toByte)))
    val avi = Multimodal.encodeAvi(w, h, 12, frames)
    assert(Multimodal.isAvi(avi))
    val (dw, dh, back) = Multimodal.decodeAviFrames(avi)
    assert(dw == w && dh == h && back.size == 3)
    // each extracted frame is the exact JPEG payload, decodable for real
    back.zipWithIndex.foreach { case (jp, f) =>
      assert(jp.toSeq == frames(f).toSeq, s"frame $f bytes differ")
      val (fw, fh, px) = Multimodal.decodeJpeg(jp)
      assert(fw == w && fh == h && px.forall(_ == 40 * f + 7), s"frame $f")
    }
    // odd-length frames exercise the word-align pad on the chunk walk
    val odd = frames.map(fr => if (fr.length % 2 == 0) fr :+ 0xd9.toByte.asInstanceOf[Byte] else fr)
    assert(odd.exists(_.length % 2 == 1))
    val avi2 = Multimodal.encodeAvi(w, h, 12, odd)
    assert(Multimodal.decodeAviFrames(avi2)._3.map(_.length) == odd.map(_.length))
    // truncation throws a named error
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeAviFrames(avi.take(avi.length - 3))
    }.getMessage.contains("truncated"))
    // a frame-count lie in avih is refused
    val lying = avi.clone()
    // avih data starts after RIFF(12) + LIST hdr(8) + 'hdrl'(4) + 'avih'+size(8)
    val tf = 12 + 8 + 4 + 8 + 16
    lying(tf) = 9
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeAviFrames(lying)
    }.getMessage.contains("declares"))
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeAviFrames("RIFFxxxxWAVE".getBytes)
    }.getMessage.contains("not a RIFF/AVI"))
  }

  test("extractFeatures routes a genuine MJPEG AVI payload through the " +
      "REAL frame + pixel decode: mean intensity is the true frame mean") {
    val w = 4; val h = 3
    val frames = Seq(
      Multimodal.encodeJpeg(w, h, Array.fill(w * h)(10.toByte)),
      Multimodal.encodeJpeg(w, h, Array.fill(w * h)(30.toByte)))
    val avi = Multimodal.encodeAvi(w, h, 12, frames)
    val ds = spark.createDataset(Seq(Asset(1L, "s", avi, w, h, 1)))
    val f = Multimodal.extractFeatures(ds).collect().head
    assert(math.abs(f.mean_intensity - 20.0) < 1e-12,
      s"AVI payload must decode for real: ${f.mean_intensity}")
  }

  test("hostile declared dimensions fail as NAMED errors before any " +
      "allocation, and extractFeatures degrades them to the stub — an OOM " +
      "would be an Error the per-asset Try could not contain") {
    val hostilePng = Multimodal.pngBytes(1 << 15, 1 << 15, "x".getBytes) // 1G px
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodePng(hostilePng)
    }.getMessage.contains("ceiling"))
    val hostileJpeg = Multimodal.jpegBytes(65535, 65535, "x".getBytes) // 4G px
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(hostileJpeg)
    }.getMessage.contains("ceiling"))
    val ds = spark.createDataset(Seq(
      Asset(1L, "s", hostilePng, 1, 1, 1), Asset(2L, "s", hostileJpeg, 1, 1, 1)))
    val out = Multimodal.extractFeatures(ds).collect().sortBy(_.doc_id)
    val stubMean = (p: Array[Byte]) =>
      p.map(_ & 0xff).map(_.toLong).sum.toDouble / p.length
    assert(math.abs(out(0).mean_intensity - stubMean(hostilePng)) < 1e-12)
    assert(math.abs(out(1).mean_intensity - stubMean(hostileJpeg)) < 1e-12)
  }

  test("a legal 0xFF fill byte before SOF defeats the marker scan but not " +
      "the decoder-header ceiling: small fill-byte JPEGs still decode for " +
      "real, a past-ceiling raster is refused as a NAMED error, and an AVI " +
      "whose avih understates its frame dims degrades per-frame") {
    // splice a fill byte (legal JPEG padding) immediately before the first
    // SOF marker — the independent scan then reads FF FF as a marker and
    // jumps by a garbage segment length, so it parses nothing
    def withFillByte(jpeg: Array[Byte]): Array[Byte] = {
      var i = 2; var sof = -1
      while (sof < 0) {
        val m = jpeg(i + 1) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          sof = i
        else i += 2 + (((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff))
      }
      jpeg.take(sof) ++ Array(0xff.toByte) ++ jpeg.drop(sof)
    }
    val small = withFillByte(
      Multimodal.encodeJpeg(4, 3, Array.fill(4 * 3)(77.toByte)))
    assert(Multimodal.parseImageDims(small).isEmpty,
      "the scan must misparse, or this test proves nothing")
    val (sw, sh, px) = Multimodal.decodeJpeg(small)
    assert(sw == 4 && sh == 3 && px.forall(_ == 77),
      "ImageIO tolerates fill bytes — the real decode must too")
    // a REAL raster just past the 2^24-px ceiling whose marker scan fails:
    // before the decoder-header guard this allocated the full raster
    val big = withFillByte(Multimodal.encodeJpeg(4099, 4096,
      Array.fill(4099 * 4096)(9.toByte)))
    assert(Multimodal.parseImageDims(big).isEmpty)
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodeJpeg(big)
    }.getMessage.contains("ceiling"))
    // an AVI whose avih claims 4x3 (passing the container-level check)
    // but smuggles the past-ceiling frame: the per-frame decoder-header
    // guard fires inside the Try and the asset degrades to the stub
    val lyingAvi = Multimodal.encodeAvi(4, 3, 12, Seq(small, big))
    val ds = spark.createDataset(Seq(Asset(1L, "s", lyingAvi, 4, 3, 1)))
    val f = Multimodal.extractFeatures(ds).collect().head
    val stubMean2 =
      lyingAvi.map(_ & 0xff).map(_.toLong).sum.toDouble / lyingAvi.length
    assert(math.abs(f.mean_intensity - stubMean2) < 1e-12,
      "the lying AVI must degrade to the stub, not decode the big frame")
  }

  test("PNG decoder verifies structure: bad CRC, truncated IDAT, and " +
      "IHDR-contradicting payloads all throw") {
    val raw = Array.tabulate(4 * 3 * 3)(i => (i % 256).toByte)
    val png = Multimodal.encodePng(4, 3, raw)
    // flip one byte inside the first IDAT chunk's data → CRC must catch it
    val corrupt = png.clone()
    val idatOff = {
      var i = 8
      while (new String(corrupt, i + 4, 4, "US-ASCII") != "IDAT")
        i += 12 + (((corrupt(i) & 0xff) << 24) | ((corrupt(i + 1) & 0xff) << 16) |
          ((corrupt(i + 2) & 0xff) << 8) | (corrupt(i + 3) & 0xff))
      i
    }
    corrupt(idatOff + 8) = (corrupt(idatOff + 8) ^ 0x5a).toByte
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodePng(corrupt)
    }.getMessage.contains("CRC"))
    // a valid container whose pixel stream is for a SMALLER image than the
    // IHDR claims: reuse the 4x3 stream under a 4x300 header
    val lying = Multimodal.encodePng(4, 3, raw)
    val bigHdr = java.nio.ByteBuffer.allocate(13)
      .putInt(4).putInt(300).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    System.arraycopy(bigHdr, 0, lying, 16, 13)
    val crc = new java.util.zip.CRC32()
    crc.update(lying, 12, 17)
    System.arraycopy(java.nio.ByteBuffer.allocate(4)
      .putInt(crc.getValue.toInt).array(), 0, lying, 29, 4)
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodePng(lying)
    }.getMessage.contains("contradicts"))
    assert(intercept[IllegalArgumentException] {
      Multimodal.decodePng("nope".getBytes)
    }.getMessage.contains("not a PNG"))
  }

  test("boxDownsample: hand-computed 2x2 means with floor rounding") {
    // 4x2 RGB raster; per-channel block sums chosen so every output value
    // exercises a DIFFERENT remainder mod 4 (floor rounding is the part a
    // naive float resize gets wrong)
    val px = Array[Int](
      10, 200, 1, 13, 201, 2, 100, 50, 3, 103, 53, 4,
      20, 210, 5, 17, 255, 6, 110, 60, 7, 113, 63, 8
    ).map(_.toByte)
    val (ow, oh, out) = Multimodal.boxDownsample(px, 4, 2, 2)
    assert(ow == 2 && oh == 1)
    assert(out.map(_ & 0xff).toSeq == Seq(15, 216, 3, 106, 56, 5))
  }

  test("boxDownsample: whole-image factor gives the global floor mean; bad dims refused") {
    val w = 4; val h = 4
    val px = Array.tabulate(w * h * 3)(i => (i * 7 % 251).toByte)
    // factor = whole image: one output pixel per channel = floor mean
    val (fw, fh, one) = Multimodal.boxDownsample(px, w, h, 4)
    assert(fw == 1 && fh == 1 && one.length == 3)
    for (c <- 0 until 3) {
      val mean = (0 until w * h).map(p => px(p * 3 + c) & 0xff).sum / (w * h)
      assert((one(c) & 0xff) == mean, s"channel $c")
    }
    assert(intercept[IllegalArgumentException] {
      Multimodal.boxDownsample(px, w, h, 3) // 4 % 3 != 0
    }.getMessage.contains("not divisible"))
    assert(intercept[IllegalArgumentException] {
      Multimodal.boxDownsample(px.dropRight(1), w, h, 2)
    }.getMessage.contains("raster"))
  }

  test("resize after a REAL PNG round-trip matches the q187 closed form") {
    // gradient channel value x + 8y; 2x2 box output is exactly 2X+16Y+4
    for (nc <- Seq(0L, 3L, 7L, 12L)) {
      val w = (nc % 8 + 1).toInt * 2
      val h = (nc * 7 % 6 + 1).toInt * 2
      val raw = Array.tabulate(w * h * 3) { i =>
        val p = i / 3; (p % w + 8 * (p / w)).toByte
      }
      val (dw, dh, px) = Multimodal.decodePng(Multimodal.encodePng(w, h, raw))
      val (rw, rh, rp) = Multimodal.boxDownsample(px, dw, dh, 2)
      var i = 0
      while (i < rp.length) {
        val p = i / 3; val x = p % rw; val y = p / rw
        assert((rp(i) & 0xff) == 2 * x + 16 * y + 4,
          s"nc=$nc px($x,$y,ch${i % 3}) = ${rp(i) & 0xff}")
        i += 1
      }
    }
  }
}
