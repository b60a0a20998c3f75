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
}
