package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Exprs, Q}
import Exprs._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, per SURVEY.md §7.5.
  *
  * The container has no image/audio codecs, so `stubDecode` is a
  * clearly-marked deterministic fake of the decode step; everything
  * Spark-side — binary column schema, typed Dataset encoders, partition
  * batching (the JVM analogue of an Arrow-batched mapInPandas UDF), feature
  * schema — is real and tested (MultimodalSpec).
  *
  * 100 TB posture: feature extraction is a narrow per-partition map — no
  * shuffle, no driver data; batch size bounds peak memory per task exactly
  * like Arrow batch size does for pandas UDFs.
  */
object Multimodal {

  /** One stored asset: payload bytes + typed metadata. */
  final case class Asset(
      doc_id: Long, source: String, payload: Array[Byte],
      width: Int, height: Int, channels: Int)

  /** Extracted features (decode stubbed, plumbing real). */
  final case class AssetFeatures(
      doc_id: Long, source: String, n_bytes: Int, checksum: String,
      mean_intensity: Double, frames_sampled: Int, thumbnail: Array[Int])

  /** Documents dressed as binary assets: payload = UTF-8 bytes (stands in
    * for image bytes), metadata derived deterministically from n_chars.
    */
  def assets(spark: SparkSession, dir: String): Dataset[Asset] = {
    import spark.implicits._
    t(spark, dir, "documents").select(
      col("doc_id"), col("source"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") * 7 % 480).cast("int").as("height"),
      lit(3).as("channels")).as[Asset]
  }

  /** STUB: a real deployment decodes image/audio bytes here (codec libs are
    * not in this container). The stub derives deterministic fake "pixel"
    * intensities from the payload bytes so downstream stats are testable.
    */
  private def stubDecode(payload: Array[Byte], width: Int, height: Int): Array[Int] =
    payload.map(b => (b & 0xff) % 256)

  /** Deterministic frame sampling: every `stride`-th byte-row of the fake
    * decode — the shape of video frame-sampling without a codec.
    */
  private def frameSample(decoded: Array[Int], stride: Int): Int =
    decoded.indices.count(_ % stride == 0)

  /** Nearest-neighbor "resize" of the fake decode to a fixed-length
    * thumbnail — the shape of image resizing without a codec: index
    * sampling is exactly what nearest-neighbor downscale does per axis.
    */
  private[ext] def resizeStub(decoded: Array[Int], outLen: Int): Array[Int] =
    if (decoded.isEmpty) Array.fill(outLen)(0)
    else Array.tabulate(outLen)(i => decoded(i * decoded.length / outLen))

  /** Batched per-partition feature extraction — the mapInPandas analogue:
    * one task per partition, payloads processed in bounded batches.
    */
  def extractFeatures(ds: Dataset[Asset], batchSize: Int = 64): Dataset[AssetFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { a =>
          val decoded = stubDecode(a.payload, a.width, a.height)
          val mean =
            if (decoded.isEmpty) 0.0
            else decoded.map(_.toLong).sum.toDouble / decoded.length
          val md = java.security.MessageDigest.getInstance("MD5")
          val checksum = md.digest(a.payload).map("%02x".format(_)).mkString
          AssetFeatures(a.doc_id, a.source, a.payload.length, checksum,
            mean, frameSample(decoded, 16), resizeStub(decoded, 16))
        }
      }
    }
  }

  val queries: Seq[Q] = Seq(
    // ── Binary-column metadata pipeline on native (codegen'd) functions:
    //    payload bytes + checksums + typed metadata, aggregated per source ──
    Q("q43_multimodal_meta",
      (s, d) => t(s, d, "documents")
        .select(
          col("doc_id"), col("source"),
          col("text").cast("binary").as("payload"),
          (col("n_chars") % 640).cast("int").as("width"),
          (col("n_chars") * 7 % 480).cast("int").as("height"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_assets"),
          sum(length(col("payload")).cast("long")).as("total_bytes"),
          countDistinct(md5(col("payload"))).as("n_checksums"),
          min("width").as("min_w"),
          max("height").as("max_h"))
        .orderBy("source"),
      Some("""WITH a AS (SELECT doc_id, source, encode(text) AS payload,
          CAST(n_chars % 640 AS INTEGER) AS width,
          CAST(n_chars * 7 % 480 AS INTEGER) AS height,
          md5(text) AS checksum
        FROM documents)
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_assets,
          CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
          CAST(COUNT(DISTINCT checksum) AS BIGINT) AS n_checksums,
          MIN(width) AS min_w, MAX(height) AS max_h
        FROM a GROUP BY source ORDER BY source"""))
  )
}
