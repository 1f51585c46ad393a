package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media (image/audio/video) as opaque BINARY
 * columns with typed metadata, processed in partition-local batches. The
 * Spark side — schema, partitioning, batch iteration, feature output — is
 * real and tested; the actual media DECODE is a clearly marked
 * deterministic STUB (no image/audio codecs in this environment). Swapping
 * `decodeStub` for a real decoder (JNI/ONNX/etc.) changes nothing about
 * the distributed shape.
 */
object Multimodal {

  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      n_frames: Int,
      byte_entropy: Double,
      feature: Array[Float])

  val FrameBytes = 64 // stub "frame" granularity
  val FeatureDim = 8

  /**
   * STUB decoder: stands in for image decode / audio resample / video
   * frame-sampling. Deterministic pure function of the payload bytes so
   * tests and oracles are stable. A real implementation would decode
   * `payload` per `media_type`; the signature is the contract.
   */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  private def byteEntropy(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    val counts = new Array[Long](256)
    payload.foreach(b => counts(b & 0xff) += 1)
    val n = payload.length.toDouble
    counts.filter(_ > 0).map { c =>
      val p = c / n
      -p * math.log(p) / math.log(2)
    }.sum
  }

  /**
   * Partition-parallel feature extraction: one pass over each partition's
   * rows, batch-friendly (the iterator shape is where a real decoder would
   * amortize model/codec setup per partition, exactly like mapInPandas
   * batches). No shuffle — purely narrow.
   */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup for a real decoder would go here
      rows.map { r =>
        MediaFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          n_bytes = r.payload.length,
          n_frames = (r.payload.length + FrameBytes - 1) / FrameBytes,
          byte_entropy = byteEntropy(r.payload),
          feature = decodeStub(r.payload))
      }
    }
  }

  /** Wrap a text table as a fake media table (UTF-8 payload) for tests and
    * the driver data — the plumbing doesn't care what the bytes mean. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(
      col("doc_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** Metadata-only projection (no decode) — cheap scan-level stats. */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      length(col("payload")).as("n_bytes"),
      ceil(length(col("payload")).cast("double") / FrameBytes).cast("int").as("n_frames"))
}
