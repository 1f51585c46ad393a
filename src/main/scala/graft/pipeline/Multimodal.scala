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

  // --- real WAV codec (pure JVM, RIFF/PCM16 mono) --------------------------
  //
  // A genuinely decoded media type so the multimodal path verifies non-stub
  // output end to end: synthesize PCM16 WAV payloads, parse the RIFF
  // container back (header walk, chunk scan, little-endian samples), and
  // extract exact-integer audio features the DuckDB oracle can recompute.

  val WavSampleRate = 8000

  case class WavAudio(sampleRate: Int, samples: Array[Short])

  /** Canonical 44-byte-header RIFF/WAVE writer: PCM16, mono. */
  def encodeWav(samples: Array[Short], sampleRate: Int = WavSampleRate): Array[Byte] = {
    val dataBytes = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      .put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Real RIFF parser: validates the container, walks chunks to find
    * `fmt ` and `data` (wherever they sit), checks PCM16 mono, and reads
    * the little-endian samples. Throws on malformed payloads. */
  def decodeWav(payload: Array[Byte]): WavAudio = {
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    require(payload.length >= 44, s"WAV too short: ${payload.length} bytes")
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt() // riff size (trust chunk walk, not this)
    require(tag() == "WAVE", "not a WAVE file")
    var sampleRate = -1
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && (sampleRate < 0 || samples == null)) {
      val id = tag()
      val size = buf.getInt()
      // negative/oversized chunk lengths (hostile or truncated payloads)
      // must fail, not spin: position would stop advancing
      require(size >= 0 && size <= buf.remaining(), s"bad chunk size $size")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too short: $size")
          val fmt = buf.getShort(); val ch = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt(); buf.getShort()
          val bits = buf.getShort()
          require(fmt == 1 && ch == 1 && bits == 16,
            s"unsupported WAV: fmt=$fmt channels=$ch bits=$bits")
          buf.position(buf.position() + (size - 16))
        case "data" =>
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = buf.getShort(); i += 1 }
        case _ =>
          val pad = if ((size & 1) == 1 && buf.remaining() - size >= 1) 1 else 0
          buf.position(buf.position() + size + pad) // chunks are word-aligned
      }
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    WavAudio(sampleRate, samples)
  }

  /** Deterministic text -> PCM16 samples: one sample per Unicode codepoint,
    * exact integer arithmetic mirrored by the oracle SQL
    * (`(ascii(c)*131+17) % 65536 - 32768` over split chars). */
  def textToSamples(text: String): Array[Short] = {
    val cps = text.codePoints().toArray
    val out = new Array[Short](cps.length)
    var i = 0
    while (i < cps.length) {
      out(i) = ((cps(i).toLong * 131 + 17) % 65536 - 32768).toShort
      i += 1
    }
    out
  }

  /** Synthesize a real WAV media table from the documents corpus. */
  def wavFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      MediaRow(id, "audio/wav", encodeWav(textToSamples(text)))
    }
  }

  /** Audio features, all exact integer (or exact-ratio double) so the
    * oracle hash-matches: byte/sample counts, duration, peak, sum of
    * absolute amplitude, energy, mean amplitude. */
  case class WavFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      sample_rate: Int,
      n_samples: Int,
      duration_ms: Double,
      peak_abs: Long,
      sum_abs: Long,
      energy: Long,
      mean_amp: Double)

  /** Partition-parallel REAL decode: parses each WAV container and computes
    * features from the recovered samples. Same narrow mapPartitions shape
    * as [[extractFeatures]], with the decoder no longer a stub. */
  def extractWavFeatures(media: Dataset[MediaRow]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val wav = decodeWav(r.payload)
        val n = wav.samples.length
        var sumAbs = 0L; var sum = 0L; var energy = 0L; var peak = 0L
        var i = 0
        while (i < n) {
          val s = wav.samples(i).toLong
          val a = math.abs(s)
          sumAbs += a; sum += s; energy += s * s
          if (a > peak) peak = a
          i += 1
        }
        WavFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          n_bytes = r.payload.length,
          sample_rate = wav.sampleRate,
          n_samples = n,
          duration_ms = n.toDouble * 1000.0 / wav.sampleRate,
          peak_abs = peak,
          sum_abs = sumAbs,
          energy = energy,
          mean_amp = if (n == 0) 0.0 else sum.toDouble / n)
      }
    }
  }
}
