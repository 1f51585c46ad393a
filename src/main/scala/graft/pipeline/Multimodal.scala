package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media (image/audio/video) as opaque BINARY
 * columns with typed metadata, processed in partition-local batches. The
 * Spark side — schema, partitioning, batch iteration, feature output — is
 * real and tested. Audio (RIFF/PCM16 WAV), image (24bpp BMP), and video
 * (RIFF AVI with uncompressed 24bpp DIB frames) decode are REAL pure-JVM
 * codecs; `decodeStub` remains only as the generic fallback feature
 * hasher for unknown media types. Swapping a codec for a richer decoder
 * (JNI/ONNX/etc.) changes nothing about the distributed shape.
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

  // --- real BMP codec (pure JVM, BI_RGB 24bpp, bottom-up) ------------------
  //
  // Second genuinely decoded media type (the WAV pattern applied to
  // images): synthesize 24bpp BMP containers, parse them back (file +
  // DIB header walk, stride/padding, bottom-up row order), and extract
  // exact-integer pixel features the DuckDB oracle can recompute.

  /** Fixed raster width for synthesized corpora: 32 px x 3 B = 96 B rows,
    * already 4-byte aligned, so the oracle needs no stride arithmetic. */
  val BmpWidth = 32

  /** Decoded image: row-major TOP-DOWN gray values (0..255). */
  case class BmpImage(width: Int, height: Int, gray: Array[Int])

  /** Canonical 54-byte-header BMP writer: BI_RGB, 24bpp, bottom-up rows,
    * 4-byte row stride, equal RGB channels from the gray raster. */
  def encodeBmp(width: Int, height: Int, gray: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && gray.length == width * height,
      s"raster mismatch: $width x $height vs ${gray.length} pixels")
    val stride = ((width * 3 + 3) / 4) * 4
    val dataBytes = stride * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataBytes).putShort(0).putShort(0).putInt(54)
    buf.putInt(40).putInt(width).putInt(height)
      .putShort(1).putShort(24)
      .putInt(0)                     // BI_RGB
      .putInt(dataBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var row = height - 1             // bottom-up storage order
    while (row >= 0) {
      var x = 0
      while (x < width) {
        val g = (gray(row * width + x) & 0xff).toByte
        buf.put(g).put(g).put(g)     // B, G, R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row -= 1
    }
    buf.array()
  }

  /** Real BMP parser: validates magic + DIB header, honors the pixel-data
    * offset, row stride, and bottom-up vs top-down (negative height)
    * order; reads the blue channel as gray (the encoder writes equal
    * channels). Throws on malformed payloads. */
  def decodeBmp(payload: Array[Byte]): BmpImage = {
    require(payload.length >= 54, s"BMP too short: ${payload.length} bytes")
    require(payload(0) == 'B'.toByte && payload(1) == 'M'.toByte, "not a BMP file")
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val dibSize = buf.getInt(14)
    require(dibSize >= 40, s"unsupported DIB header: $dibSize bytes")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    require(planes == 1 && bpp == 24 && compression == 0,
      s"unsupported BMP: planes=$planes bpp=$bpp compression=$compression")
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, s"bad dimensions: $width x $rawHeight")
    val stride = ((width * 3 + 3) / 4) * 4
    // hostile/truncated sizes must fail the bounds check, not read garbage
    require(dataOffset >= 54 && stride.toLong * height + dataOffset <= payload.length,
      s"pixel data out of bounds: offset=$dataOffset stride=$stride height=$height")
    val gray = new Array[Int](width * height)
    var r = 0
    while (r < height) {
      val y = if (bottomUp) height - 1 - r else r
      var x = 0
      while (x < width) {
        gray(y * width + x) = payload(dataOffset + r * stride + x * 3) & 0xff
        x += 1
      }
      r += 1
    }
    BmpImage(width, height, gray)
  }

  /** Deterministic text -> gray raster at [[BmpWidth]]: one pixel per
    * codepoint (`(ascii(c)*71+13) % 256`, oracle-replayable), zero-padded
    * to fill the last row; empty text yields one all-zero row. */
  def textToRaster(text: String): (Int, Array[Int]) = {
    val cps = text.codePoints().toArray
    val height = math.max(1, (cps.length + BmpWidth - 1) / BmpWidth)
    val gray = new Array[Int](BmpWidth * height)
    var i = 0
    while (i < cps.length) {
      gray(i) = ((cps(i).toLong * 71 + 13) % 256).toInt
      i += 1
    }
    (height, gray)
  }

  /** Synthesize a real BMP media table from the documents corpus. */
  def bmpFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      val (h, gray) = textToRaster(text)
      MediaRow(id, "image/bmp", encodeBmp(BmpWidth, h, gray))
    }
  }

  /** Image features, all exact integers so the oracle hash-matches. */
  case class BmpFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_pixels: Int,
      sum_gray: Long,
      max_gray: Int,
      nonzero_pixels: Int)

  /** Partition-parallel REAL image decode, mirroring
    * [[extractWavFeatures]]: parse each BMP container, compute features
    * from the recovered raster. */
  def extractBmpFeatures(media: Dataset[MediaRow]): Dataset[BmpFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val img = decodeBmp(r.payload)
        var sum = 0L; var max = 0; var nz = 0
        var i = 0
        while (i < img.gray.length) {
          val g = img.gray(i)
          sum += g
          if (g > max) max = g
          if (g != 0) nz += 1
          i += 1
        }
        BmpFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          n_bytes = r.payload.length,
          width = img.width,
          height = img.height,
          n_pixels = img.width * img.height,
          sum_gray = sum,
          max_gray = max,
          nonzero_pixels = nz)
      }
    }
  }

  // --- real AVI codec (pure JVM, RIFF 'AVI ', uncompressed DIB frames) -----
  //
  // Third genuinely decoded media type, closing the last stub: AVI is a
  // RIFF container (the WAV chunk walk) whose uncompressed '00db' frames
  // are DIB rasters (the BMP stride/bottom-up decode) — so a minimal real
  // video codec composes the two existing ones. Features demonstrate
  // frame-SAMPLING (every Nth frame) and a frame-DELTA motion measure,
  // both exact-integer so the DuckDB oracle recomputes them from the text.

  /** Fixed frame raster for synthesized corpora: 8 x 8 px, 24 B rows —
    * already 4-byte aligned, so the oracle needs no stride arithmetic. */
  val AviWidth = 8
  val AviHeight = 8
  val AviFps = 10

  /** Sampling stride for feature extraction (frames 0, 2, 4, ...). */
  val AviSampleStride = 2

  /** Decoded video: per-frame row-major TOP-DOWN gray values (0..255). */
  case class AviVideo(width: Int, height: Int, frames: Array[Array[Int]])

  /**
   * Minimal-but-real AVI writer: RIFF('AVI ') -> LIST hdrl (avih + LIST
   * strl(strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) -> LIST movi with
   * one uncompressed '00db' DIB frame per entry (bottom-up BGR rows, 4-byte
   * stride, equal channels from the gray raster).
   */
  def encodeAvi(
      width: Int, height: Int, frames: Array[Array[Int]], fps: Int = AviFps): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0 && frames.nonEmpty,
      s"bad AVI shape: $width x $height, ${frames.length} frames, $fps fps")
    frames.foreach(f => require(f.length == width * height,
      s"raster mismatch: $width x $height vs ${f.length} pixels"))
    val stride = ((width * 3 + 3) / 4) * 4
    val frameBytes = stride * height
    val hdrlChunk = 8 + 4 + 64 + 124 // LIST hdr + 'hdrl' + avih + LIST strl
    val moviChunk = 8 + 4 + frames.length * (8 + frameBytes)
    val total = 12 + hdrlChunk + moviChunk
    val buf = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(s: String): Unit = { buf.put(s.getBytes("US-ASCII")); () }
    fcc("RIFF"); buf.putInt(total - 8); fcc("AVI ")
    fcc("LIST"); buf.putInt(hdrlChunk - 8); fcc("hdrl")
    fcc("avih"); buf.putInt(56)
    buf.putInt(1000000 / fps).putInt(frameBytes * fps).putInt(0).putInt(0)
      .putInt(frames.length).putInt(0).putInt(1).putInt(frameBytes)
      .putInt(width).putInt(height)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    fcc("LIST"); buf.putInt(116); fcc("strl")
    fcc("strh"); buf.putInt(56)
    fcc("vids"); fcc("DIB ")
    buf.putInt(0).putShort(0).putShort(0).putInt(0) // flags, prio/lang, init
      .putInt(1).putInt(fps)                        // scale, rate
      .putInt(0).putInt(frames.length)              // start, length
      .putInt(frameBytes).putInt(-1).putInt(0)      // sug buffer, quality, sample size
      .putShort(0).putShort(0).putShort(width.toShort).putShort(height.toShort)
    fcc("strf"); buf.putInt(40)
    // BITMAPINFOHEADER — the same DIB layout the BMP codec writes
    buf.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0).putInt(frameBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    fcc("LIST"); buf.putInt(moviChunk - 8); fcc("movi")
    frames.foreach { fr =>
      fcc("00db"); buf.putInt(frameBytes)
      var row = height - 1 // bottom-up storage order
      while (row >= 0) {
        var x = 0
        while (x < width) {
          val g = (fr(row * width + x) & 0xff).toByte
          buf.put(g).put(g).put(g)
          x += 1
        }
        var pad = stride - width * 3
        while (pad > 0) { buf.put(0.toByte); pad -= 1 }
        row -= 1
      }
    }
    buf.array()
  }

  /** Real AVI parser: validates the RIFF/'AVI ' container, walks INTO the
    * hdrl/strl/movi lists, reads avih (dims + declared frame count),
    * validates the strf BITMAPINFOHEADER (24bpp BI_RGB), decodes each
    * '00db'/'00dc' frame with the BMP stride/bottom-up rules, and checks
    * the decoded count against the header's declaration. Throws on
    * malformed payloads (bad chunk sizes, missing headers, truncation). */
  def decodeAvi(payload: Array[Byte]): AviVideo = {
    require(payload.length >= 24, s"AVI too short: ${payload.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt() // riff size (trust the chunk walk, not this)
    require(tag() == "AVI ", "not an AVI file")
    var width = -1
    var height = -1
    var declaredFrames = -1
    var strfSeen = false
    var bottomUp = true
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
    while (buf.remaining() >= 8) {
      val id = tag()
      val size = buf.getInt()
      require(size >= 0 && size <= buf.remaining(), s"bad chunk size $size")
      if (id == "LIST") {
        val listType = tag() // walk INTO known lists, skip unknown ones
        if (listType != "hdrl" && listType != "strl" && listType != "movi")
          buf.position(buf.position() + size - 4 + (size & 1))
      } else id match {
        case "avih" =>
          require(size >= 40, s"avih chunk too short: $size")
          buf.getInt(); buf.getInt(); buf.getInt(); buf.getInt()
          declaredFrames = buf.getInt()
          buf.getInt(); buf.getInt(); buf.getInt()
          width = buf.getInt()
          height = buf.getInt()
          require(width > 0 && height > 0, s"bad dimensions: $width x $height")
          buf.position(buf.position() + (size - 40) + (size & 1))
        case "strf" =>
          require(size >= 40, s"strf chunk too short: $size")
          buf.getInt() // dib header size
          val w = buf.getInt(); val rawH = buf.getInt()
          val planes = buf.getShort(); val bpp = buf.getShort()
          val compression = buf.getInt()
          require(planes == 1 && bpp == 24 && compression == 0,
            s"unsupported AVI frames: planes=$planes bpp=$bpp compression=$compression")
          require(w == width && math.abs(rawH) == height,
            s"strf dims $w x $rawH disagree with avih $width x $height")
          bottomUp = rawH > 0
          strfSeen = true
          buf.position(buf.position() + (size - 20) + (size & 1))
        case "00db" | "00dc" =>
          require(strfSeen, "frame chunk before strf header")
          val stride = ((width * 3 + 3) / 4) * 4
          require(size >= stride * height, s"frame chunk too short: $size")
          val base = buf.position()
          val gray = new Array[Int](width * height)
          var r = 0
          while (r < height) {
            val y = if (bottomUp) height - 1 - r else r
            var x = 0
            while (x < width) {
              gray(y * width + x) = payload(base + r * stride + x * 3) & 0xff
              x += 1
            }
            r += 1
          }
          frames += gray
          buf.position(base + size + (size & 1))
        case _ =>
          buf.position(buf.position() + size + (size & 1)) // word-aligned skip
      }
    }
    require(declaredFrames >= 0 && strfSeen, "missing avih/strf header")
    require(frames.length == declaredFrames,
      s"container declares $declaredFrames frames, found ${frames.length}")
    AviVideo(width, height, frames.toArray)
  }

  /** Deterministic text -> frame sequence at [[AviWidth]] x [[AviHeight]]:
    * one pixel per codepoint (`(ascii(c)*59 + 11) % 256`, oracle-
    * replayable) laid sequentially across frames, zero-padded; empty text
    * yields one all-zero frame. */
  def textToFrames(text: String): Array[Array[Int]] = {
    val cps = text.codePoints().toArray
    val perFrame = AviWidth * AviHeight
    val nFrames = math.max(1, (cps.length + perFrame - 1) / perFrame)
    val frames = Array.fill(nFrames)(new Array[Int](perFrame))
    var i = 0
    while (i < cps.length) {
      frames(i / perFrame)(i % perFrame) = ((cps(i).toLong * 59 + 11) % 256).toInt
      i += 1
    }
    frames
  }

  /** Synthesize a real AVI media table from the documents corpus. */
  def aviFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].map { case (id, text) =>
      MediaRow(id, "video/avi", encodeAvi(AviWidth, AviHeight, textToFrames(text)))
    }
  }

  /** Video features, all exact integers so the oracle hash-matches:
    * container stats, frame-sampled intensity (every [[AviSampleStride]]th
    * frame), and a full-sequence frame-delta motion measure. */
  case class AviFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      n_sampled: Int,
      sum_gray_sampled: Long,
      max_gray_sampled: Int,
      motion_abs: Long)

  /** Partition-parallel REAL video decode: parse each AVI container,
    * frame-sample for intensity features, diff consecutive frames for
    * motion. Same narrow mapPartitions shape as the WAV/BMP extractors. */
  def extractAviFeatures(
      media: Dataset[MediaRow],
      sampleStride: Int = AviSampleStride): Dataset[AviFeatures] = {
    require(sampleStride > 0, s"sampleStride must be positive, got $sampleStride")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val vid = decodeAvi(r.payload)
        var sum = 0L; var max = 0; var sampled = 0
        var f = 0
        while (f < vid.frames.length) { // frame-sample: every Nth frame
          val fr = vid.frames(f)
          var i = 0
          while (i < fr.length) {
            sum += fr(i)
            if (fr(i) > max) max = fr(i)
            i += 1
          }
          sampled += 1
          f += sampleStride
        }
        var motion = 0L // frame-delta over the FULL sequence
        f = 1
        while (f < vid.frames.length) {
          val a = vid.frames(f - 1); val b = vid.frames(f)
          var i = 0
          while (i < a.length) { motion += math.abs(b(i) - a(i)); i += 1 }
          f += 1
        }
        AviFeatures(
          doc_id = r.doc_id,
          media_type = r.media_type,
          n_bytes = r.payload.length,
          width = vid.width,
          height = vid.height,
          n_frames = vid.frames.length,
          n_sampled = sampled,
          sum_gray_sampled = sum,
          max_gray_sampled = max,
          motion_abs = motion)
      }
    }
  }

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
