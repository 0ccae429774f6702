package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling: media travels as an
  * opaque `binary` column next to typed metadata, and per-item decode /
  * feature-extraction runs batch-at-a-time inside partitions behind a
  * pluggable [[Codec]]. IMAGE decode/resize is REAL ([[ImageIoCodec]],
  * JDK-built-in `javax.imageio`: PNG/BMP/GIF/JPEG), AUDIO decode is
  * REAL ([[WavCodec]], JDK-built-in `javax.sound.sampled`: WAV/AIFF/AU
  * PCM with a deterministic RMS level), and VIDEO frame extraction is
  * REAL for the codec-free container shapes ([[AviContainer]]: MJPEG
  * and uncompressed-DIB AVI, re-wrapped per frame for the same imageio
  * path via [[sampleFramesDecoded]]) — all zero extra dependencies.
  * Interframe-compressed video (H.264 etc.) still needs the
  * deterministic [[StubCodec]], which also stays the default so the
  * DuckDB oracle (p12) can reproduce features byte-for-byte in SQL.
  *
  * Scale notes: media blobs dominate row size, so the decode stage is
  * MAP-ONLY by default — it runs on the source's own partitions (a
  * splittable scan is already byte-bounded by
  * `spark.sql.files.maxPartitionBytes`, so "skew from file ordering"
  * is capped at one partition's budget), runs mapPartitions (one codec
  * init per partition, the same shape a Pandas-UDF/Arrow batch would
  * have), and projects features only — the binary column is dropped as
  * early as possible so downstream shuffles move kilobytes, not media.
  * Shuffling the blobs BEFORE decoding would write+read the whole
  * corpus once more (at 100 TB, a 100 TB shuffle) to fix a skew the
  * scan already bounds; the `partitions > 0` override exists for the
  * one case that genuinely needs it, a non-splittable source (one huge
  * container file per task) whose layout the scan cannot subdivide.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Decoded per-item features — one schema across codecs, so swapping
    * the codec never changes the pipeline shape downstream. */
  final case class Features(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      checksum: Long, // perceptual-hash stand-in (pixel sum for images)
      width: Int,
      height: Int)

  /** The decode contract: ships to executors inside mapPartitions
    * closures, so implementations must be Serializable and per-row
    * deterministic (retried tasks must reproduce bytes exactly). */
  trait Codec extends Serializable {
    def decode(row: MediaRow): Features

    /** Re-encode `row`'s payload at targetW×targetH. */
    def resize(row: MediaRow, targetW: Int, targetH: Int): Array[Byte]
  }

  /** Deterministic fake features — the non-image stand-in and the
    * oracle-reproducible default.
    * ======================== STUB ========================
    * Audio/video deployment swaps this for an actual codec (PCM
    * resample, frame decode) via the [[Codec]] trait — [[ImageIoCodec]]
    * is the worked example. Signature and batch shape are the contract;
    * the body is a deterministic fake over the bytes so the pipeline is
    * testable without native libs and checkable by the SQL oracle.
    * ====================================================== */
  object StubCodec extends Codec {

    def decode(row: MediaRow): Features = {
      val n = row.payload.length
      // byte-sum checksum — deterministic, oracle-reproducible
      var sum = 0L
      var i = 0
      while (i < n) { sum += (row.payload(i) & 0xff).toLong; i += 1 }
      Features(row.media_id, row.kind, n, sum, 16 + (sum % 64).toInt,
        16 + ((sum / 64) % 64).toInt)
    }

    /** STUB resize: deterministic stride-sample of the source bytes,
      * sized targetW·targetH/8 — a real codec decode→scale→encode goes
      * in its place (see [[ImageIoCodec.resize]]). */
    def resize(row: MediaRow, targetW: Int, targetH: Int): Array[Byte] = {
      // long arithmetic: an Int product overflows at 46341^2 and would
      // silently collapse outBytes to 1 for huge dims
      val outBytes = math.min(
        math.max(1L, targetW.toLong * targetH / 8), Int.MaxValue).toInt
      val n = row.payload.length
      val out = new Array[Byte](math.min(outBytes, math.max(n, 1)))
      var i = 0
      while (i < out.length) {
        out(i) = if (n == 0) 0 else row.payload((i.toLong * n / out.length).toInt)
        i += 1
      }
      out
    }
  }

  /** REAL image codec on the JDK's built-in `javax.imageio` readers
    * (PNG, BMP, GIF, JPEG — no new dependencies). Features carry the
    * decoded raster's true width/height and a pixel checksum (sum of
    * 32-bit ARGB values — deterministic for a given image, unlike
    * encoder bytes, which may differ across JDKs); resize is a real
    * decode → bilinear scale → PNG re-encode.
    *
    * Non-image payloads are a hard error, not a silent fallback: a
    * corrupt blob in a 100 TB ingest should fail the row loudly (route
    * around it with a `kind` filter or a quarantine pass, not by
    * letting fake dimensions contaminate downstream stats). */
  object ImageIoCodec extends Codec {

    private def read(row: MediaRow): java.awt.image.BufferedImage = {
      // imageio's default scratch-file cache would do disk I/O per
      // decode inside executor tasks; in-memory streams don't need it
      javax.imageio.ImageIO.setUseCache(false)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(row.payload))
      if (img == null) throw new IllegalArgumentException(
        s"media_id=${row.media_id}: payload is not a decodable image " +
          "(javax.imageio recognizes PNG/BMP/GIF/JPEG)")
      img
    }

    def decode(row: MediaRow): Features = {
      val img = read(row)
      val (w, h) = (img.getWidth, img.getHeight)
      // bulk row reads, not per-pixel getRGB(x, y): the bulk accessor
      // amortizes the sRGB conversion + bounds machinery per ROW
      // (identical ARGB values), which is an order of magnitude on a
      // multi-megapixel photo in the hot executor decode loop; one
      // reused w-int buffer keeps the transient footprint a row, not
      // the image
      val rowBuf = new Array[Int](w)
      var sum = 0L
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        var x = 0
        while (x < w) { sum += rowBuf(x) & 0xffffffffL; x += 1 }
        y += 1
      }
      Features(row.media_id, row.kind, row.payload.length, sum, w, h)
    }

    /** 64-bit perceptual difference hash (dHash) of the decoded
      * raster: integer luma (299r+587g+114b, never divided — the scale
      * cancels in comparisons) area-averaged onto a 9×8 grid, bit
      * (r·8+c) set iff cell[r][c] > cell[r][c+1]. ALL-INTEGER
      * arithmetic — block bounds by exact long division, sums and the
      * final integer average — so the hash is bit-deterministic across
      * JVMs (a float resample would not be). Robust to re-encoding,
      * small noise and brightness shifts (comparisons see relative
      * luma only); [[Dedup.hammingNearDupPairs]] turns the hashes into
      * near-dup pairs at corpus scale. */
    def dHashOf(row: MediaRow): Long = dHash(read(row))

    private[operators] def dHash(img: java.awt.image.BufferedImage): Long = {
      val w = img.getWidth
      val h = img.getHeight
      require(w >= 9 && h >= 8,
        s"dHash needs at least a 9x8 raster, got ${w}x$h")
      val rowBuf = new Array[Int](w)
      // per-cell luma sums + pixel counts over the 9x8 block grid
      val sums = Array.ofDim[Long](8, 9)
      val cnts = Array.ofDim[Long](8, 9)
      val cxOf = new Array[Int](w) // pixel column -> grid column
      var x = 0
      while (x < w) { cxOf(x) = ((x.toLong * 9) / w).toInt; x += 1 }
      var y = 0
      while (y < h) {
        val cy = ((y.toLong * 8) / h).toInt
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        x = 0
        while (x < w) {
          val rgb = rowBuf(x)
          val lum = 299L * ((rgb >> 16) & 0xff) +
            587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
          val cx = cxOf(x)
          sums(cy)(cx) += lum
          cnts(cy)(cx) += 1
          x += 1
        }
        y += 1
      }
      var hash = 0L
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          // integer block averages; every block is non-empty (w>=9,h>=8)
          if (sums(r)(c) / cnts(r)(c) > sums(r)(c + 1) / cnts(r)(c + 1))
            hash |= 1L << (r * 8 + c)
          c += 1
        }
        r += 1
      }
      hash
    }

    def resize(row: MediaRow, targetW: Int, targetH: Int): Array[Byte] = {
      val src = read(row)
      val dst = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_ARGB)
      val g = dst.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, targetW, targetH, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", bos)
      bos.toByteArray
    }
  }

  /** Decoded per-item AUDIO features — the audio analog of [[Features]]
    * (signal metadata + RMS level instead of raster dims + checksum). */
  final case class AudioFeatures(
      media_id: Long,
      n_bytes: Int,
      sample_rate: Int,
      channels: Int,
      bits: Int,
      n_frames: Long,
      duration_ms: Double,
      rms: Double) // mean-square level in [0,1] — silence=0, full-scale=1

  /** REAL audio codec on the JDK's built-in `javax.sound.sampled`
    * readers (WAV/AIFF/AU containers, PCM payloads — no new
    * dependencies). Features carry the true format header plus an RMS
    * level computed over every decoded sample in stream order
    * (deterministic). Supports the PCM encodings a JVM decodes natively:
    * signed 16-bit (either endianness) and 8-bit signed/unsigned;
    * anything else (float PCM, 24-bit, compressed) fails loudly — a
    * silently-wrong level is worse than an error row at 100 TB.
    * Video remains behind [[StubCodec]]: frame decode needs codecs a
    * bare JVM does not ship. */
  object WavCodec extends Serializable {

    def decode(row: MediaRow): AudioFeatures = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"media_id=${row.media_id}: payload is not a decodable audio " +
                "stream (javax.sound recognizes WAV/AIFF/AU)", e)
        }
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        import javax.sound.sampled.AudioFormat.Encoding._
        require(
          (bits == 16 && enc == PCM_SIGNED) ||
            (bits == 8 && (enc == PCM_SIGNED || enc == PCM_UNSIGNED)),
          s"media_id=${row.media_id}: unsupported PCM shape " +
            s"($enc/$bits-bit) — only 16-bit signed and 8-bit PCM decode")
        val bytes = in.readAllBytes()
        val big = fmt.isBigEndian
        var sumSq = 0.0
        var count = 0L
        var i = 0
        if (bits == 16) {
          while (i + 1 < bytes.length) {
            val lo = bytes(if (big) i + 1 else i) & 0xff
            val hi = bytes(if (big) i else i + 1)
            val s = ((hi << 8) | lo).toShort / 32768.0
            sumSq += s * s; count += 1; i += 2
          }
        } else {
          val off = if (enc == PCM_UNSIGNED) 128 else 0
          while (i < bytes.length) {
            val raw = if (enc == PCM_UNSIGNED) (bytes(i) & 0xff) - off
              else bytes(i).toInt
            val s = raw / 128.0
            sumSq += s * s; count += 1; i += 1
          }
        }
        val frames = if (fmt.getFrameSize > 0) bytes.length / fmt.getFrameSize
          else count
        val rate = fmt.getSampleRate.toDouble
        AudioFeatures(row.media_id, row.payload.length, rate.toInt,
          fmt.getChannels, bits, frames,
          if (rate > 0) frames * 1000.0 / rate else 0.0,
          if (count > 0) math.sqrt(sumSq / count) else 0.0)
      } finally in.close()
    }

    /** 64-bit perceptual audio fingerprint — the sound twin of
      * [[ImageIoCodec.dHashOf]]: the decoded sample stream splits into
      * 65 equal windows, per-window energy is the EXACT integer sum of
      * squared raw sample values (16-bit² ≤ 2³⁰ — a window would need
      * ~2³³ samples, ~50 hours at 48 kHz, to overflow a long), and bit
      * w is set iff energy[w] > energy[w+1]. Comparisons see relative
      * energy only, so the print is invariant to uniform gain within
      * integer precision and to container re-encoding (WAV↔AIFF of the
      * same PCM), and all-integer arithmetic makes it bit-deterministic.
      * Channels are interleaved as-is (a stereo file fingerprints its
      * interleaved stream — deterministic, stated). Feed
      * [[Dedup.hammingNearDupPairs]] for near-dup audio detection. */
    def fingerprint(row: MediaRow): Long = {
      val in =
        try javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(row.payload))
        catch {
          case e: javax.sound.sampled.UnsupportedAudioFileException =>
            throw new IllegalArgumentException(
              s"media_id=${row.media_id}: payload is not a decodable " +
                "audio stream (javax.sound recognizes WAV/AIFF/AU)", e)
        }
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val enc = fmt.getEncoding
        import javax.sound.sampled.AudioFormat.Encoding._
        require(
          (bits == 16 && enc == PCM_SIGNED) ||
            (bits == 8 && (enc == PCM_SIGNED || enc == PCM_UNSIGNED)),
          s"media_id=${row.media_id}: unsupported PCM shape " +
            s"($enc/$bits-bit) — only 16-bit signed and 8-bit PCM decode")
        val bytes = in.readAllBytes()
        val big = fmt.isBigEndian
        val n = if (bits == 16) bytes.length / 2 else bytes.length
        require(n >= 65,
          s"media_id=${row.media_id}: fingerprint needs >= 65 samples, got $n")
        val energy = new Array[Long](65)
        var idx = 0
        while (idx < n) {
          val s =
            if (bits == 16) {
              val i = idx * 2
              val lo = bytes(if (big) i + 1 else i) & 0xff
              val hi = bytes(if (big) i else i + 1)
              ((hi << 8) | lo).toShort.toLong
            } else if (enc == PCM_UNSIGNED) ((bytes(idx) & 0xff) - 128).toLong
            else bytes(idx).toLong
          energy(((idx.toLong * 65) / n).toInt) += s * s
          idx += 1
        }
        var hash = 0L
        var w = 0
        while (w < 64) {
          if (energy(w) > energy(w + 1)) hash |= 1L << w
          w += 1
        }
        hash
      } finally in.close()
    }
  }

  /** Per-clip audio fingerprints, decoded map-only like
    * [[extractAudioFeatures]]: (media_id, afp). The audio member of
    * the perceptual-dedup family — pair with
    * [[Dedup.hammingNearDupPairs]] exactly like [[imageDHashes]]. */
  def audioFingerprints(media: Dataset[MediaRow], partitions: Int = 0)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val spread =
      if (partitions > 0) media.repartition(partitions, col("media_id"))
      else media
    spread.mapPartitions { it =>
      it.map(r => (r.media_id, WavCodec.fingerprint(r)))
    }.toDF("media_id", "afp")
  }

  /** The audio decode stage — same contract as [[extractFeatures]]
    * (map-only decode on the source layout, one decoder per partition,
    * payload dropped in the output; `partitions > 0` opts into the
    * spreading shuffle for non-splittable sources). */
  def extractAudioFeatures(media: Dataset[MediaRow],
      partitions: Int = 0): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val spread =
      if (partitions > 0)
        media.filter(_.kind == "audio").repartition(partitions, col("media_id"))
      else media.filter(_.kind == "audio")
    spread.mapPartitions { it => it.map(WavCodec.decode) }.toDF()
  }

  /** Wrap a text table as fake media rows (payload = utf8 bytes). Lets
    * the full pipeline run against the driver's documents table. */
  def fakeMediaFromDocs(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))
      .as[MediaRow]
  }

  /** The decode/feature-extract stage: batch-decode per source
    * partition (mapPartitions ≈ one Arrow batch per call), returning a
    * narrow features frame with the payload dropped. Map-only by
    * default — see the object scaladoc's scale notes for why shuffling
    * blobs before decoding them is the wrong plan at corpus scale;
    * `partitions > 0` opts a non-splittable skewed source into one
    * id-keyed spreading shuffle. */
  def extractFeatures(media: Dataset[MediaRow], partitions: Int = 0,
      codec: Codec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val spread =
      if (partitions > 0) media.repartition(partitions, col("media_id"))
      else media
    spread.mapPartitions { it => it.map(codec.decode) }.toDF()
  }

  /** Per-image perceptual hashes, decoded map-only like
    * [[extractFeatures]] (same blob-shuffle opt-in, same one-decoder-
    * per-partition shape): (media_id, dhash). Feed the result to
    * [[Dedup.hammingNearDupPairs]] for image near-dup detection — the
    * visual analog of the SimHash text path (p04), with the pixel
    * decode necessarily spec-gated (no SQL engine decodes PNG). */
  def imageDHashes(media: Dataset[MediaRow], partitions: Int = 0)
      : DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val spread =
      if (partitions > 0) media.repartition(partitions, col("media_id"))
      else media
    spread.mapPartitions { it =>
      it.map(r => (r.media_id, ImageIoCodec.dHashOf(r)))
    }.toDF("media_id", "dhash")
  }

  /** The real-video contract: a container format that can enumerate
    * frames and re-wrap each as a SELF-CONTAINED image payload the
    * [[ImageIoCodec]] image path decodes. [[AviContainer]] (MJPEG /
    * uncompressed-DIB AVI) is the zero-dependency implementation; a
    * deployment with native codecs plugs its own in here. */
  trait VideoContainer extends Serializable {

    /** `n` evenly spaced frames, one parse:
      * (frame_idx 0..n-1, source frame index, container byte offset,
      * standalone image payload). */
    def sample(payload: Array[Byte], n: Int)
        : Iterator[(Int, Int, Int, Array[Byte])]
  }

  /** Frame sampling: expand each video row into `n` evenly-spaced frame
    * rows — the one-to-many media expansion (video → frames, audio →
    * windows) done lazily with a generator, so a 2-hour video never
    * materializes as one row downstream. The frame "decode" slices the
    * payload deterministically (STUB — [[sampleFramesDecoded]] is the
    * real container-seek path, same output shape); the output shape
    * (media_id, frame_idx, frame_payload, offset) is the contract. */
  def sampleFrames(media: Dataset[MediaRow], n: Int): DataFrame = {
    // n <= 0 would not error: sequence(0, n-1) counts DOWN (phantom
    // negative frame indices) and length/n seeds NaN offsets — garbage
    // frames, not a crash. Same contract as resizeImages' dims guard.
    require(n >= 1, s"sampleFrames needs n >= 1 frames, got $n")
    media.toDF()
      .filter(col("kind") === "video")
      .select(col("media_id"), col("payload"),
        explode(sequence(lit(0), lit(n - 1))).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        (col("frame_idx") * (length(col("payload")) / n)).cast("int").as("offset"),
        expr(s"substring(payload, cast(frame_idx * (length(payload) / $n) as int) + 1, " +
          s"greatest(cast(length(payload) / $n as int), 1))").as("frame_payload"))
  }

  /** REAL frame sampling: parse each video row's CONTAINER, seek `n`
    * evenly spaced frames, and emit each as a standalone image payload
    * ready for [[ImageIoCodec]] (or [[resizeImages]] after relabeling
    * kind). Same output contract as the [[sampleFrames]] stub —
    * (media_id, frame_idx, offset, frame_payload) — plus `src_frame`,
    * the frame's index in the source stream, which the stub's byte
    * arithmetic cannot know. Runs as a flatMap generator: one container
    * parse per video, frames stream out row-at-a-time, the container
    * payload is dropped. A frameless container contributes zero rows;
    * an undecodable one fails loudly with its media id. */
  def sampleFramesDecoded(media: Dataset[MediaRow], n: Int,
      container: VideoContainer = AviContainer): DataFrame = {
    require(n >= 1, s"sampleFramesDecoded needs n >= 1 frames, got $n")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video")
      .flatMap { m =>
        val it =
          try container.sample(m.payload, n)
          catch {
            case e: IllegalArgumentException => throw
              new IllegalArgumentException(
                s"media_id=${m.media_id}: ${e.getMessage}", e)
          }
        it.map { case (i, src, off, bytes) => (m.media_id, i, src, off, bytes) }
      }
      .toDF("media_id", "frame_idx", "src_frame", "offset", "frame_payload")
  }

  /** Image resize: per-image transform to `targetW`×`targetH`, payload
    * replaced by the re-encoded bytes. Runs in the same
    * mapPartitions-batch shape as [[extractFeatures]] (one codec init
    * per partition); the output keeps metadata + resized payload only.
    * With [[ImageIoCodec]] the transform is a real decode → bilinear
    * scale → PNG re-encode; the [[StubCodec]] default keeps the
    * deterministic stride-sample for oracle-checkable runs.
    *
    * @return (media_id, source, width, height, payload) — width/height
    *         are the TARGET dims.
    */
  def resizeImages(media: Dataset[MediaRow], targetW: Int,
      targetH: Int, codec: Codec = StubCodec): DataFrame = {
    require(targetW > 0 && targetH > 0,
      s"resize dims must be positive, got ${targetW}x$targetH")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image")
      .mapPartitions { it =>
        it.map(m =>
          (m.media_id, m.source, targetW, targetH,
            codec.resize(m, targetW, targetH)))
      }
      .toDF("media_id", "source", "width", "height", "payload")
  }

  /** End-to-end: docs → fake media → features → per-kind rollup. */
  def featureSummary(docs: DataFrame): DataFrame =
    extractFeatures(fakeMediaFromDocs(docs))
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("n_bytes")).as("total_bytes"),
        min(col("width")).as("min_width"), max(col("height")).as("max_height"),
        sum(col("checksum")).as("checksum_sum"))
      .orderBy(col("kind"))
}
