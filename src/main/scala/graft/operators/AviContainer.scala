package graft.operators

/** Minimal RIFF/AVI container parser — the REAL video frame path.
  *
  * A bare JVM ships no interframe video codecs, but the two AVI shapes
  * that need none are fully decodable with what it does ship:
  *
  *   - MJPEG (`biCompression = 'MJPG'`): every `00dc` chunk is a
  *     baseline JPEG → `javax.imageio` decodes it. OpenDML permits
  *     MJPEG frames to OMIT their DHT segments (the tables are
  *     "implied" — ITU-T T.81 Annex K standard tables); such frames
  *     get the standard tables spliced in before the SOS marker
  *     ([[framePayload]]), so the common abbreviated-stream case
  *     decodes with zero dependencies. A frame abbreviated some OTHER
  *     way (custom tables carried out-of-band) still fails loudly in
  *     the downstream decode, never silently;
  *   - uncompressed DIB (`biCompression = 0`): every `00db` chunk is a
  *     raw bottom-up padded-BGR raster → prepending a 14-byte
  *     BITMAPFILEHEADER plus the stream's own BITMAPINFOHEADER makes a
  *     valid BMP that the same imageio path decodes.
  *
  * So this object only walks the container (RIFF chunk grammar:
  * fourcc + LE u32 size + even-padded data; `LIST` chunks nest) and
  * re-wraps frames as standalone image payloads; all pixel work stays
  * in [[Multimodal.ImageIoCodec]]. Anything else — a compressed fourcc,
  * a truncated chunk, a non-AVI payload — is a hard error with the
  * media id attached by the caller, matching the codec family's
  * fail-loudly contract (a silently-skipped frame corrupts downstream
  * frame statistics at 100 TB).
  *
  * Scope, stated honestly: frames are taken from the FIRST `vids`
  * stream — its index is read from `strh` order, so an AVI muxed with
  * audio as stream 0 and video as stream 1 (`01db`/`01dc` chunks)
  * still yields its frames; a container with no `vids` stream at all
  * rejects. Format layout from the public RIFF/AVI and
  * BITMAPINFOHEADER specifications; the reference engine has no media
  * surface (this path exists for the LLM-pipeline mandate).
  */
object AviContainer extends Multimodal.VideoContainer {

  /** One video frame: byte extent of the chunk data inside the
    * container (offset is into the ORIGINAL payload — the seek
    * position a streaming reader would use). */
  final case class Frame(offset: Int, length: Int)

  /** Parsed container: raster dims, frame compression fourcc ("MJPG"
    * or "DIB" for BI_RGB), the stream's BITMAPINFOHEADER bytes (reused
    * verbatim when wrapping DIB frames), and the frame directory. */
  final case class Parsed(width: Int, height: Int, fourcc: String,
      strf: Array[Byte], frames: Vector[Frame])

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def i32(b: Array[Byte], off: Int): Int = u32(b, off).toInt

  private def fcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  def parse(b: Array[Byte]): Parsed = {
    require(b.length >= 12 && fcc(b, 0) == "RIFF" && fcc(b, 8) == "AVI ",
      "payload is not a RIFF AVI container")
    var width = 0
    var height = 0
    var comp: String = null
    var strf: Array[Byte] = null
    var lastStrh: String = ""
    var strhCount = 0
    // the FIRST vids stream's chunk-id prefix ("00".."99"): stream N's
    // frame chunks are 'NNdb'/'NNdc', so an AVI whose video stream is
    // not stream 0 (audio first is a common mux order) still yields its
    // frames instead of silently collecting none
    var vidPrefix: String = null
    val frames = Vector.newBuilder[Frame]
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val id = fcc(b, off)
        val sz = u32(b, off + 4).toInt
        val dataOff = off + 8
        require(sz >= 0 && dataOff + sz <= b.length,
          s"truncated AVI chunk '$id' at offset $off")
        id match {
          case "LIST" if sz >= 4 =>
            val listType = fcc(b, dataOff)
            walk(dataOff + 4, dataOff + sz, inMovi || listType == "movi")
          case _ if inMovi && vidPrefix != null && id.startsWith(vidPrefix)
              && (id.endsWith("db") || id.endsWith("dc")) =>
            frames += Frame(dataOff, sz)
          case "strh" if sz >= 4 =>
            lastStrh = fcc(b, dataOff)
            if (lastStrh == "vids" && vidPrefix == null) {
              // chunk ids are exactly 2 decimal digits ('NNdb'/'NNdc');
              // a stream index past 99 would format to 3 chars, match
              // no chunk, and silently collect zero frames — fail loud
              // instead (AVI caps at 100 streams anyway)
              require(strhCount < 100,
                s"vids stream at strh index $strhCount — AVI chunk ids " +
                  "carry 2-digit stream numbers, no frame could match")
              vidPrefix = f"$strhCount%02d"
            }
            strhCount += 1
          case "strf" if lastStrh == "vids" && strf == null =>
            require(sz >= 40,
              s"video strf too small for a BITMAPINFOHEADER ($sz bytes)")
            strf = java.util.Arrays.copyOfRange(b, dataOff, dataOff + sz)
            width = i32(strf, 4)
            // negative biHeight = top-down raster; BMP readers handle
            // the sign, dims report magnitude
            height = math.abs(i32(strf, 8))
            val bc = u32(strf, 16)
            comp = if (bc == 0L) "DIB" else fcc(strf, 16)
          case _ => // audio strf, idx1, JUNK, INFO, … — skipped
        }
        off = dataOff + sz + (sz & 1) // chunks are even-padded
      }
    }
    walk(12, b.length, inMovi = false)
    require(vidPrefix != null && strf != null,
      "AVI has no video ('vids') stream")
    require(comp == "DIB" || comp == "MJPG",
      s"unsupported AVI frame compression '$comp' — only MJPG and " +
        "uncompressed DIB decode without an external codec")
    Parsed(width, height, comp, strf, frames.result())
  }

  /** The ITU-T T.81 Annex K standard Huffman tables as ready-to-splice
    * DHT segments, EXTRACTED from the JVM's own JPEG encoder output
    * rather than transcribed: a default (non-optimizing) ImageIO encode
    * of any RGB image writes exactly the Annex K tables, so harvesting
    * its DHT segments yields the standard 420-ish bytes with no
    * hand-typed constant to mistype — and guaranteed agreement with
    * the decoder on the same JVM. Extracted once per JVM (lazy). */
  private lazy val standardDhtSegments: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8040) // non-degenerate pixel; tables don't depend on it
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val j = bos.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    // harvest via the SAME marker walk scanToSos validates with — a
    // naive 2+len stride would desync on fill bytes or standalone
    // markers that the walk tolerates
    val (sawDht, _) = scanToSos(j, (m, off, len) =>
      if (m == 0xc4) out.write(j, off, 2 + len))
    require(sawDht, "JVM JPEG encoder emitted no DHT segments")
    out.toByteArray
  }

  /** Walk a baseline JPEG's marker segments from SOI to SOS: returns
    * (a DHT segment was seen, byte offset of the SOS marker). Fails
    * loudly on a payload that is not a JPEG or has no scan — the
    * caller's media id is attached upstream, matching the codec
    * family's contract. `onSegment(marker, off, len)` fires for every
    * length-carrying segment, so consumers (the DHT harvest) reuse
    * THIS walk instead of re-deriving the marker grammar. */
  private def scanToSos(j: Array[Byte],
      onSegment: (Int, Int, Int) => Unit = (_, _, _) => ())
      : (Boolean, Int) = {
    require(j.length >= 4 && (j(0) & 0xff) == 0xff && (j(1) & 0xff) == 0xd8,
      "MJPEG frame chunk is not a JPEG (missing SOI marker)")
    var off = 2
    var sawDht = false
    var sos = -1
    while (sos < 0) {
      require(off + 2 <= j.length, "MJPEG frame has no SOS marker")
      require((j(off) & 0xff) == 0xff,
        s"MJPEG frame: JPEG marker expected at byte $off")
      (j(off + 1) & 0xff) match {
        case 0xff => off += 1 // fill byte before the marker
        case 0xda => sos = off
        case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) =>
          off += 2 // standalone markers carry no length
        case m =>
          require(off + 4 <= j.length, "truncated JPEG segment header")
          val len = ((j(off + 2) & 0xff) << 8) | (j(off + 3) & 0xff)
          require(len >= 2 && off + 2 + len <= j.length,
            s"truncated JPEG segment (marker ${m.toHexString} at $off)")
          if (m == 0xc4) sawDht = true
          onSegment(m, off, len)
          off += 2 + len
      }
    }
    (sawDht, sos)
  }

  /** Frame `idx` as a SELF-CONTAINED image payload for
    * [[Multimodal.ImageIoCodec]]: MJPEG chunks pass through (each is a
    * JPEG), with the Annex K standard Huffman tables spliced in before
    * SOS when the frame omits its DHT segments (OpenDML's implied-
    * tables abbreviation); DIB chunks get a BITMAPFILEHEADER + the
    * stream's own BITMAPINFOHEADER prepended, which is exactly a BMP
    * file. */
  def framePayload(b: Array[Byte], p: Parsed, idx: Int): Array[Byte] = {
    val f = p.frames(idx)
    if (p.fourcc == "MJPG") {
      val jpeg = java.util.Arrays.copyOfRange(b, f.offset, f.offset + f.length)
      val (sawDht, sos) = scanToSos(jpeg)
      if (sawDht) jpeg
      else {
        val dht = standardDhtSegments
        val out = new Array[Byte](jpeg.length + dht.length)
        System.arraycopy(jpeg, 0, out, 0, sos)
        System.arraycopy(dht, 0, out, sos, dht.length)
        System.arraycopy(jpeg, sos, out, sos + dht.length, jpeg.length - sos)
        out
      }
    } else {
      val out = java.nio.ByteBuffer
        .allocate(14 + p.strf.length + f.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte)
        .putInt(14 + p.strf.length + f.length) // file size
        .putInt(0) // reserved
        .putInt(14 + p.strf.length) // pixel data offset
        .put(p.strf)
        .put(b, f.offset, f.length)
      out.array()
    }
  }

  /** `n` evenly spaced frames, parsed once:
    * (frame_idx 0..n-1, source frame index, byte offset, image payload).
    * A zero-frame container yields no rows (not an error: an empty
    * movi list is a valid, if useless, AVI). */
  def sample(payload: Array[Byte], n: Int)
      : Iterator[(Int, Int, Int, Array[Byte])] = {
    val p = parse(payload)
    val total = p.frames.length
    if (total == 0) Iterator.empty
    else (0 until n).iterator.map { i =>
      val src = (i.toLong * total / n).toInt
      (i, src, p.frames(src).offset, framePayload(payload, p, src))
    }
  }
}
