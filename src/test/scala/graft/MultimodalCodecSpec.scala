package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageIoCodec, MediaRow}
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** The REAL image path: [[ImageIoCodec]] must decode actual PNG/BMP
  * bytes through the same Spark plumbing (extractFeatures /
  * resizeImages mapPartitions batches) that the oracle-gated stub path
  * uses — true dimensions, a pixel checksum over the decoded raster,
  * and a real decode→scale→re-encode resize. Fixtures are generated
  * in-test with the same JDK imageio that decodes them, so the spec
  * needs no binary files in the repo. */
class MultimodalCodecSpec extends AnyFunSuite {
  private lazy val spark = Sessions.local(4)

  /** A deterministic w×h gradient, encoded with the given imageio
    * format ("png" / "bmp"). BMP has no alpha channel, so the raster
    * type follows the format. */
  private def encoded(w: Int, h: Int, format: String): Array[Byte] = {
    val kind = if (format == "bmp") BufferedImage.TYPE_3BYTE_BGR
      else BufferedImage.TYPE_INT_ARGB
    val img = new BufferedImage(w, h, kind)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, 0xff000000 | (x * 40 % 256) << 16 | (y * 60 % 256) << 8
        | (x + y) * 10 % 256)
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, format, bos), s"no $format writer in this JDK")
    bos.toByteArray
  }

  private def pixelSum(bytes: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    (for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      yield img.getRGB(x, y) & 0xffffffffL).sum
  }

  private def media(rows: MediaRow*) = {
    import spark.implicits._
    spark.createDataset(rows)
  }

  test("extractFeatures with ImageIoCodec reports true dims + pixel checksum") {
    val png = encoded(8, 6, "png")
    val bmp = encoded(5, 4, "bmp")
    val feats = Multimodal.extractFeatures(
        media(MediaRow(1L, "image", png, "t"), MediaRow(2L, "image", bmp, "t")),
        partitions = 2, codec = ImageIoCodec)
      .collect().map(r => r.getAs[Long]("media_id") ->
        ((r.getAs[Int]("width"), r.getAs[Int]("height"),
          r.getAs[Long]("checksum"), r.getAs[Int]("n_bytes")))).toMap
    assert(feats(1L) == ((8, 6, pixelSum(png), png.length)))
    assert(feats(2L) == ((5, 4, pixelSum(bmp), bmp.length)))
  }

  test("resizeImages with ImageIoCodec re-encodes at the target dims") {
    val png = encoded(16, 12, "png")
    val out = Multimodal.resizeImages(
        media(MediaRow(7L, "image", png, "t")), 4, 3, codec = ImageIoCodec)
      .collect()
    assert(out.length == 1)
    val payload = out.head.getAs[Array[Byte]]("payload")
    val decoded = ImageIO.read(new ByteArrayInputStream(payload))
    assert((decoded.getWidth, decoded.getHeight) == ((4, 3)))
    // deterministic re-encode: a retried task must reproduce the bytes
    val again = Multimodal.resizeImages(
        media(MediaRow(7L, "image", png, "t")), 4, 3, codec = ImageIoCodec)
      .collect().head.getAs[Array[Byte]]("payload")
    assert(java.util.Arrays.equals(payload, again))
    // a solid-color source stays solid through bilinear scaling: the
    // resize really resamples pixels rather than slicing bytes
    val solid = new BufferedImage(9, 9, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 9; x <- 0 until 9) solid.setRGB(x, y, 0xff336699)
    val sbos = new ByteArrayOutputStream()
    ImageIO.write(solid, "png", sbos)
    val small = Multimodal.resizeImages(
        media(MediaRow(8L, "image", sbos.toByteArray, "t")), 3, 3,
        codec = ImageIoCodec)
      .collect().head.getAs[Array[Byte]]("payload")
    val simg = ImageIO.read(new ByteArrayInputStream(small))
    for (y <- 0 until 3; x <- 0 until 3)
      assert(simg.getRGB(x, y) == 0xff336699)
  }

  /** A `seconds`-long sine at `hz` with peak `amp` (0..1), encoded as a
    * 16-bit signed little-endian PCM WAV at `rate` Hz mono. */
  private def sineWav(rate: Int, hz: Double, amp: Double,
      seconds: Double): Array[Byte] = {
    import javax.sound.sampled._
    val n = (rate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val s = (math.sin(2 * math.Pi * hz * i / rate) * amp * 32767).toInt
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(rate.toFloat, 16, 1, true, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("extractAudioFeatures decodes real WAV: format header + RMS level") {
    val wav = sineWav(rate = 8000, hz = 440, amp = 0.6, seconds = 0.5)
    val feats = Multimodal.extractAudioFeatures(
        media(MediaRow(3L, "audio", wav, "t"),
          MediaRow(4L, "video", Array[Byte](9, 9), "t")), // filtered out
        partitions = 2)
      .collect()
    assert(feats.length == 1, "only audio rows decode")
    val r = feats.head
    assert(r.getAs[Long]("media_id") == 3L)
    assert(r.getAs[Int]("sample_rate") == 8000)
    assert(r.getAs[Int]("channels") == 1)
    assert(r.getAs[Int]("bits") == 16)
    assert(r.getAs[Long]("n_frames") == 4000L)
    assert(math.abs(r.getAs[Double]("duration_ms") - 500.0) < 1e-9)
    // RMS of a sine with peak A is A/sqrt(2)
    assert(math.abs(r.getAs[Double]("rms") - 0.6 / math.sqrt(2)) < 0.005,
      r.getAs[Double]("rms").toString)
    // silence is exactly quiet
    val silent = sineWav(8000, 440, amp = 0.0, seconds = 0.1)
    val s = Multimodal.extractAudioFeatures(
      media(MediaRow(5L, "audio", silent, "t")), partitions = 1).collect().head
    assert(s.getAs[Double]("rms") == 0.0)
  }

  test("8-bit PCM WAV decodes through the unsigned branch") {
    import javax.sound.sampled._
    // constant half-scale signal: 8-bit UNSIGNED PCM stores 128+64
    val n = 800
    val pcm = Array.fill[Byte](n)((128 + 64).toByte)
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      8000f, 8, 1, 1, 8000f, false)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, bos)
    val r = Multimodal.extractAudioFeatures(
      media(MediaRow(12L, "audio", bos.toByteArray, "t")), partitions = 1)
      .collect().head
    assert(r.getAs[Int]("bits") == 8)
    assert(r.getAs[Long]("n_frames") == n.toLong)
    // a constant 64/128 signal has RMS exactly 0.5
    assert(math.abs(r.getAs[Double]("rms") - 0.5) < 1e-9,
      r.getAs[Double]("rms").toString)
  }

  test("non-audio payload fails loudly in the audio path") {
    val e = intercept[Exception] {
      Multimodal.extractAudioFeatures(
          media(MediaRow(6L, "audio", Array[Byte](1, 2, 3), "t")),
          partitions = 1)
        .collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: messages(t.getCause)
    assert(messages(e).exists(_.contains("not a decodable audio")), messages(e))
  }

  test("non-image payload fails loudly, not with fake dimensions") {
    val e = intercept[Exception] {
      Multimodal.extractFeatures(
          media(MediaRow(9L, "image", Array[Byte](1, 2, 3, 4), "t")),
          partitions = 1, codec = ImageIoCodec)
        .collect()
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ::: messages(t.getCause)
    assert(messages(e).exists(_.contains("not a decodable")), messages(e))
  }
}
