package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Real media codecs over JDK-only libraries — no external deps.
  *
  * The JDK ships lossless codecs: `javax.imageio` reads/writes PNG (and
  * reads JPEG/BMP/GIF/WBMP), `javax.sound.sampled` reads/writes WAV PCM.
  * Losslessness is what keeps the decode path oracle-checkable: a
  * deterministic pixel/sample formula → encode → REAL decode recovers
  * the formula bit-for-bit, so a DuckDB oracle can recompute features
  * straight from the formula while Spark's path exercises the actual
  * codec (see q93/q94 in MoviesQueries).
  *
  * Container formats with no JDK codec (mp4/webp/flac...) still fall
  * back to the deterministic stub in [[MultimodalOps]] — the swap point
  * for ffmpeg-style bindings on a real cluster.
  *
  * Thread-safety: `ImageIO.read/write` and `AudioSystem` are safe for
  * concurrent use from executor task threads (each call uses its own
  * stream); `ImageIO.setUseCache(false)` avoids tmp-file churn in tight
  * mapPartitions loops.
  */
object MediaCodecs {
  ImageIO.setUseCache(false)

  /** PNG magic (first 4 of the 8-byte signature). */
  def isPng(blob: Array[Byte]): Boolean =
    blob.length > 8 && blob(0) == 0x89.toByte && blob(1) == 'P' &&
      blob(2) == 'N' && blob(3) == 'G'

  /** JPEG SOI marker. */
  def isJpeg(blob: Array[Byte]): Boolean =
    blob.length > 3 && blob(0) == 0xFF.toByte && blob(1) == 0xD8.toByte

  /** BMP magic. */
  def isBmp(blob: Array[Byte]): Boolean =
    blob.length > 2 && blob(0) == 'B' && blob(1) == 'M'

  /** GIF magic. */
  def isGif(blob: Array[Byte]): Boolean =
    blob.length > 6 && blob(0) == 'G' && blob(1) == 'I' && blob(2) == 'F'

  def isJdkImage(blob: Array[Byte]): Boolean =
    isPng(blob) || isJpeg(blob) || isBmp(blob) || isGif(blob)

  /** RIFF/WAVE magic. */
  def isWav(blob: Array[Byte]): Boolean =
    blob.length > 12 && blob(0) == 'R' && blob(1) == 'I' && blob(2) == 'F' &&
      blob(3) == 'F' && blob(8) == 'W' && blob(9) == 'A' && blob(10) == 'V' &&
      blob(11) == 'E'

  /** Encode an RGB image as PNG. `pixelByte(p)` supplies the byte value
    * (0..255) at linear index p over row-major (y, x, c∈{r,g,b}) order —
    * the same order [[decodeImage]] emits, so encode∘decode is identity.
    */
  def encodePng(w: Int, h: Int, pixelByte: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0, "image dims must be positive")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        val r = pixelByte(p) & 0xFF
        val g = pixelByte(p + 1) & 0xFF
        val b = pixelByte(p + 2) & 0xFF
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Decode any JDK-supported image to row-major RGB float pixels in
    * [0,1] (v/255f per channel) — the [[MultimodalOps.DecodedImage]]
    * contract. Returns null if ImageIO can't parse the bytes.
    */
  def decodeImage(blob: Array[Byte]): MultimodalOps.DecodedImage = try {
    // ImageIO.read returns null only when NO reader claims the bytes;
    // a claimed-but-corrupt body THROWS — catch both into the null
    // contract so one truncated image can't fail a whole task
    val img = ImageIO.read(new ByteArrayInputStream(blob))
    if (img == null) null
    else {
      val w = img.getWidth
      val h = img.getHeight
      val px = new Array[Float](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val p = (y * w + x) * 3
          px(p) = ((rgb >> 16) & 0xFF) / 255f
          px(p + 1) = ((rgb >> 8) & 0xFF) / 255f
          px(p + 2) = (rgb & 0xFF) / 255f
          x += 1
        }
        y += 1
      }
      MultimodalOps.DecodedImage(w, h, 3, px)
    }
  } catch { case _: Exception => null }

  /** Encode signed 16-bit mono PCM as a WAV container. */
  def encodeWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0, "sampleRate must be positive")
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {           // little-endian per the format
      bytes(2 * i) = (samples(i) & 0xFF).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    ais.close()
    out.toByteArray
  }

  /** Decoded PCM audio in exact integer sample space (16-bit). */
  final case class DecodedPcm(sampleRate: Int, samples: Array[Short])

  /** Decode a WAV blob to signed 16-bit mono PCM. Integer samples keep
    * downstream feature math (energy = Σs², RMS in millis) exact and
    * therefore portable across engines. Returns null if the bytes
    * aren't a PCM16 WAV this decoder understands.
    */
  def decodeWavPcm16(blob: Array[Byte]): DecodedPcm =
    try {
      val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) { ais.close(); null }
      else {
        val raw = ais.readAllBytes()
        ais.close()
        val n = raw.length / 2
        val samples = new Array[Short](n)
        val le = !fmt.isBigEndian
        var i = 0
        while (i < n) {
          val lo = raw(2 * i) & 0xFF
          val hi = raw(2 * i + 1) & 0xFF
          samples(i) =
            (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort
          i += 1
        }
        DecodedPcm(fmt.getSampleRate.toInt, samples)
      }
    } catch { case _: Exception => null }
}
