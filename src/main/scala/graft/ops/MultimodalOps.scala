package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media travel as opaque `binary` columns plus typed metadata structs —
  * the lakehouse pattern for multimodal training data. The Spark-side
  * machinery (schemas, partition-sized batching, mapPartitions decode
  * loop, deterministic frame sampling) is real and tested; decode is
  * REAL for JDK-codec formats (PNG/JPEG/BMP/GIF via javax.imageio, WAV
  * PCM16 via javax.sound — see MediaCodecs) and falls back to a
  * deterministic fake only for formats with no JDK codec (mp4/webp/...),
  * the clearly marked swap point for ffmpeg-style bindings.
  *
  * Scale: decode runs inside mapPartitions — per-partition sequential,
  * no driver involvement, memory bounded by one batch of blobs; control
  * partition size with `spark.sql.files.maxPartitionBytes` / repartition
  * upstream. Metadata-only transforms (filters on width/duration etc.)
  * stay columnar and never touch the blob bytes (parquet column pruning
  * skips them entirely when unselected).
  */
object MultimodalOps {

  /** Typed metadata carried next to each blob. */
  val MediaMeta: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // png | jpeg | wav | mp4 ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("n_channels", IntegerType)))

  val MediaRecord: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("blob", BinaryType),
    StructField("meta", MediaMeta)))

  /** Decoded image contract shared by the real and stub decoders:
    * row-major (y, x, c) float pixels in [0,1], c ∈ {r,g,b}.
    */
  final case class DecodedImage(
      width: Int, height: Int, nChannels: Int, pixels: Array[Float])

  /** Image decode dispatch. PNG/JPEG/BMP/GIF go through the REAL JDK
    * codec ([[MediaCodecs.decodeImage]], javax.imageio — q93 hash-checks
    * the PNG round trip against a DuckDB recomputation). Formats the JDK
    * can't read (mp4/webp/...) fall back to the deterministic fake below
    * — the remaining swap point for ffmpeg-style bindings on a real
    * cluster.
    */
  object DecodeStub {
    /** Returns null for a JDK-format blob the real codec cannot decode
      * (corrupt/truncated) — fabricating fake features for REAL media
      * would silently poison downstream stats; the fake path is only
      * for formats with no JDK codec at all.
      */
    def decodeImage(blob: Array[Byte]): DecodedImage =
      if (MediaCodecs.isJdkImage(blob)) MediaCodecs.decodeImage(blob)
      else fakeDecode(blob)

    /** ==== STUB (non-JDK formats only) ==== derives every field from
      * the blob bytes so tests are deterministic and engine behavior
      * (nulls, sizes, batching) is exercised honestly.
      */
    private def fakeDecode(blob: Array[Byte]): DecodedImage = {
      val w = 1 + (math.abs(blob.headOption.getOrElse(0: Byte).toInt) % 8)
      val h = 1 + (math.abs(blob.lastOption.getOrElse(0: Byte).toInt) % 8)
      val px = Array.tabulate(w * h * 3)(i =>
        blob(i % blob.length).toFloat / 255f)
      DecodedImage(w, h, 3, px)
    }
  }

  /** Decode + feature-extract blobs partition-wise: emits
    * (media_id, width, height, n_channels, mean_luma_milli).
    * Blob bytes never leave the executor; output is small and columnar.
    *
    * mean_luma_milli is integer-exact by construction —
    * floor(1000 * Σ round(pixel*255) / (255 * n_px)) over the DECODED
    * pixels (pixel ∈ [0,1] per the decoder contract) — so the feature
    * math lives entirely behind the decoder boundary: swap in a real
    * codec and the luma is computed over real pixels, while the stub
    * keeps the whole synthetic-media pipeline oracle-checkable in plain
    * SQL (q41: round(pixel*255) recovers the stub's source byte exactly,
    * so no float drift).
    */
  def decodeImageFeatures(records: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("mean_luma_milli", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    records.select("media_id", "blob").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val blob = r.getAs[Array[Byte]](1)
        val d = if (blob == null) null else DecodeStub.decodeImage(blob)
        if (d == null) Row(id, null, null, null, null)
        else {
          val nPx = d.pixels.length
          val luma =
            if (nPx == 0) 0L
            else {
              var sum = 0L
              var p = 0
              while (p < nPx) { sum += math.round(d.pixels(p) * 255f); p += 1 }
              (1000L * sum) / (255L * nPx)
            }
          Row(id, d.width, d.height, d.nChannels, luma)
        }
      }
    }(enc)
  }

  /** Decode → nearest-neighbor resize → feature-extract, partition-wise:
    * emits (media_id, width, height, n_channels, mean_luma_milli) for
    * the RESIZED (dw × dh) image. Destination pixel (x, y, c) samples
    * source pixel (⌊x·sw/dw⌋, ⌊y·sh/dh⌋, c) — the standard
    * nearest-neighbor kernel, computed over the decoder's pixel output
    * so a real codec slots in unchanged (same boundary as
    * [[decodeImageFeatures]]). Resampling arithmetic is integer-exact
    * and replicated by the q59 oracle.
    *
    * Scale: identical mapPartitions shape to decode — blobs never leave
    * the executor, output is a narrow feature row per record.
    */
  def resizeImageFeatures(records: DataFrame, dw: Int, dh: Int): DataFrame = {
    require(dw > 0 && dh > 0, "target dims must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_channels", IntegerType),
      StructField("mean_luma_milli", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    records.select("media_id", "blob").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val blob = r.getAs[Array[Byte]](1)
        val d = if (blob == null) null else DecodeStub.decodeImage(blob)
        if (d == null) Row(id, null, null, null, null)
        else {
          val nPx = dw * dh * d.nChannels
          var sum = 0L
          var j = 0
          while (j < nPx) {
            val c = j % d.nChannels
            val x = (j / d.nChannels) % dw
            val y = (j / d.nChannels) / dw
            val sx = x * d.width / dw
            val sy = y * d.height / dh
            val src = (sy * d.width + sx) * d.nChannels + c
            sum += math.round(d.pixels(src) * 255f)
            j += 1
          }
          val luma = if (nPx == 0) 0L else (1000L * sum) / (255L * nPx)
          Row(id, dw, dh, d.nChannels, luma)
        }
      }
    }(enc)
  }

  /** Perceptual average-hash (the classic aHash — public algorithm) per
    * image: decode → nearest-neighbor 8×8 downsample (same integer
    * kernel as [[resizeImageFeatures]]) → integer gray per cell (sum of
    * the three rounded channel bytes, 0..765) → threshold each cell at
    * the integer mean (strictly greater ⇒ 1) → 64 bits packed row-major
    * (bit j = y·8+x). Near-identical images (recompressed, lightly
    * edited) land within a few hamming bits; exact-equal hashes give a
    * shuffle-key dedup primitive for the image modality, completing the
    * text (MinHash) / embedding (SemDeDup) dedup family.
    *
    * The 64 bits travel as two BIGINT halves (`ahash_hi` bits 63..32,
    * `ahash_lo` 31..0) — bit 63 in one signed BIGINT would overflow the
    * oracle's integer arithmetic. All math is integer-exact behind the
    * decoder boundary, so the q119 oracle replays it from the synthetic
    * pixel formula while Spark decodes the real PNG bytes.
    * Undecodable/null blobs yield null hashes. Same mapPartitions
    * shape as decode: blobs never leave the executor.
    */
  def imageAHash(records: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", StringType),
      StructField("ahash_hi", LongType),
      StructField("ahash_lo", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    records.select("media_id", "blob").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val blob = r.getAs[Array[Byte]](1)
        val d = if (blob == null) null else DecodeStub.decodeImage(blob)
        if (d == null) Row(id, null, null)
        else {
          val gray = new Array[Long](64)
          var sum = 0L
          var j = 0
          while (j < 64) {
            val x = j % 8
            val y = j / 8
            val sx = x * d.width / 8
            val sy = y * d.height / 8
            val base = (sy * d.width + sx) * d.nChannels
            var g = 0L
            var c = 0
            while (c < d.nChannels) {
              g += math.round(d.pixels(base + c) * 255f)
              c += 1
            }
            gray(j) = g
            sum += g
            j += 1
          }
          val mean = sum / 64L
          var hi = 0L
          var lo = 0L
          j = 0
          while (j < 64) {
            if (gray(j) > mean) {
              if (j < 32) lo |= 1L << j
              else hi |= 1L << (j - 32)
            }
            j += 1
          }
          Row(id, hi, lo)
        }
      }
    }(enc)
  }

  /** Image → patch-embedding prep: decode, nearest-neighbor downsample
    * to a dw×dh grid (the exact integer kernel of [[imageAHash]] /
    * [[resizeImageFeatures]]), emit one row per cell with the integer
    * gray value (sum of rounded channel bytes, 0..765) — the flattened
    * fixed-length vector a vision tower consumes, in the exploded
    * (id, dim, value) layout the embedding ops already speak (q205's
    * centroid math, q215's projection, ANN ingest all take it).
    * Undecodable/null blobs emit nothing (the quarantine stream is the
    * decode gate's job, q41). Same mapPartitions contract: blobs never
    * leave the executor.
    */
  def imagePatchVector(
      records: DataFrame, dw: Int, dh: Int): DataFrame = {
    require(dw > 0 && dh > 0, "target dims must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", StringType),
      StructField("p", IntegerType),
      StructField("gray", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    records.select("media_id", "blob").mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getString(0)
        val blob = r.getAs[Array[Byte]](1)
        val d = if (blob == null) null else DecodeStub.decodeImage(blob)
        if (d == null) Iterator.empty
        else (0 until dw * dh).iterator.map { j =>
          val x = j % dw
          val y = j / dw
          val sx = x * d.width / dw
          val sy = y * d.height / dh
          val base = (sy * d.width + sx) * d.nChannels
          var g = 0L
          var c = 0
          while (c < d.nChannels) {
            g += math.round(d.pixels(base + c) * 255f)
            c += 1
          }
          Row(id, j, g)
        }
      }
    }(enc)
  }

  /** Audio decode dispatch: WAV goes through the REAL JDK codec
    * ([[MediaCodecs.decodeWavPcm16]], javax.sound.sampled — q94
    * hash-checks the PCM16 round trip); other formats (flac/mp3/...)
    * fall back to the deterministic fake — the remaining swap point.
    */
  final case class DecodedAudio(
      sampleRate: Int, nSamples: Int, samples: Array[Float])

  object AudioDecodeStub {
    /** Null (not fake) for a RIFF/WAVE blob outside the mono-PCM16
      * subset — e.g. a real stereo or 24-bit WAV must surface as
      * undecodable, never as fabricated samples (same contract as
      * [[DecodeStub.decodeImage]]).
      */
    def decodeAudio(blob: Array[Byte]): DecodedAudio =
      if (MediaCodecs.isWav(blob)) {
        val d = MediaCodecs.decodeWavPcm16(blob)
        if (d == null) null
        else DecodedAudio(d.sampleRate, d.samples.length,
          d.samples.map(_ / 32768f))
      } else fakeDecode(blob)

    /** ==== STUB (non-JDK formats only) ==== */
    private def fakeDecode(blob: Array[Byte]): DecodedAudio = {
      val sr = 8000 + (math.abs(blob.headOption.getOrElse(0: Byte).toInt) % 3) * 4000
      val n = math.max(1, blob.length * 4)
      val samples = Array.tabulate(n)(i =>
        (blob(i % blob.length).toInt % 64) / 64f)
      DecodedAudio(sr, n, samples)
    }
  }

  /** Exact-integer audio features over REAL WAV PCM16 decode: emits
    * (media_id, sample_rate, n_samples, energy) with
    * energy = Σ sample² over the signed 16-bit samples — integer math
    * end to end, so the value is engine-portable (q94 recomputes it in
    * DuckDB from the generating formula; the WAV container round trip
    * is what's under test). Non-WAV / undecodable blobs yield nulls.
    */
  def decodeAudioEnergy(records: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", StringType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("energy", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    records.select("media_id", "blob").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val blob = r.getAs[Array[Byte]](1)
        val d = if (blob == null || !MediaCodecs.isWav(blob)) null
                else MediaCodecs.decodeWavPcm16(blob)
        if (d == null) Row(id, null, null, null)
        else {
          var energy = 0L
          var i = 0
          while (i < d.samples.length) {
            val s = d.samples(i).toLong
            energy += s * s
            i += 1
          }
          Row(id, d.sampleRate, d.samples.length, energy)
        }
      }
    }(enc)
  }

  /** Decode + feature-extract audio blobs partition-wise: emits
    * (media_id, sample_rate, n_samples, rms_milli) — the audio twin of
    * [[decodeImageFeatures]], same mapPartitions shape.
    */
  def decodeAudioFeatures(records: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", StringType),
      StructField("sample_rate", IntegerType),
      StructField("n_samples", IntegerType),
      StructField("rms_milli", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    records.select("media_id", "blob").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val blob = r.getAs[Array[Byte]](1)
        val d = if (blob == null) null else AudioDecodeStub.decodeAudio(blob)
        if (d == null) Row(id, null, null, null)
        else {
          val rms = math.sqrt(
            d.samples.map(s => s.toDouble * s).sum / d.samples.length)
          Row(id, d.sampleRate, d.nSamples, (rms * 1000).round)
        }
      }
    }(enc)
  }

  /** Audio fingerprint — the audio-modality dedup key (energy-delta
    * sign bits, the Haitsma–Kalker robust-hash shape, public): decode →
    * non-overlapping windows of `windowSamples` PCM16 samples → exact
    * integer energy Σs² per window → bit k set iff window k+1's energy
    * exceeds window k's (k < 63). Re-encodes and lightly processed
    * copies keep most delta signs, identical clips collide exactly —
    * the shuffle-key primitive for audio dedup, completing the
    * text/embedding/image/audio family. Emits (media_id, n_windows,
    * fp_bits); non-WAV/undecodable/null blobs yield null; clips shorter
    * than two windows fingerprint as 0 with their (0|1) window count.
    * Works on the RAW signed 16-bit samples (MediaCodecs.decodeWavPcm16
    * — the [[decodeAudioEnergy]] path, NOT the normalized-float stub
    * contract) so energies are integer-exact and q120's oracle replays
    * them from the WAV sample formula while Spark decodes real bytes.
    */
  def audioFingerprint(
      records: DataFrame, windowSamples: Int): DataFrame = {
    require(windowSamples > 0, "windowSamples must be positive")
    val outSchema = StructType(Seq(
      StructField("media_id", StringType),
      StructField("n_windows", IntegerType),
      StructField("fp_bits", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    records.select("media_id", "blob").mapPartitions { rows =>
      rows.map { r =>
        val id = r.getString(0)
        val blob = r.getAs[Array[Byte]](1)
        val d = if (blob == null || !MediaCodecs.isWav(blob)) null
                else MediaCodecs.decodeWavPcm16(blob)
        if (d == null) Row(id, null, null)
        else {
          val nw = d.samples.length / windowSamples
          val energy = new Array[Long](nw)
          var w = 0
          while (w < nw) {
            var e = 0L
            var t = w * windowSamples
            val end = t + windowSamples
            while (t < end) {
              val s = d.samples(t).toLong
              e += s * s
              t += 1
            }
            energy(w) = e
            w += 1
          }
          var fp = 0L
          var k = 0
          while (k < nw - 1 && k < 63) {
            if (energy(k + 1) > energy(k)) fp |= 1L << k
            k += 1
          }
          Row(id, nw, fp)
        }
      }
    }(enc)
  }

  /** Deterministic frame sampling for video blobs: pick `n` frame offsets
    * evenly across duration_ms (metadata-only — no decode), exploded to
    * one row per sampled frame. Columnar end-to-end.
    */
  def sampleFrameOffsets(records: DataFrame, n: Int): DataFrame =
    records
      .filter(col("meta.media_type") === "video" &&
        col("meta.duration_ms").isNotNull && col("meta.duration_ms") > 0)
      .select(
        col("media_id"),
        explode(transform(sequence(lit(0), lit(n - 1)), i =>
          (col("meta.duration_ms") * i / lit(n.toLong)).cast("long")))
          .as("frame_offset_ms"))

  /** Metadata-only filter predicate pushdown demo: keep images within a
    * resolution band without reading blobs (column pruning keeps the
    * parquet scan blob-free — verify with .explain ReadSchema).
    */
  def filterByResolution(
      records: DataFrame, minW: Int, maxW: Int): DataFrame =
    records.filter(
      col("meta.media_type") === "image" &&
        col("meta.width").between(minW, maxW))

  /** Synthesize a table of REAL PNG blobs (encoded with the JDK codec on
    * executors): image i is w×h with w = 1+(i%8), h = 1+((i·7)%8) and
    * pixel byte p = (i·31 + p·7) % 256 in row-major (y,x,rgb) order. PNG
    * is lossless, so decode recovers the formula exactly — the q93
    * oracle recomputes features from the formula alone.
    */
  def syntheticPngMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val w = 1 + (i % 8).toInt
      val h = 1 + ((i * 7) % 8).toInt
      val blob = MediaCodecs.encodePng(w, h, p => ((i * 31 + p * 7) % 256).toInt)
      (s"png$i", blob, w, h)
    }.toDF("media_id", "blob", "width", "height")
      .select(col("media_id"), col("blob"),
        struct(lit("image").as("media_type"), lit("png").as("format"),
          col("width"), col("height"),
          lit(null).cast("long").as("duration_ms"),
          lit(3).as("n_channels")).as("meta"))
  }

  /** Synthesize a table of REAL WAV PCM16 blobs: clip i has
    * sample_rate = 8000 + (i%3)·4000, n = 64 + (i%64) samples,
    * sample t = ((i·31 + t·7) % 2048) − 1024. Lossless container →
    * decode recovers the formula; q94's oracle recomputes Σ s² from it.
    */
  def syntheticWavMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val sr = 8000 + (i % 3).toInt * 4000
      val len = 64 + (i % 64).toInt
      val samples = Array.tabulate[Short](len)(t =>
        (((i * 31 + t * 7) % 2048) - 1024).toShort)
      val blob = MediaCodecs.encodeWavPcm16(sr, samples)
      (s"wav$i", blob, sr, len.toLong * 1000 / sr)
    }.toDF("media_id", "blob", "sample_rate", "duration_ms")
      .select(col("media_id"), col("blob"),
        struct(lit("audio").as("media_type"), lit("wav").as("format"),
          lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
          col("duration_ms"), lit(1).as("n_channels")).as("meta"))
  }

  /** Synthesize a deterministic media table (for tests/demos): blob bytes
    * derived from the id, metadata consistent with the stub decoder.
    */
  def syntheticMedia(spark: org.apache.spark.sql.SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val blob = Array.tabulate[Byte](16 + (i % 16).toInt)(j =>
        ((i * 31 + j * 7) % 127).toByte)
      val mediaType = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case 2 => "video"
      }
      (s"m$i", blob, mediaType, 1000L + i * 100)
    }.toDF("media_id", "blob", "media_type", "duration_ms")
      .select(
        col("media_id"), col("blob"),
        struct(
          col("media_type"),
          when(col("media_type") === "image", "png").otherwise("mp4")
            .as("format"),
          lit(4).as("width"), lit(4).as("height"),
          col("duration_ms"),
          lit(3).as("n_channels")).as("meta"))
  }
}
